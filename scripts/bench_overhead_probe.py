"""Probe the omnibus kernel's fixed per-grid-step cost: time kernels with
the same grid/BlockSpec structure but trivial bodies, varying the number
of weight operands and views.

Run: python scripts/bench_overhead_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 2**21
TILE = 16384
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n_tiles = N // TILE
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((1, 2, N + 4 * TILE)), jnp.float32))

    def build(n_views, n_weights, halo):
        weights = [
            jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
            for _ in range(n_weights)
        ]

        def kernel(*refs):
            xv = refs[:n_views]
            w = refs[n_views : n_views + n_weights]
            out_ref, spill_ref, acc = refs[-3], refs[-2], refs[-1]
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            t = xv[0][0, :, :]
            s = sum(wi[0, 0] for wi in w) if n_weights else 0.0
            out_ref[0] = jnp.tile((t[:1] + s), (3, 1))
            acc[...] = acc[...] * 0.5

            @pl.when(i == n_tiles - 1)
            def _():
                spill_ref[0] = acc[...]

        in_specs = [
            pl.BlockSpec((1, 2, TILE), lambda s, i, v=v: (s, 0, i + v),
                         memory_space=pltpu.VMEM)
            for v in range(n_views)
        ] + [
            pl.BlockSpec((128, 128), lambda s, i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(n_weights)
        ]
        call = pl.pallas_call(
            kernel,
            grid=(1, n_tiles),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 3, TILE), lambda s, i: (s, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, halo), lambda s, i: (s, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, 3, N), jnp.float32),
                jax.ShapeDtypeStruct((1, 3, halo), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((3, halo), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

        def step(x, seed):
            return call(*([x + seed] * n_views), *weights)

        return jax.jit(step)

    for n_views, n_weights, halo in [
        (1, 0, 128), (2, 0, 128), (4, 0, 128),
        (4, 16, 128), (4, 56, 128),
        (4, 56, 49152),
    ]:
        fn = build(n_views, n_weights, halo)

        def run(iters):
            seed = jnp.zeros((), jnp.float32)
            out = None
            for _ in range(iters):
                out = fn(x, seed)
                seed = out[0][0, 0, 0] * 1e-6
            return out

        out = run(1)
        _ = float(np.asarray(out[0][0, 0, 0]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(ITERS)
            _ = float(np.asarray(out[0][0, 0, 0]))
            times.append((time.perf_counter() - t0) / ITERS)
        times.sort()
        us_tile = times[1] * 1e6 / n_tiles
        print(f"views={n_views} weights={n_weights} halo={halo}: "
              f"{times[1]*1e3:6.2f} ms = {us_tile:6.2f} us/tile")


if __name__ == "__main__":
    main()
