"""Leave-one-in profiling of the omnibus kernel: time the pallas call with
each bucket alone, and all together, at chunk = 2^21 (no scan).

Run on the real chip: python scripts/bench_sub_profile.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)
N = 2**21
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = UpmixConfig.make(list(EDGES), sr=SR)
    all_plans = _plan_buckets(config, N)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, N + 49152)), jnp.float32)
    x = jax.device_put(x)

    subsets = [("all", all_plans)] + [
        (f"only-{p.block_size}", [p]) for p in all_plans
    ]
    for name, plans in subsets:
        plan, leftover = make_omnibus_plan(plans, N)
        if plan is None:
            print(f"{name:12s}  (no plan; leftover {[p.block_size for p in leftover]})")
            continue
        need = plan.chunk + (plan.n_views - 1) * plan.tile
        xin = x[:, :need] if need <= x.shape[1] else jnp.pad(x, ((0, 0), (0, need - x.shape[1])))

        def step(xin, seed, plan=plan):
            main, spill = omnibus_lcr(xin + seed, plan)
            return main, spill

        fn = jax.jit(step)

        def run(iters):
            seed = jnp.zeros((), jnp.float32)
            out = None
            for _ in range(iters):
                out = fn(xin, seed)
                seed = out[0][0, 0] * 1e-6
            return out

        out = run(1)
        _ = float(np.asarray(out[0][0, 0]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(ITERS)
            _ = float(np.asarray(out[0][0, 0]))
            times.append((time.perf_counter() - t0) / ITERS)
        times.sort()
        ms = times[1] * 1e3
        per_tile = ms * 1e3 / plan.n_tiles
        print(f"{name:12s}  {ms:7.2f} ms  ({per_tile:6.2f} us/tile, "
              f"{plan.n_tiles} tiles, views {plan.n_views}, "
              f"leftover {[p.block_size for p in leftover]})")


if __name__ == "__main__":
    main()
