"""Per-grid-step floor probe for the serving-pool geometry.

The op/operand attribution (bench_pool_ops.py) showed a husk kernel
(no weights, no OLA carries, all compute fabricated) still costs
~52 us per grid step — same per-step cost as the full kernel.  This
probe measures MINIMAL kernels on the same grid to locate the floor:

  copy   — read the two [G, window] history blocks, write 3 [G, hw]
           outputs from wide slices (pure DMA + trivial VPU)
  frame  — copy + the grouped-framing Z concats for every bucket
           (the VPU relayout work the husk still carried)
  scan0  — the copy kernel WITHOUT the XLA history-shift concat in the
           scan step (isolates the scan-side shift cost)

each at G in BENCH_GROUPS (default 16,32,128), scanned over N_BLOCKS
hardware blocks, interleaved min-of-visits.

    BENCH_B=2048 python scripts/bench_pool_floor.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 32))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
B = int(os.environ.get("BENCH_B", 2048))
GROUPS = [int(g) for g in os.environ.get("BENCH_GROUPS", "16,32,128").split(",")]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    plan = make_pool_plan(cfg, HW, B, group=16)
    assert plan is not None
    W = plan.window

    def make_call(G, framing):
        def kernel(histL, histR, outC, outLs, outRs):
            if framing:
                acc = None
                for b in plan.buckets:
                    Bk, H, P = b.B, b.H, b.P
                    Kr = Bk // H
                    NG, M = (Kr, P // Kr) if P % Kr == 0 else (P, 1)
                    zs = []
                    for ch_ref in (histL, histR):
                        for j in range(NG):
                            flat = ch_ref[:, j * H : j * H + M * Bk]
                            zs.append(flat.reshape(G * M, Bk))
                    Z = jnp.concatenate(zs, axis=0)  # [2PG, Bk]
                    w = min(HW, Bk)
                    part = Z[:G, :w]
                    if w < HW:
                        part = jnp.pad(part, ((0, 0), (0, HW - w)))
                    acc = part if acc is None else acc + part
                outC[...] = acc
                outLs[...] = acc + histL[:, :HW]
                outRs[...] = acc + histR[:, :HW]
            else:
                outC[...] = histL[:, :HW] + histR[:, :HW]
                outLs[...] = histL[:, W - HW :]
                outRs[...] = histR[:, W - HW :]

        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, W), lambda s: (s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, W), lambda s: (s, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((G, HW), lambda s: (s, 0), memory_space=pltpu.VMEM)
                for _ in range(3)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, HW), jnp.float32) for _ in range(3)
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

    blocks = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N_BLOCKS, B, 2, HW), jnp.float32
        )
        * 0.3
    )()
    blocks.block_until_ready()
    state0 = jax.device_put(
        {
            "histL": jnp.zeros((B, W), jnp.float32),
            "histR": jnp.zeros((B, W), jnp.float32),
        }
    )

    progs = {}
    for G in GROUPS:
        for framing in (False, True):
            if framing and G != 16:
                continue  # framing layout is only known-good at G=16
            name = f"{'frame' if framing else 'copy'}-G{G}"
            call = make_call(G, framing)

            def step(state, x, call=call):
                histL = jnp.concatenate(
                    [state["histL"][:, HW:], x[:, 0, :]], axis=1
                )
                histR = jnp.concatenate(
                    [state["histR"][:, HW:], x[:, 1, :]], axis=1
                )
                oc, ols, ors = call(histL, histR)
                return {"histL": histL, "histR": histR}, (oc, ols, ors)

            try:
                fn = jax.jit(
                    lambda st, bl, step=step: jax.lax.scan(step, st, bl)
                )
                _, outs = fn(state0, blocks)
                _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
            except Exception as exc:
                print(f"{name:12s} COMPILE FAILED: {type(exc).__name__}: "
                      f"{str(exc)[:140]}", flush=True)
                continue
            progs[name] = (fn, state0)
            print(f"compiled {name}", flush=True)

    # scan0: no history shift — kernel reads the same static history
    # every step (isolates the XLA concat cost in the others).
    call16 = make_call(16, False)

    def step0(state, x):
        oc, ols, ors = call16(state["histL"], state["histR"])
        return state, (oc + x[:, 0, :1024].sum(), ols, ors)

    fn0 = jax.jit(lambda st, bl: jax.lax.scan(step0, st, bl))
    _, outs = fn0(state0, blocks)
    _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
    progs["scan0-G16"] = (fn0, state0)
    print("compiled scan0-G16", flush=True)

    results = {name: [] for name in progs}
    for v in range(VISITS):
        for name, (fn, st) in progs.items():
            t0 = time.perf_counter()
            _, outs = fn(st, blocks)
            _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
            results[name].append((time.perf_counter() - t0) / N_BLOCKS)
        print(f"visit {v} done", flush=True)

    for name, ts in results.items():
        ms = min(ts) * 1e3
        g = int(name.split("-G")[1])
        steps = B // g
        print(
            f"{name:12s} {ms:7.3f} ms/block  {ms * 1e3 / steps:7.2f} us/step "
            f"({steps} steps)"
        )


if __name__ == "__main__":
    main()
