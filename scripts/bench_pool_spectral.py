"""A/B the pool kernel's SPECTRAL-OLA dataflow against the time-OLA
default on the real chip (DESIGN.md §6 called the time kernel
VPU-materialization-bound: rec ~6 MB + folds ~3 MB of the ~16-20 MB
per grid step; "materially faster means a dataflow with fewer
materialized intermediates".  ola="spectral" carries the last Kr-1
frames' masked spectra instead of [S, B] accumulators and emits each
output hop as ONE dot of the stacked spectra window against a
column-rearrangement of the baked inverse weight — same MAC count, no
rec, no fold, no time-domain carries).

Protocol: scan-sustained with UNROLL steps per scan iteration (the
donated per-block serving path has no back-edge; the unrolled chain is
its proxy — scripts/bench_pool_quarters.py), interleaved visits, min
over visits, one tiny scalar fetch per visit.  Both engines run the
QUARTERS history layout.

    python scripts/bench_pool_spectral.py                # B=2048, G=16
    BENCH_B=4096 python scripts/bench_pool_spectral.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 48))
VISITS = int(os.environ.get("BENCH_VISITS", 6))
B = int(os.environ.get("BENCH_B", 2048))
GROUP = int(os.environ.get("BENCH_GROUP", 16))
UNROLL = int(os.environ.get("BENCH_UNROLL", 8))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    deadline_ms = HW / SR * 1e3
    plans = {
        "time": make_pool_plan(cfg, HW, B, group=GROUP),
        "spectral": make_pool_plan(cfg, HW, B, group=GROUP, ola="spectral"),
    }
    assert all(p is not None for p in plans.values())
    nq = plans["time"].window // HW

    def step_of(plan):
        spectral = plan.ola == "spectral"

        def olas_of(state):
            if spectral:
                return tuple(state["ola"][str(b.B)] for b in plan.buckets)
            return tuple(
                tuple(state["ola"][str(b.B)][o] for o in range(3))
                for b in plan.buckets
            )

        def step(state, x):  # x [2, S, hw]
            histL = (*state["histL"], x[0])
            histR = (*state["histR"], x[1])
            t = state["t"] + 1
            (oc, ols, ors), new_olas = pool_step_lcr(
                histL, histR, t, olas_of(state), plan
            )
            return (
                {"histL": histL[1:], "histR": histR[1:], "t": t,
                 "ola": {str(b.B): new_olas[bi]
                         for bi, b in enumerate(plan.buckets)}},
                oc,
            )

        def multi(state, xs):  # xs [U, 2, S, hw]
            oc = None
            for u in range(UNROLL):
                state, oc = step(state, xs[u])
            return state, oc

        @jax.jit
        def run(state, blocks):
            g = blocks.reshape(N_BLOCKS // UNROLL, UNROLL, *blocks.shape[1:])
            return jax.lax.scan(multi, state, g)

        def fresh():
            if spectral:
                ola = {
                    str(b.B): jnp.zeros((B, b.spec_width), jnp.float32)
                    for b in plan.buckets
                }
            else:
                ola = {
                    str(b.B): tuple(
                        jnp.zeros((B, b.B), jnp.float32) for _ in range(3)
                    )
                    for b in plan.buckets
                }
            return {
                "histL": tuple(
                    jnp.zeros((B, HW), jnp.float32) for _ in range(nq - 1)
                ),
                "histR": tuple(
                    jnp.zeros((B, HW), jnp.float32) for _ in range(nq - 1)
                ),
                "t": jnp.zeros((B,), jnp.int32),
                "ola": ola,
            }

        return run, fresh

    assert N_BLOCKS % UNROLL == 0
    engines = {name: step_of(plan) for name, plan in plans.items()}

    gen = jax.jit(
        lambda k: jax.random.normal(k, (N_BLOCKS, 2, B, HW), jnp.float32) * 0.3
    )
    blocks = gen(jax.random.PRNGKey(0))
    blocks.block_until_ready()

    # Warm (compile) + on-chip cross-check of the last block's C rows.
    ref = None
    for name, (run, fresh) in engines.items():
        _, oc = run(fresh(), blocks)
        got = np.asarray(oc[-1, :4])
        if ref is None:
            ref = got
        else:
            err = float(np.abs(got - ref).max())
            mag = float(np.abs(ref).max())
            print(f"cross-check {name:8s}: max|diff| {err:.3e} (ref {mag:.3e})",
                  flush=True)
            assert err <= 1e-4 * max(mag, 1e-9), f"{name} disagrees"

    results = {name: [] for name in engines}
    for v in range(VISITS):
        for name, (run, fresh) in engines.items():
            st = fresh()
            t0 = time.perf_counter()
            _, oc = run(st, blocks)
            _ = float(np.asarray(oc[-1, 0, 0]))
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:8s}: {dt * 1e3:7.3f} ms/block", flush=True)

    for name, ts in results.items():
        best = min(ts) * 1e3
        streams = B * deadline_ms / best
        print(
            f"{name:8s}: {best:7.3f} ms/block ({best * 1e3 / B:6.2f} "
            f"us/block/stream) -> {streams:6.0f} realtime streams/chip"
        )


if __name__ == "__main__":
    main()
