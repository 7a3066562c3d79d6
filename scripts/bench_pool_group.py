"""Interleaved G-sweep of the quarters-layout pool kernel at the
serving capacity peak (B=4096): G is streams-per-grid-step — the floor
probe showed per-step machinery is G-invariant, but Mosaic scheduling
granularity is not (G=32 measured ~9% worse than 16 pre-quarters, G=64
failed to compile).  Re-tune at the new default layout.

    python scripts/bench_pool_group.py            # B=4096, U=8
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 48))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
B = int(os.environ.get("BENCH_B", 4096))
UNROLL = int(os.environ.get("BENCH_UNROLL", 8))
GROUPS = [int(g) for g in os.environ.get("BENCH_GROUPS", "8,16,32").split(",")]
OLA = os.environ.get("BENCH_OLA", "time")  # or "spectral"


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    deadline_ms = HW / SR * 1e3

    def build(group):
        plan = make_pool_plan(cfg, HW, B, group=group, ola=OLA)
        if plan is None:
            return None
        nq = plan.window // HW
        spectral = plan.ola == "spectral"

        def step(state, x):
            histL = (*state["histL"], x[0])
            histR = (*state["histR"], x[1])
            t = state["t"] + 1
            if spectral:
                olas = tuple(state["ola"][str(b.B)] for b in plan.buckets)
            else:
                olas = tuple(
                    tuple(state["ola"][str(b.B)][o] for o in range(3))
                    for b in plan.buckets
                )
            (oc, ols, ors), new_olas = pool_step_lcr(histL, histR, t, olas, plan)
            return (
                {"histL": histL[1:], "histR": histR[1:], "t": t,
                 "ola": {str(b.B): new_olas[bi]
                         for bi, b in enumerate(plan.buckets)}},
                oc,
            )

        def multi(state, xs):
            out = None
            for u in range(UNROLL):
                state, out = step(state, xs[u])
            return state, out

        @jax.jit
        def run(state, blocks):
            g = blocks.reshape(N_BLOCKS // UNROLL, UNROLL, *blocks.shape[1:])
            return jax.lax.scan(multi, state, g)

        def fresh():
            return {
                "histL": tuple(jnp.zeros((B, HW), jnp.float32)
                               for _ in range(nq - 1)),
                "histR": tuple(jnp.zeros((B, HW), jnp.float32)
                               for _ in range(nq - 1)),
                "t": jnp.zeros((B,), jnp.int32),
                "ola": {str(b.B): (
                            jnp.zeros((B, b.spec_width), jnp.float32)
                            if spectral
                            else tuple(jnp.zeros((B, b.B), jnp.float32)
                                       for _ in range(3)))
                        for b in plan.buckets},
            }

        return run, fresh

    engines = {}
    for g in GROUPS:
        built = build(g)
        if built is None:
            print(f"G={g}: plan ineligible, skipped")
            continue
        engines[f"G{g}"] = built

    gen = jax.jit(
        lambda k: jax.random.normal(k, (N_BLOCKS, 2, B, HW), jnp.float32) * 0.3
    )
    blocks = gen(jax.random.PRNGKey(0))
    blocks.block_until_ready()

    assert N_BLOCKS % UNROLL == 0
    ref = None
    alive = {}
    for name, (run, fresh) in engines.items():
        try:
            _, oc = run(fresh(), blocks)
            got = np.asarray(oc[-1, :4])
        except Exception as e:  # e.g. Mosaic reject at big G
            print(f"{name}: FAILED to compile/run: {type(e).__name__}",
                  flush=True)
            continue
        alive[name] = (run, fresh)
        if ref is None:
            ref = got
        else:
            err = float(np.abs(got - ref).max())
            print(f"cross-check {name}: max|diff| {err:.3e}", flush=True)
            assert err <= 1e-5 * max(float(np.abs(ref).max()), 1e-9)

    results = {name: [] for name in alive}
    for v in range(VISITS):
        for name, (run, fresh) in alive.items():
            st = fresh()  # state allocation outside the timed region
            t0 = time.perf_counter()
            _, oc = run(st, blocks)
            _ = float(np.asarray(oc[-1, 0, 0]))
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:4s}: {dt * 1e3:7.3f} ms/block", flush=True)

    for name, ts in results.items():
        best = min(ts) * 1e3
        print(f"{name:4s}: {best:7.3f} ms/block ({best * 1e3 / B:5.2f} "
              f"us/stream) -> {B * deadline_ms / best:6.0f} streams/chip")


if __name__ == "__main__":
    main()
