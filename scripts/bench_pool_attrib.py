"""Leave-one-bucket-out attribution for the pallas serving-pool kernel.

Builds the full pool plan plus one variant per dropped bucket (the
PoolPlan is just a bucket tuple — the kernel builder consumes whatever
is there), scans each over N_BLOCKS hardware blocks, and reports
per-bucket marginal cost at the benched stream count.  Interleaved
min-of-visits protocol (CLAUDE.md measurement rules).

NOT semantics-preserving for the variants (a dropped bucket's bands go
silent) — a profiling fabrication only.

    BENCH_B=2048 python scripts/bench_pool_attrib.py
"""

import dataclasses
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
GROUP = int(os.environ.get("BENCH_GROUP", 16))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    full = make_pool_plan(cfg, HW, B, group=GROUP)
    assert full is not None

    variants = {"full": full}
    for bi, b in enumerate(full.buckets):
        sub = tuple(x for i, x in enumerate(full.buckets) if i != bi)
        variants[f"-{b.B}"] = dataclasses.replace(full, buckets=sub)
    for bi, b in enumerate(full.buckets):
        variants[f"only{b.B}"] = dataclasses.replace(
            full, buckets=(full.buckets[bi],)
        )

    blocks = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N_BLOCKS, B, 2, HW), jnp.float32
        )
        * 0.3
    )()
    blocks.block_until_ready()

    progs = {}
    for name, plan in variants.items():

        def pool_step(state, x, plan=plan):
            histL = jnp.concatenate(
                [state["histL"][:, HW:], x[:, 0, :]], axis=1
            )
            histR = jnp.concatenate(
                [state["histR"][:, HW:], x[:, 1, :]], axis=1
            )
            t = state["t"] + 1
            olas = tuple(
                tuple(state["ola"][str(b.B)][o] for o in range(3))
                for b in plan.buckets
            )
            (oc, ols, ors), new_olas = pool_step_lcr(histL, histR, t, olas, plan)
            ola_state = {
                str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)
            }
            return (
                {"histL": histL, "histR": histR, "t": t, "ola": ola_state},
                (oc, ols, ors),
            )

        state = jax.device_put(
            {
                "histL": jnp.zeros((B, plan.window), jnp.float32),
                "histR": jnp.zeros((B, plan.window), jnp.float32),
                "t": jnp.zeros((B,), jnp.int32),
                "ola": {
                    str(b.B): tuple(
                        jnp.zeros((B, b.B), jnp.float32) for _ in range(3)
                    )
                    for b in plan.buckets
                },
            }
        )
        fn = jax.jit(
            lambda st, bl, step=pool_step: jax.lax.scan(step, st, bl)
        )
        _, outs = fn(state, blocks)  # compile
        _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
        progs[name] = (fn, state)
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in progs}
    for v in range(VISITS):
        for name, (fn, state) in progs.items():
            t0 = time.perf_counter()
            _, outs = fn(state, blocks)
            _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
            results[name].append((time.perf_counter() - t0) / N_BLOCKS)
        print(f"visit {v} done", flush=True)

    best = {name: min(ts) * 1e3 for name, ts in results.items()}
    fullms = best["full"]
    print(f"\nfull: {fullms:7.3f} ms/block ({fullms * 1e3 / B:5.2f} us/stream)")
    acc = 0.0
    for b in full.buckets:
        marg = fullms - best[f"-{b.B}"]
        only = best[f"only{b.B}"]
        acc += marg
        print(
            f"bucket {b.B:6d} (P={b.P:2d}, K={b.gains.shape[1]:4d}): "
            f"marginal {marg:7.3f} ms  only {only:7.3f} ms"
        )
    print(f"sum of marginals {acc:7.3f} ms; residual (shared) "
          f"{fullms - acc:7.3f} ms")


if __name__ == "__main__":
    main()
