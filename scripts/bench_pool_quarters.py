"""A/B the pallas pool's QUARTERS history layout against the window
layout on the real chip (CLAUDE.md round-4 candidate #2: the window
layout's per-block [S, window] shift concat measured 0.43 ms/block at
S=2048 — 6.6% of serving capacity; the quarters layout holds the
history as warmup-1 [S, hw] buffers and the input block IS the newest
quarter, so the shift disappears).

Protocol (CLAUDE.md measurement rules): scan-sustained (a per-block
push loop is tunnel-RTT-bound at ~18-40 ms/dispatch and cannot resolve
a 0.4 ms difference), interleaved visits, min over visits, one tiny
scalar fetch per visit.  Caveat measured here: inside lax.scan the
quarters rotation rides the carry back-edge, where XLA may insert
copies — the UNROLLED variants (U steps per scan iteration; rotation
becomes SSA renaming for U-1 of every U blocks) bound that cost and
model the real per-block serving path, where donation aliases the
rotation copy-free.

    python scripts/bench_pool_quarters.py                # B=2048, G=16
    BENCH_B=512 BENCH_UNROLL=8 python scripts/bench_pool_quarters.py
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
    plan = make_pool_plan(cfg, HW, B, group=GROUP)
    assert plan is not None
    nq = plan.window // HW

    def olas_of(state):
        return tuple(
            tuple(state["ola"][str(b.B)][o] for o in range(3))
            for b in plan.buckets
        )

    def ola_state_of(new_olas):
        return {str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)}

    def step_window(state, x):  # x [2, S, hw]
        histL = jnp.concatenate([state["histL"][:, HW:], x[0]], axis=1)
        histR = jnp.concatenate([state["histR"][:, HW:], x[1]], axis=1)
        t = state["t"] + 1
        (oc, ols, ors), new_olas = pool_step_lcr(
            histL, histR, t, olas_of(state), plan
        )
        return (
            {"histL": histL, "histR": histR, "t": t,
             "ola": ola_state_of(new_olas)},
            oc,
        )

    def step_quarters(state, x):
        histL = (*state["histL"], x[0])
        histR = (*state["histR"], x[1])
        t = state["t"] + 1
        (oc, ols, ors), new_olas = pool_step_lcr(
            histL, histR, t, olas_of(state), plan
        )
        return (
            {"histL": histL[1:], "histR": histR[1:], "t": t,
             "ola": ola_state_of(new_olas)},
            oc,
        )

    def scan_of(step, unroll):
        if unroll == 1:
            @jax.jit
            def run(state, blocks):  # blocks [N, 2, S, hw]
                return jax.lax.scan(step, state, blocks)
        else:
            def multi(state, xs):  # xs [U, 2, S, hw]
                outs = []
                for u in range(unroll):
                    state, oc = step(state, xs[u])
                    outs.append(oc)
                return state, outs[-1]

            @jax.jit
            def run(state, blocks):
                g = blocks.reshape(
                    N_BLOCKS // unroll, unroll, *blocks.shape[1:]
                )
                return jax.lax.scan(multi, state, g)
        return run

    def fresh(layout):
        ola = {
            str(b.B): tuple(
                jnp.zeros((B, b.B), jnp.float32) for _ in range(3)
            )
            for b in plan.buckets
        }
        if layout == "quarters":
            hist = {
                "histL": tuple(
                    jnp.zeros((B, HW), jnp.float32) for _ in range(nq - 1)
                ),
                "histR": tuple(
                    jnp.zeros((B, HW), jnp.float32) for _ in range(nq - 1)
                ),
            }
        else:
            hist = {
                "histL": jnp.zeros((B, plan.window), jnp.float32),
                "histR": jnp.zeros((B, plan.window), jnp.float32),
            }
        return {**hist, "t": jnp.zeros((B,), jnp.int32), "ola": ola}

    assert N_BLOCKS % UNROLL == 0
    engines = {
        "window": (scan_of(step_window, 1), "window"),
        "quarters": (scan_of(step_quarters, 1), "quarters"),
        f"window-u{UNROLL}": (scan_of(step_window, UNROLL), "window"),
        f"quarters-u{UNROLL}": (scan_of(step_quarters, UNROLL), "quarters"),
    }

    gen = jax.jit(
        lambda k: jax.random.normal(k, (N_BLOCKS, 2, B, HW), jnp.float32) * 0.3
    )
    blocks = gen(jax.random.PRNGKey(0))
    blocks.block_until_ready()

    # Warm (compile) + on-chip cross-check of the last block's C rows.
    ref = None
    for name, (run, layout) in engines.items():
        _, oc = run(fresh(layout), blocks)
        got = np.asarray(oc[-1, :4])
        if ref is None:
            ref = got
        else:
            err = float(np.abs(got - ref).max())
            mag = float(np.abs(ref).max())
            print(f"cross-check {name:12s}: max|diff| {err:.3e} (ref {mag:.3e})")
            assert err <= 1e-5 * max(mag, 1e-9), f"{name} disagrees"

    results = {name: [] for name in engines}
    for v in range(VISITS):
        for name, (run, layout) in engines.items():
            st = fresh(layout)
            t0 = time.perf_counter()
            _, oc = run(st, blocks)
            _ = float(np.asarray(oc[-1, 0, 0]))
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:12s}: {dt * 1e3:7.3f} ms/block", flush=True)

    for name, ts in results.items():
        best = min(ts) * 1e3
        streams = B * deadline_ms / best
        print(
            f"{name:12s}: {best:7.3f} ms/block ({best * 1e3 / B:6.2f} "
            f"us/block/stream) -> {streams:6.0f} realtime streams/chip"
        )


if __name__ == "__main__":
    main()
