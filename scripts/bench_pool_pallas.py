"""A/B the pallas serving-pool kernel against the vmapped XLA pool on
the real chip (4-band 48 kHz / 2048 Bela config, scan-sustained).

Protocol (CLAUDE.md measurement rules): interleaved visits, each visit
scans N_BLOCKS hardware blocks in ONE dispatch (the scan chain is the
dependency chain), min over visits, one tiny scalar fetch per visit.

    python scripts/bench_pool_pallas.py            # B=128 both engines
    BENCH_B=256 python scripts/bench_pool_pallas.py

Note: this script A/Bs the pallas KERNEL against the vmapped XLA pool
with both on the (legacy) window history layout, scan-driven.  The
history-layout A/B (quarters vs window — quarters is the production
default) lives in scripts/bench_pool_quarters.py; the group-size sweep
in scripts/bench_pool_group.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 64))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
B = int(os.environ.get("BENCH_B", 128))
GROUP = int(os.environ.get("BENCH_GROUP", 16))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import build_stream_step, init_stream_state
    from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    deadline_ms = HW / SR * 1e3
    # Generate the blocks ON DEVICE (the host->device tunnel moves
    # ~0.1-1 MB/s; this tensor is ~134 MB at B=128).
    blocks = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N_BLOCKS, B, 2, HW), jnp.float32
        )
        * 0.3
    )()
    blocks.block_until_ready()

    # --- XLA pool: vmapped stream step under scan -----------------------
    step = build_stream_step(cfg, HW)
    vstep = jax.vmap(step)

    @jax.jit
    def scan_xla(state, blocks):
        return jax.lax.scan(vstep, state, blocks)

    one = init_stream_state(cfg, HW)
    xla_state = jax.device_put(
        jax.tree.map(lambda a: jnp.zeros((B,) + a.shape, a.dtype), one)
    )

    # --- pallas pool: pool step under scan ------------------------------
    plan = make_pool_plan(cfg, HW, B, group=GROUP)
    assert plan is not None, "config must be pool-eligible for this bench"

    def pool_step(state, x):  # x [S, 2, hw]
        histL = jnp.concatenate([state["histL"][:, HW:], x[:, 0, :]], axis=1)
        histR = jnp.concatenate([state["histR"][:, HW:], x[:, 1, :]], axis=1)
        t = state["t"] + 1
        olas = tuple(
            tuple(state["ola"][str(b.B)][o] for o in range(3))
            for b in plan.buckets
        )
        # Warmup gating happens in the kernel (t-driven, per stream).
        (oc, ols, ors), new_olas = pool_step_lcr(histL, histR, t, olas, plan)
        ola_state = {
            str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)
        }
        return {"histL": histL, "histR": histR, "t": t, "ola": ola_state}, (
            oc,
            ols,
            ors,
        )

    @jax.jit
    def scan_pool(state, blocks):
        return jax.lax.scan(pool_step, state, blocks)

    pool_state = jax.device_put(
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

    # Warm both (compile) + cross-check outputs on-chip.
    _, o1 = scan_xla(xla_state, blocks)  # [N, S, 3, hw]
    _, o2 = scan_pool(pool_state, blocks)  # tuple of [N, S, hw]
    a = np.asarray(o1[N_BLOCKS - 1, :4, 0, :])  # last block, 4 streams, C
    bb = np.asarray(o2[0][N_BLOCKS - 1, :4])
    err = float(np.abs(a - bb).max())
    ref = float(np.abs(a).max())
    print(f"cross-check: max|diff| {err:.3e} vs max|ref| {ref:.3e}")
    assert err < 1e-3 * max(ref, 1e-9), "pallas pool disagrees with XLA pool"

    results = {}
    for name, fn, st in (("xla", scan_xla, xla_state), ("pallas", scan_pool, pool_state)):
        results[name] = []
    for v in range(VISITS):
        for name, fn, st in (
            ("xla", scan_xla, xla_state),
            ("pallas", scan_pool, pool_state),
        ):
            t0 = time.perf_counter()
            _, outs = fn(st, blocks)
            _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:6s}: {dt * 1e3:7.3f} ms/block")

    for name, ts in results.items():
        best = min(ts) * 1e3
        per_stream = best * 1e3 / B
        streams = B * deadline_ms / best
        print(
            f"{name:6s}: {best:7.3f} ms/block ({per_stream:6.2f} us/block/stream)"
            f" -> {streams:6.0f} realtime streams/chip"
        )


if __name__ == "__main__":
    main()
