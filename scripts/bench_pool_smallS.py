"""Single-stream / small-S serving A/B: should a SINGLE live stream
(the reference's only serving mode, bela/upmix.cpp:238-305) run on the
per-stream XLA scan step or on the pallas serving-pool kernel?

The pool kernel wins at scale (19k streams/chip at B=4096) but its
floor probe measured a ~1.8 ms/block G-INVARIANT materialization floor
(DESIGN.md §6) — if that floor is per-LAUNCH rather than per-stream it
should crush the kernel at S<=8 where the XLA scan step costs ~230 us.
This script settles it with the interleaved min-of-visits protocol on
chained scans (no per-block transport in the numbers):

    python scripts/bench_pool_smallS.py

Candidates:
  single      StreamingUpmixer's own scan path (build_stream_step in
              lax.scan) — the engine a lone stream uses today.
  batch/S1,8  BatchStreamingUpmixer sustained runner (vmapped step).
  pool/S8,16  PallasStreamPool sustained runner (quarters, G=8) — the
              smallest lane-eligible pool (group >= 8).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 96))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
UNROLL = int(os.environ.get("BENCH_UNROLL", 8))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import (
        BatchStreamingUpmixer,
        PallasStreamPool,
        build_stream_step,
        init_stream_state,
    )
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    deadline_ms = HW / SR * 1e3

    engines = {}  # name -> (run(state, blocks)->(state, tiny), fresh, S)

    # -- single-stream scan (the current lone-stream engine) ------------
    step1 = build_stream_step(cfg, HW)

    @jax.jit
    def run_single(state, blocks):  # blocks [N, 2, HW]
        state, outs = jax.lax.scan(step1, state, blocks)
        return state, outs[-1, 0]

    engines["single"] = (run_single, lambda: init_stream_state(cfg, HW), 1)

    def pool_entry(pool, S):
        run, fresh = pool.make_sustained_runner(N_BLOCKS, UNROLL)

        def runner(state, blocks):
            state, cs = run(state, blocks)
            return state, cs[-1]

        return (runner, fresh, S)

    for S in (1, 8):
        engines[f"batch/S{S}"] = pool_entry(
            BatchStreamingUpmixer(cfg, HW, n_streams=S, donate=False), S
        )
    for S in (8, 16):
        engines[f"pool/S{S}G8"] = pool_entry(
            PallasStreamPool(cfg, HW, n_streams=S, group=8), S
        )

    # Shared random content, tiled per candidate shape on device.
    base = jax.jit(
        lambda k: jax.random.normal(k, (N_BLOCKS, 2, HW), jnp.float32) * 0.3
    )(jax.random.PRNGKey(0))
    base.block_until_ready()

    inputs, warm = {}, {}
    for name, (run, fresh, S) in engines.items():
        if name == "single":
            blocks = base
        else:
            blocks = jnp.broadcast_to(
                base[:, :, None, :], (N_BLOCKS, 2, S, HW)
            )
            blocks = jax.jit(lambda b: b + 0.0)(blocks)  # materialize
        blocks.block_until_ready()
        inputs[name] = blocks
        _, tiny = run(fresh(), blocks)  # compile + warm off the clock
        warm[name] = np.asarray(tiny)

    # Cross-check: every engine saw the same per-stream signal, so the
    # last C block must agree across engines (>=80 dB, bf16x3 paths).
    ref = warm["single"]
    for name, tiny in warm.items():
        got = tiny if tiny.ndim == 1 else tiny[0]
        err = float(np.abs(got - ref).max())
        scale = max(float(np.abs(ref).max()), 1e-9)
        print(f"cross-check {name:10s}: max|diff| {err:.3e}")
        assert err <= 1e-3 * scale, f"{name} diverges from single"

    results = {name: [] for name in engines}
    for v in range(VISITS):
        for name, (run, fresh, S) in engines.items():
            st = fresh()
            blocks = inputs[name]
            t0 = time.perf_counter()
            _, tiny = run(st, blocks)
            float(np.asarray(tiny).ravel()[0])
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:10s}: {dt * 1e6:9.1f} us/block",
                  flush=True)

    print(f"\ndeadline {deadline_ms:.1f} ms/block; min of {VISITS} visits:")
    single_t = min(results["single"])
    for name, ts in results.items():
        t = min(ts)
        S = engines[name][2]
        print(
            f"{name:10s}: {t * 1e6:9.1f} us/block "
            f"({t * 1e6 / S:8.1f} us/stream, {S} stream(s), "
            f"{deadline_ms * 1e-3 / t:6.1f}x realtime/stream)"
        )
    t8 = min(results["pool/S8G8"])
    if t8 < single_t:
        print(f"\npool kernel WINS at S=8: {t8 * 1e6:.0f} vs "
              f"{single_t * 1e6:.0f} us/block -> route single streams "
              "through a padded pool")
    else:
        print(f"\npool kernel LOSES at S=8: {t8 * 1e6:.0f} vs "
              f"{single_t * 1e6:.0f} us/block -> keep the XLA scan step "
              "for lone streams (launch floor dominates below the "
              "crossover)")


if __name__ == "__main__":
    main()
