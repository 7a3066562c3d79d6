"""A/B: serving-pool dispatch cost — donation policy and AOT wrappers.

Round-4 finding (clean interleaved A/B, v5e): for the PALLAS pool,
jit-level donation measures SLOWER per dispatched block (S=2048:
7.07 vs 5.86 ms; S=256: 2.72 vs 2.10 — donation costs 0.6-1.2 ms of
runtime bookkeeping, consistent with defensive copies when aliasing
pallas_call outputs), while the pure-XLA engines measure donation
FASTER (StreamingUpmixer 5.8 vs 8.2 ms/block).  PallasStreamPool
therefore defaults donate=False; the XLA engines keep donate=True.

Arms:
  live     PallasStreamPool at shipped defaults (donate=False)
  livedon  PallasStreamPool donate=True (the old always-donating form)
  aot      the shipped loader: jax.jit(exported.call), no donation
  aotraw   bare Exported.call per block (the pre-fix loader: per-call
           Python overhead, +0.7-3 ms/block)

Protocol: interleaved min-of-visits over sustained push_blocks loops
(state stays on device; inputs chain off the previous outputs so no
buffer is ever pushed twice — required for the donating arm).
Run on the real chip, ONE process:  python scripts/bench_aot_pool.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000.0
HW = int(os.environ.get("BENCH_HW", 2048))
S = int(os.environ.get("BENCH_STREAMS", 2048))
EDGES = (0.0, 500.0, 2000.0, 8000.0)
INNER = int(os.environ.get("BENCH_INNER", 20))  # blocks per visit
VISITS = int(os.environ.get("BENCH_VISITS", 8))


def main():
    import jax

    from upmix_tpu import aot
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import PallasStreamPool
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(list(EDGES), sr=SR, hw_block_size=HW)

    path = "/tmp/bench_pool.upmixaot"
    t0 = time.perf_counter()
    aot.save_stream_pool(path, cfg, HW, S)
    print(f"save_stream_pool: {time.perf_counter() - t0:.1f}s")

    art_raw = aot.load(path)
    art_raw._step = art_raw.exported.call  # the pre-fix loader behavior

    arms = {
        "live": PallasStreamPool(cfg, HW, n_streams=S, group=16),
        "livedon": PallasStreamPool(cfg, HW, n_streams=S, group=16,
                                    donate=True),
        "aot": aot.load(path),
        "aotraw": art_raw,
    }

    rng = np.random.default_rng(0)
    x0 = (rng.standard_normal((S, HW)) * 0.3).astype(np.float32)

    # Chain each block's inputs off the previous outputs: fresh device
    # buffers every call (donating arms forbid re-pushing a buffer) and
    # no host->device transfer inside the timed loop.
    def chain_inputs(out, seed):
        return out[0] + seed, out[1] - seed

    for name, pool in arms.items():
        t0 = time.perf_counter()
        xl, xr = jax.device_put(x0), jax.device_put(-x0)
        for _ in range(pool.warmup_blocks + 1):
            out = pool.push_blocks(xl, xr)
            xl, xr = chain_inputs(out, x0[0, 0])
        _ = float(np.asarray(out[0][0, 0]))
        print(f"{name:8s} compile+warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        arms[name] = (pool, out)

    best = {name: np.inf for name in arms}
    for v in range(VISITS):
        for name, (pool, out) in arms.items():
            xl, xr = chain_inputs(out, 1e-3)
            t0 = time.perf_counter()
            for _ in range(INNER):
                out = pool.push_blocks(xl, xr)
                xl, xr = chain_inputs(out, 1e-3)
            _ = float(np.asarray(out[0][0, 0]))
            best[name] = min(
                best[name], (time.perf_counter() - t0) / INNER
            )
            arms[name] = (pool, out)
        time.sleep(0.5)

    base = best["live"]
    print(f"\nS={S} streams, hw={HW} @ {SR:.0f} Hz "
          f"(block period {HW / SR * 1e3:.1f} ms)")
    for name, t in best.items():
        us = t / S * 1e6
        streams = (HW / SR) / t * S
        print(f"{name:8s} min {t * 1e3:7.3f} ms/block  {us:6.2f} us/blk/stream"
              f"  -> {streams:8.0f} realtime streams/chip"
              f"  ({t / base * 100:5.1f}% of live)")


if __name__ == "__main__":
    main()
