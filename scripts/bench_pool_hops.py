"""Interleaved hops-sweep of the quarters-layout pool kernel at the
serving capacity point: hops=T runs T consecutive hardware blocks per
kernel launch (temporal batching — pool_step_lcr(hops=T)), chaining the
OLA carries as in-kernel values and sharing the history quarters across
hops (per block: history reads drop from nq quarters to (nq-1+T)/T,
carry HBM traffic drops by T; per-hop compute unchanged).  The trade is
per-block serving latency: one dispatch covers T block deadlines, so a
serving pool at hops=T must also hold T blocks of input — use it on the
sustained/batch path, not the lockstep dispatcher.

Protocol: scan-sustained (make_sustained_runner), interleaved
min-of-visits — the only trustworthy A/B through the tunnel (CLAUDE.md).

    python scripts/bench_pool_hops.py             # B=4096, G=16, U=8
    BENCH_B=2048 BENCH_HOPS=1,2,4 python scripts/bench_pool_hops.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
# 24 (not 48): every hops variant holds its own device copy of the
# input (N_BLOCKS*2*B*HW*4 bytes each) and they must ALL stay alive for
# the interleaved protocol — 48 blocks x 4 variants at B=4096 is
# 12.9 GB and OOMs the v5e's 16 GB HBM (measured 2026-08-19).
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 24))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
B = int(os.environ.get("BENCH_B", 4096))
G = int(os.environ.get("BENCH_G", 16))
UNROLL = int(os.environ.get("BENCH_UNROLL", 8))
HOPS = [int(h) for h in os.environ.get("BENCH_HOPS", "1,2,4,8").split(",")]
OLA = os.environ.get("BENCH_OLA", "time")  # or "spectral"


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import PallasStreamPool
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    deadline_ms = HW / SR * 1e3

    pool = PallasStreamPool(cfg, HW, n_streams=B, group=G, ola=OLA)
    engines = {}
    for T in HOPS:
        if N_BLOCKS % T:
            print(f"hops={T}: skipped (N_BLOCKS {N_BLOCKS} not a multiple)")
            continue
        run, fresh = pool.make_sustained_runner(N_BLOCKS, unroll=UNROLL,
                                                hops=T)
        engines[f"T{T}"] = (T, run, fresh)

    gen = jax.jit(
        lambda k: jax.random.normal(k, (N_BLOCKS, 2, B, HW), jnp.float32) * 0.3
    )
    base = gen(jax.random.PRNGKey(0))
    base.block_until_ready()

    def slabs(T):
        if T == 1:
            return base
        return jax.jit(
            lambda b: b.reshape(N_BLOCKS // T, T, 2, B, HW)
            .transpose(0, 2, 3, 1, 4)
            .reshape(N_BLOCKS // T, 2, B, T * HW)
        )(base)

    ref = None
    alive = {}
    for name, (T, run, fresh) in engines.items():
        try:
            # slabs() inside the try: each variant keeps a full device
            # copy of the input alive (N_BLOCKS*2*B*HW*4 bytes — 1.6 GB
            # at the default geometry), so a big-T candidate can OOM HBM
            # here as well as in the kernel itself.
            blocks = slabs(T)
            blocks.block_until_ready()
            _, oc = run(fresh(), blocks)
            got = np.asarray(oc[-1, :4, -HW:])  # last emitted C block
        except Exception as e:  # e.g. Mosaic reject / VMEM/HBM blowup at big T
            print(f"{name}: FAILED to compile/run: {type(e).__name__}: {e}",
                  flush=True)
            continue
        alive[name] = (run, fresh, blocks)
        if ref is None:
            ref = got
        else:
            err = float(np.abs(got - ref).max())
            print(f"cross-check {name}: max|diff| {err:.3e}", flush=True)
            assert err <= 1e-4 * max(float(np.abs(ref).max()), 1e-9)

    results = {name: [] for name in alive}
    for v in range(VISITS):
        for name, (run, fresh, blocks) in alive.items():
            st = fresh()  # state allocation outside the timed region
            t0 = time.perf_counter()
            _, oc = run(st, blocks)
            _ = float(np.asarray(oc[-1, 0, 0]))
            dt = (time.perf_counter() - t0) / N_BLOCKS
            results[name].append(dt)
            print(f"visit {v} {name:3s}: {dt * 1e3:7.3f} ms/block", flush=True)

    for name, ts in results.items():
        best = min(ts) * 1e3
        print(f"{name:3s}: {best:7.3f} ms/block ({best * 1e3 / B:5.2f} "
              f"us/stream) -> {B * deadline_ms / best:6.0f} streams/chip")


if __name__ == "__main__":
    main()
