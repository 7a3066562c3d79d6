"""On-chip parity at the PRODUCTION geometry: chunk 2^21, >= 8 scan steps.

verify_chip_parity.py proves the spill-carry scan at a tunnel-friendly
4 x 2^16 geometry; this script proves the geometry the headline bench
actually runs — chunk 2^21, an 8+-step scan, and a final segment that is
NOT a multiple of the chunk — without moving the full ~17M-sample signal
through the ~MB/s tunnel:

  - ONE 2^21-sample stereo base block is uploaded (16 MB);
  - the long input is constructed ON DEVICE as per-tile scalar multiples
    of the base (float32 multiply is IEEE-exact, so the host mirrors the
    construction bit-for-bit for the oracle);
  - only spot SLICES of the output are fetched: the warmup, every
    chunk boundary (the spill-carry seams), and the tail including the
    partial final segment.

    python scripts/verify_chip_parity_prod.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)
CHUNK = int(os.environ.get("PARITY_CHUNK", 2**21))
N_CHUNKS = int(os.environ.get("PARITY_CHUNKS", 8))
TAIL = int(os.environ.get("PARITY_TAIL", 123_457))  # non-multiple final seg
SLICE = 2**16

# Per-tile scalar multipliers (exactly representable in float32 would be
# ideal, but any float32 constant works: host and device both compute
# base * m in float32 with IEEE round-to-nearest).
MULTS = [1.0, -0.75, 0.5, 1.25, -1.0, 0.375, -0.625, 0.875, 0.25]


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import build_offline_chunked_fn
    from upmix_tpu.oracle import oracle_multiband
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.make(list(EDGES), sr=SR)
    n = N_CHUNKS * CHUNK + TAIL
    n_tiles = -(-n // CHUNK)
    assert n_tiles <= len(MULTS), "extend MULTS for this geometry"

    rng = np.random.default_rng(0)
    base = np.stack(
        [
            rng.standard_normal(CHUNK).astype(np.float32),
            rng.standard_normal(CHUNK).astype(np.float32),
        ]
    )  # [2, CHUNK]

    # Host-side mirror of the device construction (bit-identical).
    mults = np.asarray(MULTS[:n_tiles], np.float32)
    L = np.concatenate([base[0] * m for m in mults])[:n]
    R = np.concatenate([base[1] * m for m in mults])[:n]

    t0 = time.perf_counter()
    ref = np.stack(oracle_multiband(L, R, cfg))
    print(f"oracle ({n} samples) {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    based = jax.device_put(jnp.asarray(base))
    jax.block_until_ready(based)
    print(f"upload 16 MB base {time.perf_counter() - t0:.1f}s", flush=True)

    offline = build_offline_chunked_fn(cfg, n, chunk=CHUNK)

    @jax.jit
    def run(b):
        x = jnp.concatenate(
            [b * m for m in jnp.asarray(mults)[:, None, None]], axis=1
        )[:, :n]
        c, ls, rs = offline(x[0], x[1])
        return jnp.stack([c, ls, rs])  # [3, n]

    t0 = time.perf_counter()
    out = run(based)
    # Force completion with a tiny fetch before timing the slice fetches.
    float(np.asarray(out[0, 0]))
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)

    # Spot slices: warmup head, every chunk seam, the tail + final partial
    # segment end.
    starts = [0]
    for k in range(1, n_tiles):
        starts.append(k * CHUNK - SLICE // 2)  # straddle each seam
    starts.append(n - SLICE)
    worst = np.inf
    t0 = time.perf_counter()
    for s in starts:
        s = max(0, min(s, n - SLICE))
        got = np.asarray(out[:, s : s + SLICE], np.float64)
        refs = ref[:, s : s + SLICE]
        err = ((got - refs) ** 2).sum()
        sig = (refs**2).sum()
        snr = 10 * np.log10(max(sig, 1e-30) / max(err, 1e-300))
        tag = "head" if s == 0 else ("tail" if s == n - SLICE else "seam")
        print(f"  slice @ {s:>9d} ({tag}): {snr:6.1f} dB", flush=True)
        worst = min(worst, snr)
    print(f"slice fetches {time.perf_counter() - t0:.1f}s", flush=True)

    print(
        f"production geometry: chunk 2^{CHUNK.bit_length() - 1}, "
        f"{n_tiles}-step spill-carry scan, final segment {TAIL} samples; "
        f"worst slice SNR {worst:.1f} dB",
        flush=True,
    )
    assert worst > 60.0, f"parity bar failed: {worst:.1f} dB"
    print("CHIP-PARITY-PROD-OK", flush=True)


if __name__ == "__main__":
    main()
