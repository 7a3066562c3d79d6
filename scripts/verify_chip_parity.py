"""Full-program on-chip parity: the chunked omnibus scan vs the f64 oracle.

Runs the SAME program class the headline bench times — the multi-chunk
lax.scan with the all-buckets omnibus kernel and the OLA spill carried
across steps — on the real chip, and holds its full output to the
float64 NumPy oracle.

Default geometry (2^18 samples, chunk 2^16 -> a 4-step scan) keeps
tunnel traffic ~5 MB; larger sizes time out when the tunnel is in its
slow regime (a 2^20/12 MB-oracle attempt exceeded 9 minutes of upload).
Measured: 107.1 dB (2026-08-17, recorded in BASELINE.md).

    python scripts/verify_chip_parity.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)
N = int(os.environ.get("PARITY_SAMPLES", 2**18))
CHUNK = int(os.environ.get("PARITY_CHUNK", 2**16))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import build_offline_chunked_fn
    from upmix_tpu.oracle import oracle_multiband
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.make(list(EDGES), sr=SR)
    rng = np.random.default_rng(0)
    L = rng.standard_normal(N).astype(np.float32)
    R = (0.6 * L + 0.4 * rng.standard_normal(N)).astype(np.float32)

    t0 = time.perf_counter()
    ref = np.stack(oracle_multiband(L, R, cfg))
    print(f"oracle {time.perf_counter() - t0:.1f}s", flush=True)

    fn = jax.jit(build_offline_chunked_fn(cfg, N, chunk=CHUNK))
    Ld, Rd = jax.device_put((jnp.asarray(L), jnp.asarray(R)))
    t0 = time.perf_counter()
    c, ls, rs = fn(Ld, Rd)
    got = np.stack([np.asarray(c), np.asarray(ls), np.asarray(rs)])
    print(f"compile+run+fetch {time.perf_counter() - t0:.1f}s", flush=True)

    err = got.astype(np.float64) - ref
    snr = 10 * np.log10(max((ref**2).sum(), 1e-30) / max((err**2).sum(), 1e-30))
    print(
        f"on-chip chunked omnibus scan ({-(-N // CHUNK)} spill-carry steps, "
        f"chunk 2^{CHUNK.bit_length() - 1}) vs f64 oracle: {snr:.1f} dB",
        flush=True,
    )
    assert snr > 60.0, f"parity bar failed: {snr:.1f} dB"
    print("CHIP-PARITY-OK", flush=True)


if __name__ == "__main__":
    main()
