"""On-chip drive of the native network client (native/upmix_net_client).

A REAL-TPU StreamServer (pallas pool, the Bela 48 kHz serving config)
serves the same ragged-tail signal to two sequential sessions — the
Python `stream_client` and the native C++ binary piping raw PCM — and
the outputs must be bit-identical; the result is then held to the
float64 streaming oracle (>60 dB, warmup-aligned).  Exercises the wire
protocol, the binary's pad/trim bookkeeping, and the pool slot re-warm
end to end on hardware.  Builds the binary on demand.

    python scripts/verify_net_client.py
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000.0
HW = 2048
EDGES = (0.0, 500.0, 2000.0, 8000.0)
S = 16


def _snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(got, np.float64) - ref
    p = float(np.mean(np.square(ref)))
    e = float(np.mean(np.square(err)))
    return 10.0 * np.log10(p / max(e, 1e-300))


def main():
    import jax

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import (
        PallasStreamPool,
        stream_warmup_blocks,
    )
    from upmix_tpu.oracle.reference import oracle_stream_multiband
    from upmix_tpu.serve_stream import StreamServer, stream_client
    from upmix_tpu.utils.cache import enable_compilation_cache

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    binpath = os.path.join(root, "native", "upmix_net_client")
    if not os.path.exists(binpath):
        subprocess.run(
            ["make", "-C", os.path.join(root, "native"), "net"], check=True
        )

    enable_compilation_cache()
    print("devices:", jax.devices())
    cfg = UpmixConfig.streaming(list(EDGES), sr=SR, hw_block_size=HW)
    pool = PallasStreamPool(cfg, HW, n_streams=S, group=16)

    n = 9 * HW + 1234  # ragged tail: pad on the wire, trim on the way out
    rng = np.random.default_rng(11)
    shared = (rng.standard_normal(n) * 0.3).astype(np.float32)
    L = shared + 0.1 * rng.standard_normal(n).astype(np.float32)
    R = shared + 0.1 * rng.standard_normal(n).astype(np.float32)

    with StreamServer(pool, lockstep=True) as srv:
        t0 = time.perf_counter()
        ref = stream_client(*srv.address, L, R, timeout=900.0)
        print(f"python client: {time.perf_counter() - t0:.1f} s "
              "(incl. compile)")
        raw = np.column_stack([L, R]).astype("<f4").tobytes()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [binpath, "--host", srv.address[0],
             "--port", str(srv.address[1]), "--sr", str(SR)],
            input=raw, capture_output=True, timeout=900,
        )
        print(f"native client: {time.perf_counter() - t0:.1f} s warm")
        assert proc.returncode == 0, proc.stderr.decode()
    got = np.frombuffer(proc.stdout, "<f4").reshape(-1, 2)
    want = np.column_stack(ref)
    assert got.shape == want.shape == (n, 2), (got.shape, want.shape)
    diff = float(np.abs(got - want).max())
    print(f"native vs python client max|diff|: {diff}")
    assert diff == 0.0, "native client output diverges from stream_client"

    # Warmup-aligned oracle reference: feed the oracle the padded signal
    # plus enough zero drain for the skip window, then align.
    skip = (stream_warmup_blocks(cfg) - 1) * HW
    pad = (-n) % HW
    Lx = np.concatenate([L, np.zeros(pad + skip + HW, np.float32)])
    Rx = np.concatenate([R, np.zeros(pad + skip + HW, np.float32)])
    ol, orr = oracle_stream_multiband(Lx, Rx, cfg, HW)
    s_l = _snr_db(ol[skip:skip + n], got[:, 0])
    s_r = _snr_db(orr[skip:skip + n], got[:, 1])
    print(f"oracle SNR: L {s_l:.1f} dB, R {s_r:.1f} dB")
    assert s_l > 60.0 and s_r > 60.0
    print("PASS")


if __name__ == "__main__":
    main()
