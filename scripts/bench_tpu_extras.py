"""Real-chip evidence runs for the round-2 verdict items:

1. sharded  — ShardedUpmixer (shard_map + the fused pallas kernel) on a
   1-device {"seq": 1} mesh on the REAL TPU, parity-checked against the
   offline path (removes the "interpret-mode only" caveat on
   parallel/sharded.py).
2. batch    — BatchUpmixer.process_files over 8 synthetic files,
   pipelined submit/collect vs a strictly sequential submit+collect
   loop; records audio-sec/sec both ways.

Run ONE at a time on the chip:  python scripts/bench_tpu_extras.py [sharded|batch|all]
Results are recorded in BASELINE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)


def snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = ref - got
    return 10 * np.log10(max((ref**2).sum(), 1e-30) / max((err**2).sum(), 1e-30))


def run_sharded():
    import jax

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import Upmixer
    from upmix_tpu.parallel.sharded import ShardedUpmixer, make_mesh

    print("backend:", jax.default_backend(), jax.devices())
    config = UpmixConfig.make(list(EDGES), sr=SR)
    n = 2**18
    rng = np.random.default_rng(0)
    L = rng.standard_normal(n).astype(np.float32)
    R = (0.6 * L + 0.4 * rng.standard_normal(n)).astype(np.float32)

    mesh = make_mesh({"seq": 1})
    su = ShardedUpmixer(config, mesh, kernel="mm", use_pallas=True)
    t0 = time.perf_counter()
    c_s, ls_s, rs_s = (np.asarray(a) for a in su.process(L, R))
    t_sharded = time.perf_counter() - t0

    up = Upmixer(config, kernel="mm")
    c_o, ls_o, rs_o = up.process_np(L, R)

    snrs = [snr_db(a, b) for a, b in ((c_o, c_s), (ls_o, ls_s), (rs_o, rs_s))]
    print(
        f"sharded(seq=1, pallas) vs offline SNR: "
        f"{[round(s, 1) for s in snrs]}  (first-call {t_sharded:.1f}s incl compile)"
    )
    assert min(snrs) > 60.0, "sharded/offline parity failed on real TPU"
    print("SHARDED-PALLAS-ON-TPU: OK")


def run_batch():
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.batch import BatchUpmixer

    config = UpmixConfig.make(list(EDGES), sr=SR)
    n = 2**17
    batch_size = 2
    n_files = 8
    rng = np.random.default_rng(1)
    files = [rng.standard_normal((2, n)).astype(np.float32) for _ in range(n_files)]
    audio_sec = n_files * n / SR

    eng = BatchUpmixer(config, n_samples=n, batch_size=batch_size)
    # Warm (compile) on one batch.
    list(eng.process_files(files[:batch_size]))

    # Pipelined: submit batch i+1 before collecting batch i.
    t0 = time.perf_counter()
    outs = list(eng.process_files(iter(files)))
    t_pipe = time.perf_counter() - t0
    assert len(outs) == n_files

    # Strictly sequential: submit, fully collect, then next.
    t0 = time.perf_counter()
    for s in range(0, n_files, batch_size):
        h = eng.submit(files[s : s + batch_size])
        eng.collect(h)
    t_seq = time.perf_counter() - t0

    print(
        f"batch({n_files} files x {n / SR:.1f}s, batch_size={batch_size}): "
        f"pipelined {audio_sec / t_pipe:.1f} audio-sec/sec, "
        f"sequential {audio_sec / t_seq:.1f} audio-sec/sec "
        f"(overlap gain {t_seq / t_pipe:.2f}x)"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("sharded", "all"):
        run_sharded()
    if which in ("batch", "all"):
        run_batch()
