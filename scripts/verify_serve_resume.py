"""On-chip verify: the live-stream server + session resume on the REAL
pallas pool kernel.

Runs the whole production serving path on the TPU in one process:
server A (lockstep, PallasStreamPool engine) serves a v2 client for a
few blocks, checkpoints to disk, dies; server B restores the file, the
client reconnects with its token and finishes the stream.  The joined
output must be SAMPLE-EXACT vs an uninterrupted one-shot run on its own
server (same engine class).  Exercises: pallas pool on real hardware,
extract/load_streams round trip through the .npz codec, protocol v2,
parked-slot resume, and the lockstep dispatcher.

    python scripts/verify_serve_resume.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000.0
HW = 2048
EDGES = (0.0, 500.0, 2000.0, 8000.0)
S = 16


def main():
    import jax

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.streaming import (
        PallasStreamPool,
        stream_warmup_blocks,
    )
    from upmix_tpu.serve_stream import (
        StreamServer,
        StreamSession,
        stream_client,
    )
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    cfg = UpmixConfig.streaming(list(EDGES), sr=SR, hw_block_size=HW)

    def pool_factory():
        return PallasStreamPool(cfg, HW, n_streams=S, group=16)

    n_blocks = 12
    rng = np.random.default_rng(7)
    shared = rng.standard_normal(n_blocks * HW).astype(np.float32) * 0.3
    L = shared + 0.1 * rng.standard_normal(n_blocks * HW).astype(np.float32)
    R = shared + 0.1 * rng.standard_normal(n_blocks * HW).astype(np.float32)

    t0 = time.perf_counter()
    with StreamServer(pool_factory(), lockstep=True) as srv:
        ref = stream_client(*srv.address, L, R, timeout=600.0)
    print(f"one-shot reference: {time.perf_counter() - t0:.1f}s "
          f"({n_blocks} blocks, {S}-slot pallas pool)")

    skip = (stream_warmup_blocks(cfg) - 1) * HW
    path = "/tmp/verify_serve_resume.npz"
    cut = 6

    srv_a = StreamServer(pool_factory(), lockstep=True).start()
    sess = StreamSession(*srv_a.address, timeout=600.0)
    for b in range(cut):
        sess.send_block(L[b * HW : (b + 1) * HW], R[b * HW : (b + 1) * HW])
    part1 = sess.recv_frames(cut * HW - skip)
    n_saved = srv_a.save_checkpoint(path)
    assert n_saved == 1, n_saved
    sess.close()
    srv_a.close()
    print(f"checkpointed {n_saved} session "
          f"({os.path.getsize(path) / 1e6:.1f} MB) and killed server A")

    srv_b = StreamServer(pool_factory(), lockstep=True,
                         checkpoint=path).start()
    try:
        sess2 = StreamSession(*srv_b.address, token=sess.token,
                              timeout=600.0)
        assert sess2.server_in_frames == cut * HW
        dup = len(part1) - sess2.server_out_frames
        assert dup >= 0
        for b in range(cut, n_blocks):
            sess2.send_block(L[b * HW : (b + 1) * HW],
                             R[b * HW : (b + 1) * HW])
        sess2.finish()
        regen = sess2.recv_frames(dup + n_blocks * HW - len(part1))
        got = np.concatenate([part1, regen[dup:]])
        sess2.close()
    finally:
        srv_b.close()

    want = np.column_stack(ref)
    d = float(np.abs(got - want).max())
    print(f"resumed-vs-uninterrupted max|diff| = {d}")
    assert d == 0.0, "resume is not sample-exact on the real chip"
    print("VERIFY_SERVE_RESUME_OK")


if __name__ == "__main__":
    main()
