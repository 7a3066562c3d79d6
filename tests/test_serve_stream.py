"""Multi-client stream-server tests (upmix_tpu/serve_stream.py): the
socket surface must hand each client exactly the warmup-aligned output
its signal would get from the single-stream engine — concurrently, with
slot churn and pool-full rejection (SURVEY.md §5 failure handling; the
serving counterpart of the run_pipe tests)."""

import threading

import numpy as np
import pytest

from upmix_tpu.config import UpmixConfig
from upmix_tpu.models.streaming import BatchStreamingUpmixer, StreamingUpmixer
from upmix_tpu.serve_stream import StreamServer, stream_client

from helpers import make_stereo, snr_db

HW = 256
SR = 8000.0
EDGES = [0.0, 400.0, 1600.0]


def _cfg():
    return UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)


@pytest.fixture(scope="module")
def server():
    pool = BatchStreamingUpmixer(_cfg(), HW, n_streams=4)
    with StreamServer(pool, lockstep=True) as srv:
        yield srv


def _aligned_reference(L, R, mix="stereo_sum"):
    """What a warmup-aligned client must receive: run the single-stream
    engine over the (padded) signal plus zero drain blocks, drop the
    leading warmup silence, trim to the input length."""
    from upmix_tpu.models.streaming import stream_warmup_blocks

    eng = StreamingUpmixer(_cfg(), HW)
    n = len(L)
    pad = (-n) % HW
    xl = np.concatenate([L, np.zeros(pad, np.float32)])
    xr = np.concatenate([R, np.zeros(pad, np.float32)])
    skip = (stream_warmup_blocks(_cfg()) - 1) * HW
    outs = []
    zeros = np.zeros(HW, np.float32)
    total = len(xl)
    blocks = [
        (xl[i : i + HW], xr[i : i + HW]) for i in range(0, total, HW)
    ]
    emitted = 0
    bi = 0
    while emitted < total:
        bl, br = blocks[bi] if bi < len(blocks) else (zeros, zeros)
        bi += 1
        c, ls, rs = (np.asarray(o) for o in eng.push_block(bl, br))
        if mix == "lcr":
            out = np.column_stack([c, ls, rs])
        else:
            out = np.column_stack([ls + 0.5 * c, rs + 0.5 * c])
        if skip:
            k = min(skip, len(out))
            out = out[k:]
            skip -= k
        out = out[: total - emitted]
        if len(out):
            outs.append(out)
            emitted += len(out)
    ref = np.concatenate(outs)[:n]
    return tuple(np.ascontiguousarray(ref[:, ch]) for ch in range(ref.shape[1]))


def _check(got, ref):
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape
        if np.abs(r).max() > 0:
            assert snr_db(r, g) > 80.0
        else:
            np.testing.assert_allclose(g, r, atol=1e-6)


def test_single_client_round_trip(server):
    # Includes a short final block (client pads, output trimmed to n).
    L, R = make_stereo(10 * HW + 100, SR, seed=60)
    L, R = L.astype(np.float32), R.astype(np.float32)
    got = stream_client(*server.address, L, R)
    _check(got, _aligned_reference(L, R))


def test_lcr_mix(server):
    L, R = make_stereo(6 * HW, SR, seed=61)
    L, R = L.astype(np.float32), R.astype(np.float32)
    got = stream_client(*server.address, L, R, mix="lcr")
    assert len(got) == 3
    _check(got, _aligned_reference(L, R, mix="lcr"))


def test_concurrent_clients_are_isolated(server):
    # Three different signals at once: each client gets exactly its own
    # stream's result, as if it were alone on a dedicated engine.
    sigs = []
    for seed in (62, 63, 64):
        L, R = make_stereo(8 * HW, SR, seed=seed)
        sigs.append((L.astype(np.float32), R.astype(np.float32)))
    results = [None] * len(sigs)

    def go(i):
        results[i] = stream_client(*server.address, *sigs[i])

    threads = [threading.Thread(target=go, args=(i,)) for i in range(len(sigs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, (L, R) in enumerate(sigs):
        assert results[i] is not None, f"client {i} did not finish"
        _check(results[i], _aligned_reference(L, R))


def test_slot_reuse_after_churn(server):
    # Sequential sessions reuse slots; a re-warmed slot must behave like
    # a fresh engine (no state leakage from the previous occupant).
    for seed in (65, 66):
        L, R = make_stereo(5 * HW, SR, seed=seed)
        L, R = L.astype(np.float32), R.astype(np.float32)
        got = stream_client(*server.address, L, R)
        _check(got, _aligned_reference(L, R))


def test_pool_full_rejection():
    # A server with a 1-slot pool serves one client and rejects a
    # second while the first is live; the slot frees afterwards.
    pool = BatchStreamingUpmixer(_cfg(), HW, n_streams=1)
    with StreamServer(pool, lockstep=True) as srv:
        import socket
        import struct

        from upmix_tpu.serve_stream import MAGIC_HELLO, MAGIC_REPLY, _read_exact

        hold = socket.create_connection(srv.address, timeout=10)
        hold.sendall(MAGIC_HELLO + struct.pack("<II", 1, 0))
        reply = _read_exact(hold, 20)
        assert reply[:4] == MAGIC_REPLY
        assert struct.unpack("<I", reply[4:8])[0] == 0  # accepted

        with pytest.raises(ConnectionError, match="full"):
            L, R = make_stereo(2 * HW, SR, seed=67)
            stream_client(
                *srv.address, L.astype(np.float32), R.astype(np.float32)
            )
        hold.close()
        # The abandoned slot drains out and frees; a new session works.
        deadline = 50
        last = None
        for _ in range(deadline):
            try:
                L, R = make_stereo(2 * HW, SR, seed=68)
                last = stream_client(
                    *srv.address, L.astype(np.float32), R.astype(np.float32)
                )
                break
            except ConnectionError:
                import time

                time.sleep(0.1)
        assert last is not None, "slot never freed after client abort"


def test_realtime_tick_mode_completes():
    # lockstep=False ticks on the wall clock and never stalls on a slow
    # client; a prompt client still gets a complete stream back.
    pool = BatchStreamingUpmixer(_cfg(), HW, n_streams=2)
    with StreamServer(pool, lockstep=False, sr=SR * 8) as srv:
        L, R = make_stereo(4 * HW, SR, seed=69)
        got = stream_client(
            *srv.address, L.astype(np.float32), R.astype(np.float32)
        )
        assert len(got) == 2
        assert all(np.isfinite(np.asarray(g)).all() for g in got)
        assert all(len(g) == 4 * HW for g in got)


def test_cli_serve_stream_round_trip(tmp_path):
    # The `upmix-tpu - --serve-stream` surface end-to-end: spawn the CLI
    # server as a subprocess (CPU env), connect with stream_client, and
    # check the aligned round trip against the single-stream engine.
    import re
    import subprocess
    import sys
    import time

    from helpers import cpu_child_env

    proc = subprocess.Popen(
        [
            sys.executable, "-m", "upmix_tpu.cli", "-",
            "--serve-stream", "0", "--sr", str(SR), "--hw-block", str(HW),
            "--band-edges", ",".join(str(e) for e in EDGES),
            "--streams", "2", "--lockstep",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=cpu_child_env(),
    )
    try:
        addr = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            m = re.search(r"stream server on ([\d.]+):(\d+)", line)
            if m:
                addr = (m.group(1), int(m.group(2)))
                break
        assert addr is not None, "server never announced its address"
        L, R = make_stereo(6 * HW, SR, seed=70)
        L, R = L.astype(np.float32), R.astype(np.float32)
        got = stream_client(*addr, L, R, timeout=120.0)
        _check(got, _aligned_reference(L, R))
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_rst_abort_frees_slot_and_pool_keeps_serving():
    # A client that dies with a TCP RST mid-stream (no clean half-close)
    # must not leak its slot or stall the lockstep dispatcher: the
    # server transitions the slot to draining on ANY reader exit path.
    import socket
    import struct

    from upmix_tpu.serve_stream import MAGIC_HELLO, _read_exact

    pool = BatchStreamingUpmixer(_cfg(), HW, n_streams=1)
    with StreamServer(pool, lockstep=True) as srv:
        rude = socket.create_connection(srv.address, timeout=10)
        rude.sendall(MAGIC_HELLO + struct.pack("<II", 1, 0))
        assert len(_read_exact(rude, 20)) == 20  # accepted
        # Send 1.5 blocks then abort with RST (SO_LINGER zero).
        junk = np.zeros(int(1.5 * HW * 2), np.float32).tobytes()
        rude.sendall(junk)
        rude.setsockopt(
            socket.SOL_SOCKET, socket.SO_LINGER, struct.pack("ii", 1, 0)
        )
        rude.close()

        # The single slot must free and the next client must complete.
        import time

        L, R = make_stereo(3 * HW, SR, seed=71)
        L, R = L.astype(np.float32), R.astype(np.float32)
        got = None
        for _ in range(100):
            try:
                got = stream_client(*srv.address, L, R, timeout=30.0)
                break
            except ConnectionError:
                time.sleep(0.1)
        assert got is not None, "slot leaked after RST abort"
        _check(got, _aligned_reference(L, R))


def test_spectral_pool_serves_clients():
    # The spectral-OLA pallas pool composes with the socket stack: a
    # client's warmup-aligned output matches the single-stream engine.
    from upmix_tpu.models.streaming import PallasStreamPool

    pool = PallasStreamPool(_cfg(), HW, n_streams=8, group=8, ola="spectral")
    with StreamServer(pool, lockstep=True) as srv:
        L, R = make_stereo(8 * HW, SR, seed=67)
        L, R = L.astype(np.float32), R.astype(np.float32)
        got = stream_client(*srv.address, L, R)
        _check(got, _aligned_reference(L, R))


def test_run_stream_server_pool_options():
    # The CLI entry (run_stream_server) forwards its explicit pool
    # options — a lockstep spectral pallas pool built through the
    # factory path, not a hand-built pool — and a typo'd keyword
    # raises at the call site instead of inside pool construction.
    from upmix_tpu.serve_stream import run_stream_server

    srv = run_stream_server(
        0, sr=SR, n_streams=8, hw_block_size=HW, band_edges=EDGES,
        lockstep=True, engine="pallas", ola="spectral", group=8,
        verbose=False,
    )
    try:
        from upmix_tpu.models.streaming import PallasStreamPool

        assert isinstance(srv.pool, PallasStreamPool)
        assert srv.pool.ola == "spectral"
        L, R = make_stereo(6 * HW, SR, seed=91)
        got = stream_client(*srv.address, L.astype(np.float32),
                            R.astype(np.float32))
        _check(got, _aligned_reference(L.astype(np.float32),
                                       R.astype(np.float32)))
    finally:
        srv.close()

    with pytest.raises(TypeError):
        run_stream_server(0, sr=SR, lockstp=True)
