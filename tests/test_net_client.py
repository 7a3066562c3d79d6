"""Native network client (native/upmix_net_client.cpp): raw-PCM stdin ->
one StreamServer session -> raw-PCM stdout, no Python/JAX in-process —
the embedded-host shell for the pooled serving path (the reference's
Bela runtime is a single stream of hardware blocks exactly like this,
bela/upmix.cpp:516-553).  Built on demand like the other native
binaries; its output must be bit-identical to the Python stream_client
against the same server."""

import os
import subprocess

import numpy as np
import pytest

from upmix_tpu.models.streaming import BatchStreamingUpmixer
from upmix_tpu.serve_stream import StreamServer, stream_client

from helpers import make_stereo
from test_serve_stream import HW, SR, _cfg

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
BIN = os.path.join(NATIVE_DIR, "upmix_net_client")


@pytest.fixture(scope="module")
def net_bin():
    if not os.path.exists(BIN):
        mk = subprocess.run(
            ["make", "-C", NATIVE_DIR, "net"], capture_output=True
        )
        if not os.path.exists(BIN):  # pragma: no cover
            pytest.skip(f"net client build failed: {mk.stderr.decode()[-300:]}")
    return BIN


@pytest.fixture(scope="module")
def server():
    pool = BatchStreamingUpmixer(_cfg(), HW, n_streams=4)
    with StreamServer(pool, lockstep=True) as srv:
        yield srv


def _run(net_bin, srv, raw, mix=None, extra=(), timeout=180):
    cmd = [net_bin, "--host", srv.address[0], "--port", str(srv.address[1])]
    if mix:
        cmd += ["--mix", mix]
    cmd += list(extra)
    return subprocess.run(cmd, input=raw, capture_output=True, timeout=timeout)


def _interleave(L, R):
    return np.column_stack([L, R]).astype("<f4").tobytes()


@pytest.mark.parametrize("mix,out_ch", [("stereo_sum", 2), ("lcr", 3)])
def test_net_client_matches_python_client(net_bin, server, mix, out_ch):
    # Ragged tail: the binary zero-pads the final block on the wire and
    # trims the surplus output frames, exactly like stream_client.
    n = 7 * HW + 123
    L, R = make_stereo(n, SR, seed=80)
    L, R = L.astype(np.float32), R.astype(np.float32)
    ref = stream_client(*server.address, L, R, mix=mix)

    proc = _run(net_bin, server, _interleave(L, R), mix=mix)
    assert proc.returncode == 0, proc.stderr.decode()
    got = np.frombuffer(proc.stdout, "<f4").reshape(-1, out_ch)
    assert got.shape == (n, out_ch)
    # Same server, sequential sessions, re-warmed slot: bit-identical.
    np.testing.assert_array_equal(got, np.column_stack(ref))


def test_net_client_block_multiple_input(net_bin, server):
    n = 5 * HW  # EOF exactly on a block boundary: no pad block at all
    L, R = make_stereo(n, SR, seed=81)
    L, R = L.astype(np.float32), R.astype(np.float32)
    ref = stream_client(*server.address, L, R)
    proc = _run(net_bin, server, _interleave(L, R))
    assert proc.returncode == 0, proc.stderr.decode()
    got = np.frombuffer(proc.stdout, "<f4").reshape(-1, 2)
    np.testing.assert_array_equal(got, np.column_stack(ref))


def test_net_client_empty_input(net_bin, server):
    proc = _run(net_bin, server, b"")
    assert proc.returncode == 0, proc.stderr.decode()
    assert proc.stdout == b""


def test_net_client_sr_validation(net_bin, server):
    # --sr pins the deployment's expected rate BEFORE any audio is sent.
    L, R = make_stereo(2 * HW, SR, seed=82)
    ok = _run(net_bin, server, _interleave(L, R), extra=["--sr", str(SR)])
    assert ok.returncode == 0, ok.stderr.decode()
    bad = _run(net_bin, server, _interleave(L, R),
               extra=["--sr", str(SR * 2)])
    assert bad.returncode == 1
    assert b"Hz" in bad.stderr


def test_net_client_errors(net_bin, server):
    # Unknown flag / missing port: usage error, exit 2.
    p = subprocess.run([net_bin, "--bogus"], capture_output=True, timeout=60)
    assert p.returncode == 2
    p = subprocess.run([net_bin], capture_output=True, timeout=60)
    assert p.returncode == 2
    # Unreachable server: clean connect error, exit 1.
    p = subprocess.run(
        [net_bin, "--host", "127.0.0.1", "--port", "1"],
        input=b"", capture_output=True, timeout=60,
    )
    assert p.returncode == 1
    assert b"connect" in p.stderr or b"resolve" in p.stderr
