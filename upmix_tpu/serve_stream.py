"""Multi-client live-stream server on the serving pool.

The serving triangle's third surface (DESIGN.md §6): `run_jobs` serves
offline files, `run_pipe` serves ONE live stream on stdin/stdout, and
this module serves MANY concurrent live streams over a socket — each
client connection claims one slot of a `make_stream_pool` pool, and one
pool dispatch per hardware block processes every live session together
(the deployment surface for the pallas pool's measured multi-thousand
stream capacity; reference analog: bela/upmix.cpp:537-547 serves
exactly one stream on the audio callback).

Wire protocol (little-endian, fixed-size frames after the handshake):

  client hello:  b"UPMX" | u32 version (1) | u32 mix (0=stereo_sum, 1=lcr)
  server reply:  b"UPMR" | u32 status (0 ok, 1 pool full, 2 bad hello)
                 | u32 slot | u32 hw_block | u32 out_channels
  then, repeatedly:
    client -> server: hw_block * 2 float32 (interleaved stereo)
    server -> client: hw_block * out_channels float32 (interleaved)

Clients half-close (shutdown(SHUT_WR)) at end of stream; the server
drains the engine with zero blocks and closes when the output has
caught up with the input.  Output is warmup-ALIGNED per connection
(run_pipe's align=True semantics): the slot's leading warmup silence is
dropped and the tail is drained, so output frame i corresponds to input
frame i and every client gets back exactly as many frames as it sent.
Short final blocks must be zero-padded to hw_block by the client (and
trimmed client-side); `stream_client` below does both.

Tick modes:
  lockstep=True  (default) — a pool block is dispatched once EVERY
    active slot has one input block queued (idle slots contribute
    zeros).  Deterministic; the mode for file-fed clients and tests.
  lockstep=False — dispatch every hw/sr seconds of wall clock; slots
    whose block has not arrived get zeros (the degraded late-callback
    semantics of a real-time audio host).  Missing input is zeros, not
    a stall: one slow client cannot hold back the pool.
"""

from __future__ import annotations

import queue
import socket
import struct
import threading

import numpy as np

MAGIC_HELLO = b"UPMX"
MAGIC_REPLY = b"UPMR"
VERSION = 1
MIX_MODES = ("stereo_sum", "lcr")

_ST_FREE, _ST_ACTIVE, _ST_DRAINING = 0, 1, 2


def _read_exact(sock, n):
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            break
        buf.extend(chunk)
    return bytes(buf)


class _Slot:
    __slots__ = (
        "state", "mix", "inq", "outq", "in_frames", "out_frames",
        "skip", "gen",
    )

    def __init__(self):
        self.state = _ST_FREE
        self.mix = 0
        self.inq = None
        self.outq = None
        self.in_frames = 0
        self.out_frames = 0
        self.skip = 0
        self.gen = 0  # bumped per allocation; stale threads detect reuse


class StreamServer:
    """Serve a pool of live upmix sessions over TCP.

    `pool` is any make_stream_pool engine (XLA or pallas, optionally
    mesh-sharded); the server owns its state (do not push blocks into
    it from outside while serving).
    """

    def __init__(
        self,
        pool,
        host: str = "127.0.0.1",
        port: int = 0,
        lockstep: bool = True,
        sr: float | None = None,
        max_buffered_blocks: int = 32,
    ):
        self.pool = pool
        self.hw = int(pool.hw_block_size)
        self.n_slots = int(pool.n_streams)
        self.lockstep = bool(lockstep)
        if not lockstep and not sr:
            raise ValueError("realtime mode needs sr for the tick period")
        self.tick_period = (self.hw / float(sr)) if sr else None
        self.max_buffered_blocks = int(max_buffered_blocks)
        self._slots = [_Slot() for _ in range(self.n_slots)]
        self._lock = threading.Lock()
        # Serializes every touch of the pool's state: the dispatcher's
        # push_blocks vs. connection threads' slot re-warm
        # (reset_streams) — an interleaved read-modify-write would drop
        # one side's state update (and with a donate=True pool could
        # consume a donated buffer mid-step).
        self._pool_lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._threads = []
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, int(port)))
        self._sock.listen()
        self.address = self._sock.getsockname()
        self.stats = {"accepted": 0, "rejected": 0, "blocks": 0, "frames": 0}

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        for fn in (self._accept_loop, self._dispatch_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def close(self):
        self._stop.set()
        self._wake.set()
        try:
            self._sock.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=5.0)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # -- connection handling ----------------------------------------------

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return  # socket closed
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _alloc_slot(self, mix):
        with self._lock:
            for i, s in enumerate(self._slots):
                if s.state == _ST_FREE:
                    s.state = _ST_ACTIVE
                    s.mix = mix
                    # Bounded: a file-fed client cannot buffer its whole
                    # signal server-side — the reader blocks and TCP
                    # backpressure stalls the client instead.
                    s.inq = queue.Queue(maxsize=self.max_buffered_blocks)
                    s.outq = queue.Queue()
                    s.in_frames = s.out_frames = 0
                    s.skip = (self.pool.warmup_blocks - 1) * self.hw
                    s.gen += 1
                    return i, s
        return None, None

    def _release_slot(self, s):
        with self._lock:
            s.state = _ST_FREE
            s.inq = s.outq = None
        self._wake.set()

    def _serve_conn(self, conn):
        slot = None
        writer = None
        try:
            hello = _read_exact(conn, 12)
            ok = (
                len(hello) == 12
                and hello[:4] == MAGIC_HELLO
                and struct.unpack("<I", hello[4:8])[0] == VERSION
                and struct.unpack("<I", hello[8:12])[0] < len(MIX_MODES)
            )
            if not ok:
                conn.sendall(MAGIC_REPLY + struct.pack("<IIII", 2, 0, 0, 0))
                return
            mix = struct.unpack("<I", hello[8:12])[0]
            idx, slot = self._alloc_slot(mix)
            if slot is None:
                conn.sendall(MAGIC_REPLY + struct.pack("<IIII", 1, 0, 0, 0))
                self.stats["rejected"] += 1
                return
            # The slot re-warms in place: its engine rows restart from
            # silence without touching the other live sessions.
            with self._pool_lock:
                self.pool.reset_streams([idx])
            out_ch = 3 if MIX_MODES[mix] == "lcr" else 2
            conn.sendall(
                MAGIC_REPLY + struct.pack("<IIII", 0, idx, self.hw, out_ch)
            )
            self.stats["accepted"] += 1

            writer = threading.Thread(
                target=self._writer_loop, args=(conn, slot.outq),
                daemon=True,
            )
            writer.start()
            block_bytes = self.hw * 2 * 4
            while True:
                raw = _read_exact(conn, block_bytes)
                if len(raw) < block_bytes:
                    break  # EOF (half-close) or dead connection
                x = np.frombuffer(raw, dtype="<f4").reshape(self.hw, 2)
                with self._lock:
                    slot.in_frames += self.hw
                # The put is OUTSIDE the server lock: the queue is
                # bounded, and a blocking put while holding the lock
                # would deadlock against the dispatcher (which needs
                # the lock to consume).  Blocking here is the
                # backpressure path — TCP stops reading, the client's
                # send stalls, nothing buffers without bound.
                slot.inq.put(x)
                self._wake.set()
        except (OSError, ValueError):
            pass  # client gone mid-stream; drain below frees the slot
        finally:
            # EVERY exit path (clean EOF, RST abort, failed sendall)
            # must move an allocated slot to DRAINING, or the slot
            # leaks and a lockstep dispatcher stalls the whole pool
            # waiting for its next block.
            if slot is not None:
                with self._lock:
                    if slot.state == _ST_ACTIVE:
                        slot.state = _ST_DRAINING
                self._wake.set()
                if writer is not None:
                    writer.join()
            try:
                conn.close()
            except OSError:
                pass

    def _writer_loop(self, conn, outq):
        # The queue object is captured here, not re-read from the slot:
        # the dispatcher nulls slot.outq when it frees the slot.
        while True:
            item = outq.get()
            if item is None:
                try:
                    conn.shutdown(socket.SHUT_WR)
                except OSError:
                    pass
                return
            try:
                conn.sendall(item)
            except OSError:
                # Client vanished mid-stream: stop writing; the reader
                # side sees EOF and the slot drains out and frees.
                return

    # -- the pool dispatcher ----------------------------------------------

    def _ready(self):
        """Lockstep tick rule: every ACTIVE slot has a block queued and
        at least one slot needs processing."""
        any_live = False
        for s in self._slots:
            if s.state == _ST_ACTIVE:
                any_live = True
                if s.inq.qsize() == 0:
                    return False
            elif s.state == _ST_DRAINING:
                any_live = True
        return any_live

    def _dispatch_loop(self):
        import time as _time

        hw = self.hw
        zeros = np.zeros(hw, np.float32)
        next_tick = None
        while not self._stop.is_set():
            if self.lockstep:
                with self._lock:
                    ready = self._ready()
                if not ready:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
            else:
                # Deadline-based tick: the period is measured deadline to
                # deadline, so dispatch time does not stretch the block
                # rate (sleep-then-work would run period + work_time per
                # block and fall behind real time without bound).
                now = _time.monotonic()
                if next_tick is None:
                    next_tick = now + self.tick_period
                elif next_tick > now:
                    self._stop.wait(next_tick - now)
                    next_tick += self.tick_period
                else:  # fell behind (e.g. a compile): don't burst-spin
                    next_tick = now + self.tick_period
                with self._lock:
                    idle = not any(s.state != _ST_FREE for s in self._slots)
                if idle:
                    next_tick = None  # re-anchor the clock on next client
                    self._wake.wait(timeout=self.tick_period)
                    self._wake.clear()
                    continue
            in_l = [zeros] * self.n_slots
            in_r = [zeros] * self.n_slots
            live = []
            with self._lock:
                for i, s in enumerate(self._slots):
                    if s.state == _ST_FREE:
                        continue
                    live.append((i, s, s.gen))
                    if s.state == _ST_ACTIVE or not s.inq.empty():
                        try:
                            x = s.inq.get_nowait()
                        except queue.Empty:
                            continue  # late client: zeros this tick
                        in_l[i] = np.ascontiguousarray(x[:, 0])
                        in_r[i] = np.ascontiguousarray(x[:, 1])
            with self._pool_lock:
                c, ls, rs = self.pool.push_blocks(
                    np.stack(in_l), np.stack(in_r)
                )
            c, ls, rs = np.asarray(c), np.asarray(ls), np.asarray(rs)
            self.stats["blocks"] += 1
            # Mix once, vectorized over the whole pool; the per-slot loop
            # below only slices and frames (matters on a busy host: the
            # dispatcher is one thread serving every session).
            half_c = 0.5 * c
            mix_l, mix_r = ls + half_c, rs + half_c
            for i, s, gen in live:
                with self._lock:
                    if s.gen != gen or s.state == _ST_FREE:
                        continue
                    if MIX_MODES[s.mix] == "lcr":
                        out = np.column_stack([c[i], ls[i], rs[i]])
                    else:
                        out = np.column_stack([mix_l[i], mix_r[i]])
                    if s.skip:
                        k = min(s.skip, len(out))
                        out = out[k:]
                        s.skip -= k
                    room = s.in_frames - s.out_frames
                    out = out[: max(0, room)]
                    if len(out):
                        s.out_frames += len(out)
                        self.stats["frames"] += len(out)
                        s.outq.put(
                            np.ascontiguousarray(out).astype("<f4").tobytes()
                        )
                    done = (
                        s.state == _ST_DRAINING
                        and s.inq.empty()
                        and s.out_frames >= s.in_frames
                    )
                if done:
                    s.outq.put(None)
                    self._release_slot(s)


def stream_client(host, port, in_l, in_r, mix="stereo_sum", timeout=60.0):
    """Reference client: stream a whole stereo signal through a
    StreamServer and return the processed channels, trimmed to the
    input length.  Sends and receives concurrently (the server replies
    block-for-block), zero-padding the final short block.
    """
    if mix not in MIX_MODES:
        raise ValueError(f"mix must be one of {MIX_MODES}, got {mix!r}")
    in_l = np.asarray(in_l, np.float32)
    in_r = np.asarray(in_r, np.float32)
    n = len(in_l)
    sock = socket.create_connection((host, port), timeout=timeout)
    try:
        sock.sendall(
            MAGIC_HELLO + struct.pack("<II", VERSION, MIX_MODES.index(mix))
        )
        reply = _read_exact(sock, 20)
        if len(reply) < 20 or reply[:4] != MAGIC_REPLY:
            raise ConnectionError("bad server reply")
        status, _slot, hw, out_ch = struct.unpack("<IIII", reply[4:20])
        if status == 1:
            raise ConnectionError("server pool is full")
        if status != 0:
            raise ConnectionError(f"server rejected hello (status {status})")

        pad = (-n) % hw
        xl = np.concatenate([in_l, np.zeros(pad, np.float32)])
        xr = np.concatenate([in_r, np.zeros(pad, np.float32)])
        frames = np.column_stack([xl, xr]).astype("<f4")
        total = len(xl)

        def send():
            try:
                for i in range(0, total, hw):
                    sock.sendall(frames[i : i + hw].tobytes())
                sock.shutdown(socket.SHUT_WR)
            except OSError:
                pass

        tx = threading.Thread(target=send, daemon=True)
        tx.start()
        out = bytearray()
        want = total * out_ch * 4
        while len(out) < want:
            chunk = sock.recv(min(1 << 16, want - len(out)))
            if not chunk:
                break
            out.extend(chunk)
        tx.join()
        got = np.frombuffer(bytes(out), dtype="<f4").reshape(-1, out_ch)
        if len(got) < total:
            raise ConnectionError(
                f"short stream: got {len(got)} of {total} frames"
            )
        return tuple(np.ascontiguousarray(got[:n, ch]) for ch in range(out_ch))
    finally:
        sock.close()


def run_stream_server(
    port: int,
    sr: float,
    n_streams: int = 16,
    hw_block_size: int = 2048,
    band_edges=(0, 500, 2000, 8000),
    host: str = "127.0.0.1",
    lockstep: bool = False,
    window: str = "blackman_harris",
    xover_mode: str = "raised_cosine",
    threshold_factor: float = 32.0,
    synthesis: str = "analysis",
    bin_rounding: str = "cpp",
    verbose: bool = True,
    engine: str = "auto",
    ola: str = "time",
    layout: str = "quarters",
    group: int = 16,
) -> "StreamServer":
    """CLI entry: build the pool (auto engine) and serve until ^C.

    Defaults mirror run_pipe's streaming config (the reference Bela
    setup, bela/upmix.cpp:525-528).  lockstep defaults to False here:
    a network server ticks on the wall clock like an audio callback.
    engine/ola/layout/group configure make_stream_pool (explicit
    keywords, not a **kwargs pass-through, so a misspelled server
    kwarg raises here instead of deep in pool construction).
    """
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models import make_stream_pool

    config = UpmixConfig.streaming(
        list(band_edges),
        sr=float(sr),
        hw_block_size=int(hw_block_size),
        window=window,
        xover_mode=xover_mode,
        threshold_factor=threshold_factor,
        synthesis=synthesis,
        bin_rounding=bin_rounding,
    )
    pool = make_stream_pool(
        config, int(hw_block_size), int(n_streams),
        engine=engine, ola=ola, layout=layout, group=group,
    )
    server = StreamServer(
        pool, host=host, port=port, lockstep=lockstep, sr=float(sr)
    )
    server.start()
    if verbose:
        print(
            f"upmix-tpu stream server on {server.address[0]}:"
            f"{server.address[1]} — {n_streams} slots, hw {hw_block_size}, "
            f"engine {type(pool).__name__}",
            flush=True,
        )
    return server
