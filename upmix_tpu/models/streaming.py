"""Streaming (block-based, real-time) multiband upmix engine.

TPU-first re-design of the reference's real-time path (bela/upmix.cpp).
The reference realizes streaming imperatively: per-band ring buffers
(upmix.cpp:77-128), mutable overlap-add accumulators (upmix.cpp:134-166),
and a readiness check that gates each band until enough input is buffered
(upmix.cpp:232-237).  Here the whole engine is a pure function

    step : (StreamState, in_block[2, hw]) -> (StreamState, out_block)

so a real-time host calls one jitted step per hardware block, an offline
caller runs `lax.scan` over all blocks in a single compiled program, and
the state pytree is trivially checkpointable (SURVEY.md §5).

Structural facts exploited (all verified in SURVEY.md §2.2/§3.2):

  - With the fixed 75% overlap, every band's readiness threshold is exactly
    ``4 * hw_block`` samples, so all bands come online together at the 4th
    hardware block.  One shared input-history buffer of the last
    ``4 * hw_block`` samples therefore serves every band: at processing
    time for block t, band pass p reads history[p*hop : p*hop + block].
  - Bands sharing a block size share their forward FFTs, and since the
    iSTFT/OLA is linear, their masked spectra are summed **in the spectral
    domain** — each bucket needs 2 forward + 3 inverse FFTs per pass batch
    regardless of band count (vs 2+3 per band per pass in the reference).
  - The not-ready branch emits silence without touching OLA state, exactly
    the reference's degraded mode (upmix.cpp:485-491).

Output modes: ``"stereo_sum"`` reproduces the Bela mix
``out = side + 0.5*center`` (upmix.cpp:295-303); ``"lcr"`` emits the three
discrete channels for parity with the offline path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from upmix_tpu.config import UpmixConfig, bucket_bands
from upmix_tpu.ops.framing import frame_signal
from upmix_tpu.ops.gains import band_gain_curve
from upmix_tpu.ops.mask import center_mask
from upmix_tpu.ops.windows import design_wola_synthesis_window, make_window

# Readiness latency at the reference's fixed 75% overlap (K = block/hop
# = 4; bela/upmix.cpp:232-237 [verified]).  Other overlaps generalize to
# K blocks — see stream_warmup_blocks.
WARMUP_BLOCKS = 4


@dataclass(frozen=True)
class _StreamBucketPlan:
    block_size: int
    hop_size: int
    passes: int  # hw_block // hop
    analysis_window: np.ndarray  # [block]
    synthesis_window: np.ndarray  # [block]
    gains: np.ndarray  # [n_bands_in_bucket, n_bins]
    direct: object = None  # (DirectPlan, lo, hi) matmul-DFT fast path, or None


def stream_warmup_blocks(config: UpmixConfig) -> int:
    """Uniform readiness latency in hardware blocks: K = block/hop.

    Every band's readiness threshold is block*passes = K*hw samples, so
    all bands come online together at the K-th block — but ONLY when K is
    the same for every band (a single overlap value; K=4 at the
    reference's fixed 75%).  Mixed K would break the shared-history
    design, so it is rejected.
    """
    ks = set()
    for b in config.bands:
        if b.block_size % b.hop_size:
            raise ValueError(
                f"streaming requires hop | block (band block {b.block_size}, "
                f"hop {b.hop_size})"
            )
        ks.add(b.block_size // b.hop_size)
    if len(ks) != 1:
        raise ValueError(
            f"streaming requires a uniform block/hop ratio across bands, got {sorted(ks)}"
        )
    return ks.pop()


def _plan_stream_buckets(config: UpmixConfig, hw_block_size: int):
    warmup = stream_warmup_blocks(config)
    plans = []
    for block_size, bands in bucket_bands(config.bands).items():
        hop = bands[0].hop_size
        if hw_block_size % hop != 0:
            raise ValueError(
                f"hw block size {hw_block_size} must be a multiple of every "
                f"band hop (violated by block {block_size}, hop {hop})"
            )
        # Reads must stay inside the K*hw shared history: the last pass
        # reads [hw - hop, hw - hop + block) (the C++ engine's cap is
        # block <= hw*4 at 75% — bela/upmix.cpp:498-506).
        if hw_block_size - hop + block_size > warmup * hw_block_size:
            raise ValueError(
                f"band block size {block_size} exceeds the shared-history "
                f"window ({warmup}x hw_block = {warmup * hw_block_size}); "
                f"build the config with UpmixConfig.streaming "
                f"(max_block_size = hw_block*4)"
            )
        aw = make_window(config.window, block_size)
        if config.synthesis == "wola":
            sw = design_wola_synthesis_window(aw, config.overlap)
        elif config.synthesis == "analysis":
            # C++ parity: synthesis window is the plain analysis window
            # (bela/upmix.cpp:200-201).
            sw = aw
        else:
            raise ValueError(f"unknown synthesis mode {config.synthesis!r}")
        gains = np.stack([band_gain_curve(b, dtype=np.float32) for b in bands])
        # Matmul-DFT fast path (accelerators): the same direct banded
        # transform as the offline kernels, windows folded into the weight
        # slices; falls back to jnp.fft when the support is too wide to
        # bake (same bound as offline) or on CPU (where XLA's FFT wins).
        direct = None
        if jax.default_backend() != "cpu":
            from upmix_tpu.ops.dftmm import make_direct_plan

            nz = np.nonzero(gains.max(axis=0))[0]
            if len(nz):
                lo, hi = int(nz[0]), int(nz[-1])
                if block_size * 2 * (hi - lo + 1) * 4 <= (8 << 20):
                    direct = (make_direct_plan(block_size, lo, hi, aw, sw), lo, hi)
        plans.append(
            _StreamBucketPlan(
                block_size=block_size,
                hop_size=hop,
                passes=hw_block_size // hop,
                analysis_window=aw,
                synthesis_window=sw,
                gains=gains,
                direct=direct,
            )
        )
    return plans


def init_stream_state(config: UpmixConfig, hw_block_size: int):
    """Fresh engine state: {history [2, 4*hw], t (blocks seen), ola{block: [3, block]}}.

    A plain dict-of-arrays pytree — works under jit/scan, serializes with
    any checkpointing library, and is the explicit analog of the
    reference's ring-buffer + accumulator mutable state
    (upmix.cpp:121-127, 164).
    """
    plans = _plan_stream_buckets(config, hw_block_size)
    warmup = stream_warmup_blocks(config)
    return {
        "history": jnp.zeros((2, warmup * hw_block_size), dtype=jnp.float32),
        "t": jnp.zeros((), dtype=jnp.int32),
        # String keys: checkpoint formats (orbax) stringify dict keys on
        # restore, so use strings from the start.
        "ola": {
            str(plan.block_size): jnp.zeros((3, plan.block_size), dtype=jnp.float32)
            for plan in plans
        },
    }


def _bucket_pass_block(plan: _StreamBucketPlan, history: jnp.ndarray, ola: jnp.ndarray):
    """Run one hardware block's worth of passes for a bucket.

    history: [2, 4*hw] (the last 4 hw blocks).  ola: [3, block].
    Returns (out [3, hw], new_ola [3, block]).
    """
    B, H, P = plan.block_size, plan.hop_size, plan.passes
    # Pass p reads history[p*H : p*H + B]; trailing length (P-1)*H + B.
    needed = (P - 1) * H + B
    frames = frame_signal(history[:, :needed], B, H, P)  # [2, P, B]
    if plan.direct is not None:
        from upmix_tpu.ops.dftmm import irdft_direct, rdft_direct

        dplan, lo, hi = plan.direct
        sre, sim = rdft_direct(frames, dplan)  # windows folded; [2, P, kept]
        g = jnp.asarray(plan.gains[:, lo : hi + 1])[None, :, None, :]
        spec = jax.lax.complex(sre[:, None] * g, sim[:, None] * g)
        spec_c, spec_ls, spec_rs = center_mask(spec[0], spec[1])
        summed = jnp.stack(
            [spec_c.sum(axis=0), spec_ls.sum(axis=0), spec_rs.sum(axis=0)]
        )  # [3, P, kept]
        rec = irdft_direct(jnp.real(summed), jnp.imag(summed), dplan)  # sw folded
    else:
        framesw = frames * jnp.asarray(plan.analysis_window)
        spec = jnp.fft.rfft(framesw)  # [2, P, n_bins]
        gains = jnp.asarray(plan.gains)[:, None, :]  # [nb, 1, n_bins]
        spec_l = spec[0][None] * gains
        spec_r = spec[1][None] * gains
        spec_c, spec_ls, spec_rs = center_mask(spec_l, spec_r)
        summed = jnp.stack(
            [spec_c.sum(axis=0), spec_ls.sum(axis=0), spec_rs.sum(axis=0)]
        )  # [3, P, n_bins]
        rec = jnp.fft.irfft(summed, n=B) * jnp.asarray(plan.synthesis_window)

    # OLA over the passes as a STATIC fold (same math as the reference's
    # sequential accumulator, upmix.cpp:145-162 / ce.py:391-407, but with
    # the P dependent scan steps replaced by a tree of shifted adds —
    # round 3: the scan's 1+2+8+32 sequential tiny steps per block were
    # the serving pool's bottleneck).  Pass p lands at offset p*H in a
    # length (P-1)*H + B buffer; the carried accumulator adds at 0; the
    # first P*H samples emit and the remainder (zero-extended by H) is
    # the new accumulator.
    L = (P - 1) * H + B
    K = B // H
    if P % K == 0 and P > 1:
        # Group trick: passes p ≡ g (mod K) are non-overlapping and
        # contiguous -> K shifted adds of flat [3, (P//K)*B] groups.
        M = P // K
        acc = None
        for g in range(K):
            flat = rec[:, g::K].reshape(3, M * B)
            part = jnp.pad(flat, ((0, 0), (g * H, L - g * H - M * B)))
            acc = part if acc is None else acc + part
    else:
        acc = None
        for p in range(P):
            part = jnp.pad(rec[:, p], ((0, 0), (p * H, L - p * H - B)))
            acc = part if acc is None else acc + part
    acc = jnp.concatenate([acc[:, :B] + ola, acc[:, B:]], axis=1)
    out = acc[:, : P * H]  # [3, hw]
    # acc tail has length L - P*H = B - H; extend by H zeros -> [3, B].
    new_ola = jnp.concatenate(
        [acc[:, P * H :], jnp.zeros((3, H), jnp.float32)], axis=1
    )
    return out, new_ola


def build_stream_step(config: UpmixConfig, hw_block_size: int):
    """Build the pure streaming step: (state, in_block[2, hw]) -> (state, out).

    out is [3, hw] (C, Ls, Rs) — mix with `mix_stereo_sum` for the Bela
    2-channel output.  Jit-compatible; scan-compatible.
    """
    plans = _plan_stream_buckets(config, hw_block_size)
    warmup = stream_warmup_blocks(config)
    hw = hw_block_size

    def step(state, x_block):
        x_block = x_block.astype(jnp.float32)
        history = jnp.concatenate([state["history"][:, hw:], x_block], axis=1)
        t = state["t"] + 1

        def go(olas):
            out = None
            new_olas = {}
            for plan in plans:
                key = str(plan.block_size)
                o, new_olas[key] = _bucket_pass_block(plan, history, olas[key])
                out = o if out is None else out + o
            return out, new_olas

        def silent(olas):
            # Not-ready bands contribute silence and leave OLA state
            # untouched (upmix.cpp:485-491).
            return jnp.zeros((3, hw), jnp.float32), olas

        out, new_olas = jax.lax.cond(t >= warmup, go, silent, state["ola"])
        return {"history": history, "t": t, "ola": new_olas}, out

    return step


def mix_stereo_sum(lcr: jnp.ndarray):
    """Bela output mix: (L, R) = (Ls + 0.5*C, Rs + 0.5*C)
    (upmix.cpp:295-303; same layout as the offline stereo_sum export,
    main.py:143-157).  lcr: [3, ...] ordered (C, Ls, Rs)."""
    c, ls, rs = lcr[0], lcr[1], lcr[2]
    return ls + 0.5 * c, rs + 0.5 * c


class StreamingUpmixer:
    """Stateful host-side wrapper around the pure streaming step.

    `push_block` is the real-time call (one jitted step per hardware
    block); `process_signal` scans all blocks inside one compiled program
    for offline use and parity testing.

    The state buffers are DONATED to each step by default (in-place
    update — measured 5.8 vs 8.2 ms/block on v5e for this pure-XLA
    step; donation only hurts the pallas-kernel pool, see
    PallasStreamPool).  Checkpoint with ``snapshot()`` BEFORE the next
    push — a raw reference to ``engine.state`` is invalidated by the
    next call.  ``donate=False`` opts out (state survives a failed
    push; buffers may be re-pushed).
    """

    def __init__(
        self, config: UpmixConfig, hw_block_size: int, donate: bool = True
    ):
        self.config = config
        self.hw_block_size = int(hw_block_size)
        self.warmup_blocks = stream_warmup_blocks(config)
        self.donate = bool(donate)
        step = build_stream_step(config, self.hw_block_size)
        self._step = (
            jax.jit(step, donate_argnums=(0,)) if donate else jax.jit(step)
        )
        self.state = init_stream_state(config, self.hw_block_size)
        self._scan_cache = {}

    def reset(self):
        self.state = init_stream_state(self.config, self.hw_block_size)

    def snapshot(self):
        """Host-side copy of the current state, safe to keep across pushes
        (with donate=True the live state buffers are invalidated by the
        next push_block — checkpoint from this, not from .state)."""
        import numpy as _np

        return jax.tree.map(_np.asarray, self.state)

    def push_block(self, in_l, in_r):
        """Feed one hardware block; returns (C, Ls, Rs) each [hw]."""
        x = jnp.stack(
            [jnp.asarray(in_l, jnp.float32), jnp.asarray(in_r, jnp.float32)]
        )
        if x.shape != (2, self.hw_block_size):
            # Reject bad blocks BEFORE dispatch: the state is still valid
            # (nothing was donated), so the stream keeps its history.
            raise ValueError(
                f"push_block expects two length-{self.hw_block_size} "
                f"channels; got stacked input shape {tuple(x.shape)}"
            )
        try:
            self.state, out = self._step(self.state, x)
        except Exception:
            if self.donate:
                # The step donated the state buffers; after a failure
                # mid-call they may be unusable, so restart the stream
                # rather than leave the engine permanently broken.
                self.reset()
            raise
        return out[0], out[1], out[2]

    def _scan_fn(self, n_blocks: int):
        fn = self._scan_cache.get(n_blocks)
        if fn is None:
            step = build_stream_step(self.config, self.hw_block_size)

            @jax.jit
            def scan_all(state, blocks):  # blocks [n_blocks, 2, hw]
                return jax.lax.scan(step, state, blocks)

            fn = scan_all
            self._scan_cache[n_blocks] = fn
        return fn

    def process_signal(self, L, R, mix: str = "lcr"):
        """Whole-signal streaming processing (truncates to whole hw blocks,
        like a real-time device — cf. oracle_stream_multiband).

        mix="lcr" returns (C, Ls, Rs); mix="stereo_sum" returns (outL, outR)
        with the Bela 2-channel mix.
        """
        hw = self.hw_block_size
        n = (len(L) // hw) * hw
        n_blocks = n // hw
        x = jnp.stack(
            [jnp.asarray(L[:n], jnp.float32), jnp.asarray(R[:n], jnp.float32)]
        )  # [2, n]
        blocks = jnp.moveaxis(x.reshape(2, n_blocks, hw), 1, 0)  # [nb, 2, hw]
        state = init_stream_state(self.config, hw)
        _, outs = self._scan_fn(n_blocks)(state, blocks)  # [nb, 3, hw]
        lcr = jnp.moveaxis(outs, 0, 1).reshape(3, n)
        if mix == "stereo_sum":
            return mix_stereo_sum(lcr)
        if mix == "lcr":
            return lcr[0], lcr[1], lcr[2]
        raise ValueError(f"unknown mix {mix!r}; one of ('lcr', 'stereo_sum')")


def _check_stream_indices(indices, n_streams: int):
    """Validated int list — out-of-range indices would silently scatter
    to the wrong live session."""
    indices = [int(i) for i in indices]
    bad = [i for i in indices if not 0 <= i < n_streams]
    if bad:
        raise ValueError(
            f"stream indices {bad} out of range [0, {n_streams})"
        )
    return indices


def _extract_stream_rows(pool, indices, snap=None):
    """Shared body of the pools' extract_streams (leaves get leading dim
    len(indices)) — the unit load_streams accepts."""
    import numpy as _np

    idx = _np.asarray(_check_stream_indices(indices, pool.n_streams))
    src = pool.snapshot() if snap is None else snap
    return jax.tree.map(lambda a: _np.asarray(a)[idx], src)


def _scatter_stream_rows(pool, indices, rows):
    """Shared body of the pools' load_streams: inject per-stream state
    rows (from extract_streams — e.g. a checkpointed session resuming
    into a live pool) without touching other streams' state.  The
    inverse of reset_streams' zeroing."""
    idx = jnp.asarray(
        _check_stream_indices(indices, pool.n_streams), jnp.int32
    )
    return jax.tree.map(
        lambda a, r: a.at[idx].set(jnp.asarray(r, a.dtype)),
        pool.state,
        rows,
    )


class PallasStreamPool:
    """Serving pool on the pallas pool kernel (ops/pallas_pool.py): one
    launch per hardware block serves every stream, G streams per grid
    step with row-stacked layouts.

    Same public surface as BatchStreamingUpmixer (push_blocks /
    reset_streams / snapshot) but its OWN state layout (channel-major
    histories, per-bucket LCR accumulators, per-stream block counters).
    Requires every bucket to be direct-DFT eligible — construction
    raises ValueError otherwise (use BatchStreamingUpmixer).

    Two history layouts (bit-identical outputs; ``restore()`` accepts a
    snapshot from either):

    - ``layout="quarters"`` (default): the history lives as warmup-1
      [S, hw] quarter buffers and the INPUT block becomes the newest
      quarter — no per-block shift copy (the rotation is passthrough
      copies, or pure buffer rebinding with ``donate=True``).  Measured
      +17% serving capacity at B=2048 on v5e (16.9k vs 14.4k
      streams/chip, scripts/bench_pool_quarters.py).  Caveat: inside a
      caller's ``lax.scan`` the rotation rides the carry back-edge
      where XLA inserts copies — for scan-driven batch use, unroll a
      few steps per scan iteration or pick ``"window"``.
    - ``layout="window"``: one [S, warmup*hw] buffer per channel,
      shifted in XLA each block (the round-2/3 layout).

    Two OLA dataflows (``ola=``):

    - ``"time"`` (default): per-bucket [S, B] C/Ls/Rs accumulators,
      shifted-pad fold in the kernel (the proven round-3 form).
    - ``"spectral"``: carry the last Kr-1 frames' MASKED SPECTRA
      (packed [S, 3*(Kr-1)*kp], a few KB/stream) and emit each output
      hop as one dot of the stacked spectra window against a
      column-rearrangement of the baked inverse weight — same MAC
      count, but no [3PG, B] rec materialization, no fold, no [S, B]
      carries (the largest VPU-materialization items, DESIGN.md §6).
      Output matches "time" to float tolerance (different summation
      order), NOT bit-exactly; snapshots do not restore across OLA
      modes.

    Pass a `mesh` with a 'data' axis to shard the pool across chips:
    the kernel runs per device on its stream shard via shard_map —
    streams are independent, so no collectives are inserted and
    capacity scales linearly (n_streams/device must stay a multiple of
    the group size).  Validated on the virtual multi-device mesh
    (tests/test_streaming.py); single-chip numbers are in BASELINE.md.
    """

    def __init__(
        self,
        config: UpmixConfig,
        hw_block_size: int,
        n_streams: int,
        group: int = 16,
        interpret: bool | None = None,
        mesh=None,
        layout: str = "quarters",
        ola: str = "time",
        donate: bool = False,
        _shape_only: bool = False,
    ):
        # donate: donate the state (and, for quarters, the input blocks)
        # to the jitted step.  Measured SLOWER for THIS engine on the
        # per-block dispatch path (v5e, clean interleaved A/B:
        # S=2048 7.07 vs 5.86 ms/block, S=256 2.72 vs 2.10 — donation
        # costs 0.6-1.2 ms/block, +20-29% capacity without it), unlike
        # the pure-XLA engines where donation WINS (StreamingUpmixer
        # 5.8 vs 8.2) — consistent with jit-level donation forcing
        # defensive copies when aliasing pallas_call outputs.  Default
        # False; donate=True halves peak state memory for huge pools
        # but forbids re-pushing a buffer and voids state on failure.
        # _shape_only (internal, aot.py): build the plan WITHOUT baking
        # the DFT weight matrices and leave _step unset — the caller
        # installs the exported program, which embeds its own weights.
        from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr

        self.config = config
        self.hw_block_size = hw = int(hw_block_size)
        self.n_streams = int(n_streams)
        self.group = int(group)
        self.mesh = mesh
        self.warmup_blocks = stream_warmup_blocks(config)
        if layout not in ("window", "quarters"):
            raise ValueError(
                f"unknown history layout {layout!r}; one of "
                "('window', 'quarters')"
            )
        if ola not in ("time", "spectral"):
            raise ValueError(
                f"unknown ola mode {ola!r}; one of ('time', 'spectral')"
            )
        self.layout = layout
        self.ola = ola
        self._shardings = None
        n_local = self.n_streams
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if "data" not in mesh.shape:
                raise ValueError(
                    "the pallas pool shards streams over a 'data' mesh "
                    f"axis; mesh has axes {tuple(mesh.shape)}"
                )
            d = mesh.shape["data"]
            if self.n_streams % d:
                raise ValueError(
                    f"n_streams {self.n_streams} must divide evenly across "
                    f"the mesh 'data' axis ({d})"
                )
            n_local = self.n_streams // d

            def shard_like(a):
                spec = PartitionSpec("data", *([None] * (a.ndim - 1)))
                return NamedSharding(mesh, spec)

            self._shardings = shard_like
        # The kernel plan is PER-SHARD: each device runs the grid over
        # its own n_local streams.
        plan = make_pool_plan(
            config, hw, n_local, group=group, ola=ola,
            with_weights=not _shape_only,
        )
        if plan is None:
            raise ValueError(
                "config not eligible for the pallas pool kernel (a bucket's "
                "direct-DFT weights are too wide, or n_streams per device "
                "is not a multiple of the group size"
                + (
                    "; for ola='spectral' also: a bucket with no overlap "
                    "(hop == block), no legal hops-per-dot Q, or a window-"
                    "dot weight over the bake bound"
                    if ola == "spectral"
                    else ""
                )
                + "); use BatchStreamingUpmixer"
            )
        self.plan = plan
        self._interpret = (
            jax.default_backend() == "cpu" if interpret is None else interpret
        )
        self.donate = bool(donate)
        if _shape_only:
            # Installed by the caller (aot.load): a single-hop artifact
            # sets _step; a multi-hop artifact seeds _multi_steps[hops]
            # instead (its exported program IS the temporal-batch step).
            self._step = None
            self._raw_step = None
            self._multi_steps = {}
            self.state = self._fresh_state()
            return

        def step(state, xl, xr):  # xl/xr [S, hw]
            if layout == "quarters":
                # History lives as warmup-1 quarter buffers [S, hw]
                # (oldest -> newest); the NEW input block IS the newest
                # quarter — no shift copy (the window layout's per-block
                # [S, window] concat measured 0.43 ms/block at S=2048,
                # 6.6% of serving capacity — DESIGN.md §6).  With
                # donate=True the rotation is pure buffer rebinding
                # (xl/xr arrive as whole donated buffers so the newest-
                # quarter state outputs alias them); without donation it
                # is passthrough copies, which still measure CHEAPER per
                # dispatched block than donation's bookkeeping (see the
                # `donate` parameter note).
                histL = (*state["histL"], xl)
                histR = (*state["histR"], xr)
            else:
                histL = jnp.concatenate([state["histL"][:, hw:], xl], axis=1)
                histR = jnp.concatenate([state["histR"][:, hw:], xr], axis=1)
            t = state["t"] + 1
            if ola == "spectral":
                olas = tuple(state["ola"][str(b.B)] for b in plan.buckets)
            else:
                olas = tuple(
                    tuple(state["ola"][str(b.B)][o] for o in range(3))
                    for b in plan.buckets
                )
            # Warmup gating happens IN the kernel (per stream): not-ready
            # streams emit silence and hold their OLA carries.
            (oc, ols, ors), new_olas = pool_step_lcr(
                histL, histR, t, olas, plan, interpret=self._interpret
            )
            ola_state = {
                str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)
            }
            if layout == "quarters":
                new_hist = {"histL": histL[1:], "histR": histR[1:]}
            else:
                new_hist = {"histL": histL, "histR": histR}
            return (
                {**new_hist, "t": t, "ola": ola_state},
                (oc, ols, ors),
            )

        if mesh is not None:
            from jax.sharding import PartitionSpec

            try:  # JAX >= 0.4.35 exposes shard_map at top level
                from jax import shard_map as _shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map as _shard_map

            # check_vma=False: the varying-mesh-axes check cannot see
            # through pallas_call out_shapes (ShapeDtypeStruct has no
            # vma); streams are independent so there is nothing to vary.
            step = _shard_map(
                step,
                mesh=mesh,
                in_specs=(
                    PartitionSpec("data"),
                    PartitionSpec("data"),
                    PartitionSpec("data"),
                ),
                out_specs=(PartitionSpec("data"), PartitionSpec("data")),
                check_vma=False,
            )
        # In the quarters layout, the input blocks themselves become the
        # newest history quarter — when donating, donate them too so the
        # state outputs alias their buffers.
        self._raw_step = step  # un-jitted: make_sustained_runner scans it
        if donate:
            dn = (0, 1, 2) if layout == "quarters" else (0,)
            self._step = jax.jit(step, donate_argnums=dn)
        else:
            self._step = jax.jit(step)
        self._multi_steps = {}  # hops -> (raw, jitted) temporal-batch steps
        self.state = self._fresh_state()

    def _get_multi_step(self, hops: int):
        """(raw, jitted) step processing ``hops`` consecutive hardware
        blocks per stream in ONE kernel launch (temporal batching): the
        OLA carries chain across hops inside the kernel and the history
        quarters are read once per call instead of once per block.
        Signature: step(state, xl, xr) with xl/xr [S, hops*hw] ->
        (state, (C, Ls, Rs) each [S, hops*hw]).  Quarters layout only;
        trades per-block latency (one dispatch spans ``hops`` block
        deadlines) for throughput — the sustained/batch path's knob."""
        from upmix_tpu.ops.pallas_pool import pool_step_lcr

        hops = int(hops)
        if hops < 1:
            raise ValueError(f"hops must be >= 1, got {hops}")
        if hops in self._multi_steps:
            return self._multi_steps[hops]
        if self.layout != "quarters":
            raise ValueError(
                "multi-hop steps need layout='quarters' (the window "
                "layout would re-shift the history per hop)"
            )
        if self._raw_step is None:
            # _raw_step (not _step) is the shape-only sentinel: a
            # single-hop artifact HAS a _step (the exported program) but
            # its plan still carries no kernel weights to build NEW
            # multi-hop steps from.
            raise ValueError(
                "multi-hop steps are unavailable on an AOT-loaded pool "
                "(its plan carries no kernel weights); export the "
                "multi-hop program (save_stream_pool(hops=...)) or build "
                "a live pool"
            )
        plan = self.plan
        hw = self.hw_block_size
        nq = plan.window // hw
        ola, interpret = self.ola, self._interpret

        def step(state, xl, xr):  # xl/xr [S, hops*hw]
            xls = [xl[:, i * hw : (i + 1) * hw] for i in range(hops)]
            xrs = [xr[:, i * hw : (i + 1) * hw] for i in range(hops)]
            histL = (*state["histL"], *xls)
            histR = (*state["histR"], *xrs)
            t = state["t"] + 1  # t of the FIRST hop
            if ola == "spectral":
                olas = tuple(state["ola"][str(b.B)] for b in plan.buckets)
            else:
                olas = tuple(
                    tuple(state["ola"][str(b.B)][o] for o in range(3))
                    for b in plan.buckets
                )
            (oc, ols, ors), new_olas = pool_step_lcr(
                histL, histR, t, olas, plan, interpret=interpret, hops=hops
            )
            ola_state = {
                str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)
            }
            return (
                {
                    "histL": histL[-(nq - 1):],
                    "histR": histR[-(nq - 1):],
                    "t": state["t"] + hops,
                    "ola": ola_state,
                },
                (oc, ols, ors),
            )

        if self.mesh is not None:
            from jax.sharding import PartitionSpec

            try:
                from jax import shard_map as _shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map as _shard_map

            step = _shard_map(
                step,
                mesh=self.mesh,
                in_specs=(
                    PartitionSpec("data"),
                    PartitionSpec("data"),
                    PartitionSpec("data"),
                ),
                out_specs=(PartitionSpec("data"), PartitionSpec("data")),
                check_vma=False,
            )
        jitted = (
            jax.jit(step, donate_argnums=(0, 1, 2))
            if self.donate
            else jax.jit(step)
        )
        self._multi_steps[hops] = (step, jitted)
        return self._multi_steps[hops]

    def push_blocks_multi(self, in_l, in_r):
        """``hops`` consecutive hardware blocks for EVERY stream in one
        dispatch: [n_streams, hops*hw] x2 -> (C, Ls, Rs) each
        [n_streams, hops*hw].  ``hops`` is inferred from the input
        width.  See _get_multi_step for the latency/throughput trade."""
        xl = jnp.asarray(in_l, jnp.float32)
        xr = jnp.asarray(in_r, jnp.float32)
        hw = self.hw_block_size
        S = self.n_streams
        if (
            xl.shape != xr.shape
            or xl.ndim != 2
            or xl.shape[0] != S
            or xl.shape[1] % hw
            or xl.shape[1] == 0
        ):
            raise ValueError(
                f"push_blocks_multi expects two [{S}, k*{hw}] channel "
                f"arrays; got {tuple(xl.shape)} / {tuple(xr.shape)}"
            )
        hops = xl.shape[1] // hw
        if hops == 1:
            return self.push_blocks(xl, xr)
        _, jitted = self._get_multi_step(hops)
        if self._shardings is not None:
            xl = jax.device_put(xl, self._shardings(xl))
            xr = jax.device_put(xr, self._shardings(xr))
        try:
            self.state, out = jitted(self.state, xl, xr)
        except Exception:
            if self.donate:
                self.reset()
            raise
        return out

    def make_sustained_runner(
        self, n_blocks: int, unroll: int = 8, hops: int = 1
    ):
        """One-dispatch sustained capacity runner (the chip-side
        protocol behind the BASELINE.md pool rows).

        Returns ``(run, fresh)``: ``run(state, blocks)`` with ``blocks``
        a device-resident ``[n_blocks // hops, 2, n_streams, hops*hw]``
        float32 array (at the default ``hops=1``:
        ``[n_blocks, 2, n_streams, hw]``) chains ``n_blocks`` block
        steps inside ONE compiled program and returns
        ``(final_state, cs)`` where ``cs`` holds one C output slab per
        scan iteration (kept as a scan output so the emit path cannot
        be dead-code-eliminated; fetch one scalar of ``cs[-1]`` to
        bound the whole chain).  Timing `run` measures chip-side
        sustained cost with NO per-block host or transport overhead —
        on a remote tunnel this is the only way to see chip capacity
        (per-block ``push_blocks`` dispatch pays the RTT every block;
        see upmix_tpu.tune protocol notes).

        ``unroll`` steps run per scan iteration: the quarters layout's
        history rotation rides the scan carry back-edge where XLA
        inserts copies (measured 6.71 ms/block at unroll 1 vs 2.23 at
        unroll 8, B=4096 — scripts/bench_pool_quarters.py), so the
        rotation must be unrolled to measure the real capacity.
        ``unroll`` is clamped to a divisor of the step count.

        ``hops=T`` runs T consecutive blocks per KERNEL launch
        (temporal batching, quarters layout only — see
        _get_multi_step); ``n_blocks`` must be a multiple of T.
        """
        n_blocks = int(n_blocks)
        hops = int(hops)
        if hops > 1:
            if n_blocks % hops:
                raise ValueError(
                    f"n_blocks ({n_blocks}) must be a multiple of hops "
                    f"({hops})"
                )
            step, _ = self._get_multi_step(hops)
        else:
            step = self._raw_step
        if step is None:
            raise ValueError(
                "the sustained runner scans the raw (un-jitted) step, "
                "which an AOT-loaded pool does not carry; build a live "
                "pool to measure sustained capacity"
            )
        n_steps = n_blocks // hops
        unroll = max(1, min(int(unroll), n_steps))
        while n_steps % unroll:
            unroll -= 1

        def multi(state, xs):  # xs [unroll, 2, S, hops*hw]
            out = None
            for u in range(unroll):
                state, out = step(state, xs[u, 0], xs[u, 1])
            return state, out[0]

        @jax.jit
        def run(state, blocks):
            g = blocks.reshape(
                n_steps // unroll, unroll, *blocks.shape[1:]
            )
            return jax.lax.scan(multi, state, g)

        return run, self._fresh_state

    def _fresh_state(self):
        S, W = self.n_streams, self.plan.window
        hw = self.hw_block_size
        if self.layout == "quarters":
            nq = W // hw
            hist = {
                "histL": tuple(
                    jnp.zeros((S, hw), jnp.float32) for _ in range(nq - 1)
                ),
                "histR": tuple(
                    jnp.zeros((S, hw), jnp.float32) for _ in range(nq - 1)
                ),
            }
        else:
            hist = {
                "histL": jnp.zeros((S, W), jnp.float32),
                "histR": jnp.zeros((S, W), jnp.float32),
            }
        if self.ola == "spectral":
            carries = {
                str(b.B): jnp.zeros((S, b.spec_width), jnp.float32)
                for b in self.plan.buckets
            }
        else:
            carries = {
                str(b.B): tuple(
                    jnp.zeros((S, b.B), jnp.float32) for _ in range(3)
                )
                for b in self.plan.buckets
            }
        state = {
            **hist,
            "t": jnp.zeros((S,), jnp.int32),
            "ola": carries,
        }
        if self._shardings is not None:
            state = jax.tree.map(
                lambda a: jax.device_put(a, self._shardings(a)), state
            )
        return state

    def reset(self):
        self.state = self._fresh_state()

    def reset_streams(self, indices):
        idx = jnp.asarray(
            _check_stream_indices(indices, self.n_streams), jnp.int32
        )
        self.state = jax.tree.map(
            lambda a: a.at[idx].set(jnp.zeros_like(a[0])), self.state
        )

    def snapshot(self):
        import numpy as _np

        return jax.tree.map(_np.asarray, self.state)

    def extract_streams(self, indices, snap=None):
        """Per-stream rows of a snapshot (see _extract_stream_rows).
        Reads from `snap` (a snapshot()) or the live state."""
        return _extract_stream_rows(self, indices, snap)

    def load_streams(self, indices, rows):
        """Inject per-stream state rows (see _scatter_stream_rows)."""
        self.state = _scatter_stream_rows(self, indices, rows)

    def restore(self, snap):
        """Load a snapshot() from EITHER history layout.

        The window layout stores [S, window] per channel whose oldest hw
        samples are dead state (dropped unread by the next shift); the
        quarters layout stores the live window//hw - 1 previous blocks.
        Both carry the same live information, so restoring across
        layouts is exact.

        Leaves and containers are canonicalized (tuples, f32/int32) by
        SHAPE, not Python type: a snapshot that round-tripped through
        JSON/msgpack arrives with lists where the state pytree has
        tuples and nested lists where it has arrays.  The live jit
        would merely retrace on such a tree, but an AOT Exported.call
        rejects it (exact pytree structure match).
        """
        import numpy as _np

        hw = self.hw_block_size
        nq = self.plan.window // hw
        snap = dict(snap)
        # OLA carries: a time-OLA bucket carry is a triple of [S, B]
        # accumulators -> 3D [3, S, B] after asarray; a spectral carry
        # is one packed [S, spec_width] -> 2D.  (Type-based detection
        # breaks on JSON round trips: nested lists look like tuples.)
        carries = {
            k: _np.asarray(v, _np.float32) for k, v in snap["ola"].items()
        }
        ndims = {a.ndim for a in carries.values()}
        if ndims == {3} and all(a.shape[0] == 3 for a in carries.values()):
            snap_spectral = False
        elif ndims == {2}:
            snap_spectral = True
        else:
            raise ValueError(
                "unrecognized OLA carry structure in snapshot: shapes "
                f"{ {k: a.shape for k, a in carries.items()} }"
            )
        if snap_spectral != (self.ola == "spectral"):
            # The spectral carry (last Kr-1 frames' masked spectra) is
            # not derivable from time-domain OLA accumulators (nor vice
            # versa) — the history window is too short to recompute the
            # older frames.  Snapshots only restore into pools of the
            # same OLA mode.
            raise ValueError(
                "snapshot OLA format "
                f"({'spectral' if snap_spectral else 'time'}) does not "
                f"match this pool's ola={self.ola!r}"
            )
        for key in ("histL", "histR"):
            # Quarters-format history is nq-1 [S, hw] buffers -> 3D;
            # window-format is one [S, window] buffer -> 2D.
            h = _np.asarray(snap[key], _np.float32)
            if h.ndim == 3:  # quarters-format snapshot
                if h.shape[0] != nq - 1 or h.shape[2] != hw:
                    raise ValueError(
                        f"snapshot {key} has shape {h.shape}; this pool's "
                        f"geometry needs {nq - 1} quarter buffers of "
                        f"[{self.n_streams}, {hw}]"
                    )
                if self.layout == "window":
                    S = h.shape[1]
                    h = jnp.concatenate(
                        [jnp.zeros((S, hw), jnp.float32)]
                        + [jnp.asarray(q) for q in h],
                        axis=1,
                    )
                else:
                    h = tuple(jnp.asarray(q) for q in h)
            elif h.ndim == 2:  # window-format snapshot
                if self.layout == "quarters":
                    h = tuple(
                        jnp.asarray(h[:, q * hw : (q + 1) * hw])
                        for q in range(1, nq)
                    )
                else:
                    h = jnp.asarray(h)
            else:
                raise ValueError(
                    f"unrecognized {key} history structure in snapshot "
                    f"(shape {h.shape})"
                )
            snap[key] = h
        if snap_spectral:
            snap["ola"] = {k: jnp.asarray(a) for k, a in carries.items()}
        else:
            snap["ola"] = {
                k: tuple(jnp.asarray(a[i]) for i in range(3))
                for k, a in carries.items()
            }
        snap["t"] = jnp.asarray(snap["t"], jnp.int32)
        state = jax.tree.map(jnp.asarray, snap)
        if self._shardings is not None:
            state = jax.tree.map(
                lambda a: jax.device_put(a, self._shardings(a)), state
            )
        self.state = state

    def push_blocks(self, in_l, in_r):
        """One hardware block for EVERY stream: [n_streams, hw] x2 ->
        (C, Ls, Rs) each [n_streams, hw]."""
        xl = jnp.asarray(in_l, jnp.float32)
        xr = jnp.asarray(in_r, jnp.float32)
        want = (self.n_streams, self.hw_block_size)
        if xl.shape != want or xr.shape != want:
            raise ValueError(
                f"push_blocks expects two [{self.n_streams}, "
                f"{self.hw_block_size}] channel arrays; got "
                f"{tuple(xl.shape)} / {tuple(xr.shape)}"
            )
        if self._step is None:
            hops = sorted(self._multi_steps)
            raise ValueError(
                "this AOT-loaded pool carries no single-hop program "
                f"(artifact exported with hops={hops[0] if hops else '?'}); "
                "feed push_blocks_multi with [n_streams, hops*hw] inputs"
            )
        if self._shardings is not None:
            xl = jax.device_put(xl, self._shardings(xl))
            xr = jax.device_put(xr, self._shardings(xr))
        try:
            self.state, out = self._step(self.state, xl, xr)
        except Exception:
            if self.donate:
                # The step donated the state buffers; after a failure
                # mid-call they may be invalid — only a reset is safe.
                self.reset()
            raise
        return out


def make_stream_pool(
    config: UpmixConfig,
    hw_block_size: int,
    n_streams: int,
    engine: str = "auto",
    mesh=None,
    group: int = 16,
    layout: str = "quarters",
    ola: str = "time",
    donate: bool = False,
):
    """Build the best serving pool for this config and device.

    ``engine="auto"`` picks the pallas pool kernel (PallasStreamPool)
    when the config is direct-DFT eligible, the backend is an
    accelerator, and no mesh is requested — measured ~6x the XLA pool's
    capacity on v5e (13.3k vs 2k realtime streams/chip at the 48 kHz /
    2048 Bela config).  Otherwise (CPU backend, mesh sharding, or an
    ineligible config) it returns the vmapped XLA engine
    (BatchStreamingUpmixer).  ``engine="pallas"`` / ``"xla"`` force the
    choice; forcing pallas raises when ineligible.  ``engine="pallas"``
    WITH a mesh shards the pallas pool over the mesh's 'data' axis via
    shard_map (explicit opt-in: validated on the virtual mesh, not yet
    on multi-chip hardware — 'auto' stays on the hardware-proven
    choices).

    ``donate`` applies to the pallas pool only (its measured-best
    default is False); the XLA engine keeps its own measured-best
    default (donate=True — see each class's note).
    """
    if engine not in ("auto", "pallas", "xla"):
        raise ValueError(
            f"unknown engine {engine!r}; one of ('auto', 'pallas', 'xla')"
        )
    if engine == "pallas":
        return PallasStreamPool(
            config, hw_block_size, n_streams, group=group, mesh=mesh,
            layout=layout, ola=ola, donate=donate,
        )
    if engine == "auto" and mesh is None and jax.default_backend() != "cpu":
        from upmix_tpu.ops.pallas_pool import make_pool_plan

        # Try the requested OLA mode first; a config that is spectral-
        # ineligible (no legal Q, wq over the bake bound) but time-pool
        # eligible still gets the ~6x pallas capacity rather than
        # silently dropping to the XLA engine.
        for try_ola in dict.fromkeys((ola, "time")):
            if (
                make_pool_plan(
                    config, int(hw_block_size), int(n_streams), group=group,
                    ola=try_ola,
                )
                is not None
            ):
                return PallasStreamPool(
                    config, hw_block_size, n_streams, group=group,
                    layout=layout, ola=try_ola, donate=donate,
                )
    return BatchStreamingUpmixer(config, hw_block_size, n_streams, mesh=mesh)


class BatchStreamingUpmixer:
    """Many concurrent live streams on one device: the pure stream step
    vmapped over a leading stream axis, so ONE dispatch per hardware
    block serves every session (the multi-stream serving counterpart of
    the single-stream engine; the reference serves exactly one stream,
    bela/upmix.cpp:519).

    All streams share one config and block size (that is what makes the
    batch a single compiled program).  Sessions can start/stop at any
    time: `reset_streams([i, ...])` zeroes those slots (each then replays
    the engine's normal warmup), so a fixed-size pool of slots serves a
    churning population of streams.

    Pass a `mesh` with a 'data' axis to shard the stream pool across
    chips — streams are independent, so the scale-out is communication-
    free (each chip serves n_streams/mesh.shape['data'] sessions; XLA
    inserts no collectives).  n_streams must divide evenly.

    State is donated per step by default, like StreamingUpmixer (the
    vmapped step is pure XLA, where donation measured FASTER — unlike
    the pallas pool) — `snapshot()` before the next push to checkpoint;
    ``donate=False`` opts out.
    """

    def __init__(
        self,
        config: UpmixConfig,
        hw_block_size: int,
        n_streams: int,
        mesh=None,
        donate: bool = True,
    ):
        if n_streams < 1:
            raise ValueError(f"n_streams must be >= 1, got {n_streams}")
        self.config = config
        self.hw_block_size = int(hw_block_size)
        self.n_streams = int(n_streams)
        self.mesh = mesh
        self.warmup_blocks = stream_warmup_blocks(config)
        step = build_stream_step(config, self.hw_block_size)
        self._shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            d = mesh.shape.get("data", 1)
            if self.n_streams % d:
                raise ValueError(
                    f"n_streams {self.n_streams} must divide evenly across "
                    f"the mesh 'data' axis ({d})"
                )
            # Every pytree leaf (state arrays and the in/out blocks) has
            # the stream axis leading; shard exactly that axis.
            def shard_like(a):
                spec = PartitionSpec("data", *([None] * (a.ndim - 1)))
                return NamedSharding(mesh, spec)

            self._shardings = shard_like
        # donate=True default: for this pure-XLA vmapped step donation
        # measured FASTER per dispatched block on v5e (8.05 vs 8.32 ms
        # at S=128) — the pallas pool is the engine where it hurts.
        self.donate = bool(donate)
        vstep = jax.vmap(step)
        self._raw_step = vstep  # un-jitted: make_sustained_runner scans it
        self._step = (
            jax.jit(vstep, donate_argnums=(0,)) if donate else jax.jit(vstep)
        )
        self.state = self._fresh_state()

    def make_sustained_runner(self, n_blocks: int, unroll: int = 1):
        """One-dispatch sustained capacity runner — same contract as
        PallasStreamPool.make_sustained_runner (blocks
        ``[n_blocks, 2, n_streams, hw]``; returns ``(run, fresh)``).
        This engine's state is flat arrays (no quarter rotation), so a
        plain 1-step scan already measures true capacity; ``unroll`` is
        accepted for protocol symmetry."""
        n_blocks = int(n_blocks)
        unroll = max(1, min(int(unroll), n_blocks))
        while n_blocks % unroll:
            unroll -= 1
        step = self._raw_step

        def multi(state, xs):  # xs [unroll, 2, S, hw]
            out = None
            for u in range(unroll):
                state, out = step(state, jnp.swapaxes(xs[u], 0, 1))
            return state, out[:, 0]

        @jax.jit
        def run(state, blocks):
            g = blocks.reshape(
                n_blocks // unroll, unroll, *blocks.shape[1:]
            )
            return jax.lax.scan(multi, state, g)

        return run, self._fresh_state

    def _fresh_state(self):
        one = init_stream_state(self.config, self.hw_block_size)
        # All-zero init: broadcasting the fresh single-stream state is
        # exact (it is zeros plus a zero counter).
        state = jax.tree.map(
            lambda a: jnp.zeros((self.n_streams,) + a.shape, a.dtype), one
        )
        if self._shardings is not None:
            state = jax.tree.map(
                lambda a: jax.device_put(a, self._shardings(a)), state
            )
        return state

    def reset(self):
        self.state = self._fresh_state()

    def reset_streams(self, indices):
        """Zero the given stream slots (ended sessions; slots re-warm)."""
        idx = jnp.asarray(
            _check_stream_indices(indices, self.n_streams), jnp.int32
        )
        self.state = jax.tree.map(
            lambda a: a.at[idx].set(jnp.zeros_like(a[0])), self.state
        )

    def snapshot(self):
        """Host-side copy safe to keep across pushes (required when the
        pool was built with donate=True)."""
        import numpy as _np

        return jax.tree.map(_np.asarray, self.state)

    def restore(self, snap):
        """Load a snapshot() (host or device arrays) as the live state."""
        state = jax.tree.map(jnp.asarray, snap)
        if self._shardings is not None:
            state = jax.tree.map(
                lambda a: jax.device_put(a, self._shardings(a)), state
            )
        self.state = state

    def extract_streams(self, indices, snap=None):
        """Per-stream rows of a snapshot (see _extract_stream_rows)."""
        return _extract_stream_rows(self, indices, snap)

    def load_streams(self, indices, rows):
        """Inject per-stream state rows (see _scatter_stream_rows)."""
        self.state = _scatter_stream_rows(self, indices, rows)

    def push_blocks(self, in_l, in_r):
        """One hardware block for EVERY stream: in_l/in_r [n_streams, hw]
        -> (C, Ls, Rs), each [n_streams, hw]."""
        x = jnp.stack(
            [jnp.asarray(in_l, jnp.float32), jnp.asarray(in_r, jnp.float32)],
            axis=1,
        )  # [n_streams, 2, hw]
        if x.shape != (self.n_streams, 2, self.hw_block_size):
            raise ValueError(
                f"push_blocks expects two [{self.n_streams}, "
                f"{self.hw_block_size}] channel arrays; got stacked shape "
                f"{tuple(x.shape)}"
            )
        if self._shardings is not None:
            x = jax.device_put(x, self._shardings(x))
        try:
            self.state, out = self._step(self.state, x)
        except Exception:
            if self.donate:
                self.reset()
            raise
        return out[:, 0], out[:, 1], out[:, 2]
