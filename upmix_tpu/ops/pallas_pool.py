"""Pallas serving-pool kernel: one launch per hardware block for ALL streams.

The XLA serving pool (models/streaming.py::BatchStreamingUpmixer) costs
~450-500 µs of per-step scan machinery plus big-bucket marginals at
~5-7% MFU (DESIGN.md §6 probe — scripts/bench_pool_probe.py); both are
XLA-structural.  This kernel processes G streams per grid step with
every tensor ROW-stacked across streams (channel- and output-major
refs, so no single-row slicing anywhere — f32 sublane alignment holds
whenever G is a multiple of 8):

  per bucket (all buckets must be direct-DFT eligible):
    Z   = [2*P*G, B]   rows (channel, pass, stream) from P wide slices
    s2  = bf16x3 dot against the [B, 2K] direct weight pair
    mask on [P*G, K], band-summed
    rec = bf16x3 dot against [2K, B]   -> [3*P*G, B]
    fold: static shifted adds per pass -> out [G, hw], ola carry [G, B]

State layout (NATIVE to this engine — not the XLA engine's pytree):
  histL/histR [S, 4*hw] (channel-major), per-bucket olaC/olaLs/olaRs
  [S, B].  The engine wrapper owns warmup gating and history shifting
  (cheap XLA ops); the kernel is stateless per call.

Reference analog: bela/upmix.cpp:474-493 (per-block multiband process),
one kernel launch serving every concurrent session.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upmix_tpu.config import UpmixConfig, bucket_bands
from upmix_tpu.ops.dftmm import make_direct_plan
from upmix_tpu.ops.gains import band_gain_curve
from upmix_tpu.ops.pallas_upmix import _dot_f32 as _dot3
from upmix_tpu.ops.pallas_upmix import _mask_sum, _split_bf16
from upmix_tpu.ops.windows import design_wola_synthesis_window, make_window

# Profiling fabrications (wrong output, layout-safe): flip before the
# first trace of a pool program to attribute kernel cost per op class
# (scripts/bench_pool_ops.py).  Fabrications are built from slices and
# concats of existing WIDE tensors only, with a scalar dependency on the
# skipped stage's input so nothing upstream is dead-code-eliminated
# (CLAUDE.md Mosaic landmines: fresh tiny-lane layouts SIGABRT).
_PROF_NODOT = False  # replace both bf16x3 dots with slice/concat fabrications
_PROF_NOFOLD = False  # replace the static OLA fold with a pad+add fabrication
_PROF_NOMASK = False  # skip the mask entirely (S = 3 copies of the L spectrum)
_PROF_NOW = False  # drop the weight operands from the pallas_call (implies
# fabricated dots and no mask — gains are a weight array)
_PROF_NOOLA = False  # drop the OLA-carry operands and outputs entirely


@dataclass(frozen=True)
class _PoolBucket:
    B: int
    H: int
    P: int  # passes per hw block
    wf_hi: np.ndarray  # [B, 2K] bf16
    wf_lo: np.ndarray
    wi_hi: np.ndarray  # [2K, B] bf16 (time-OLA inverse; None in spectral mode)
    wi_lo: np.ndarray
    gains: np.ndarray  # [nb, K] f32
    # Spectral-OLA fields (ola="spectral" plans only, else None/0):
    Kr: int = 0  # frames overlapping one hop = B // H
    kp: int = 0  # 2K padded up to a 128-lane multiple
    Q: int = 0  # hops emitted per inverse dot (Q*H >= 128, Q | P)
    wq_hi: np.ndarray | None = None  # [(Q+Kr-1)*kp, Q*H] bf16 window-dot pair
    wq_lo: np.ndarray | None = None

    @property
    def arrays(self):
        if self.wq_hi is not None:
            return (self.wf_hi, self.wf_lo, self.wq_hi, self.wq_lo, self.gains)
        return (self.wf_hi, self.wf_lo, self.wi_hi, self.wi_lo, self.gains)

    @property
    def spec_width(self):
        """Spectral-carry lanes per stream: 3 outputs x (Kr-1) frame
        slots x kp padded spectrum lanes."""
        return 3 * (self.Kr - 1) * self.kp


@dataclass(frozen=True)
class PoolPlan:
    hw: int
    window: int  # shared history length = warmup * hw
    n_streams: int
    group: int  # streams per grid step
    buckets: tuple
    ola: str = "time"  # "time": [S, B] LCR accumulators; "spectral":
    # carry the last Kr-1 frames' masked spectra instead (DESIGN.md §6)

    def arrays(self):
        out = []
        for b in self.buckets:
            out.extend(b.arrays)
        return out


def make_pool_plan(
    config: UpmixConfig,
    hw_block_size: int,
    n_streams: int,
    group: int = 16,
    weight_limit: int = 8 << 20,
    ola: str = "time",
    with_weights: bool = True,
):
    """Build the pool-kernel plan, or return None when a bucket is not
    direct-DFT eligible (the caller falls back to the XLA engine).

    ola="spectral" builds the spectral-carry variant: the per-bucket
    state is the last Kr-1 frames' masked spectra instead of [S, B]
    time-domain OLA accumulators, and each output hop is ONE dot of the
    stacked frame-spectra window against a column-rearrangement of the
    baked inverse weight — same MAC count, but the [3PG, B] `rec`
    materialization and the shifted-pad fold disappear (they were the
    two largest VPU-materialization items in the pool floor
    decomposition, DESIGN.md §6).

    with_weights=False skips baking the DFT weight matrices (up to
    ~8 MB each) and their bf16 splits: the returned plan carries every
    SHAPE (window, B, H, P, Kr, kp, Q, spec_width, eligibility) but its
    weight fields are None — for callers that only need state geometry,
    e.g. loading an AOT artifact whose exported program already embeds
    the weights (aot.py)."""
    from upmix_tpu.models.streaming import stream_warmup_blocks

    if ola not in ("time", "spectral"):
        raise ValueError(f"unknown ola mode {ola!r}")
    warmup = stream_warmup_blocks(config)
    hw = int(hw_block_size)
    group = max(8, min(group, n_streams))
    if n_streams % group:
        return None
    buckets = []
    for block_size, bands in bucket_bands(config.bands).items():
        hop = bands[0].hop_size
        if hw % hop or block_size % hop:
            return None
        gains = np.stack([band_gain_curve(b, dtype=np.float32) for b in bands])
        nz = np.nonzero(gains.max(axis=0))[0]
        if not len(nz):
            continue  # dead bucket contributes nothing
        lo, hi = int(nz[0]), int(nz[-1])
        if block_size * 2 * (hi - lo + 1) * 4 > weight_limit:
            return None  # support too wide to bake — XLA engine instead
        if with_weights:
            aw = make_window(config.window, block_size)
            if config.synthesis == "wola":
                sw = design_wola_synthesis_window(aw, config.overlap)
            else:
                sw = aw
            dplan = make_direct_plan(block_size, lo, hi, aw, sw)
            wf_hi, wf_lo = _split_bf16(dplan.w_fwd)
        else:
            dplan = None
            wf_hi = wf_lo = None
        spectral = {}
        if ola == "spectral":
            spectral = _spectral_bucket_fields(
                dplan, block_size, hop, hw, weight_limit,
                n_bins=hi - lo + 1,
            )
            if spectral is None:
                return None  # no legal Q / weights too wide — XLA engine
            wi_hi = wi_lo = None
        elif with_weights:
            wi_hi, wi_lo = _split_bf16(dplan.w_inv)
        else:
            wi_hi = wi_lo = None
        buckets.append(
            _PoolBucket(
                B=block_size, H=hop, P=hw // hop,
                wf_hi=wf_hi, wf_lo=wf_lo, wi_hi=wi_hi, wi_lo=wi_lo,
                gains=np.asarray(gains[:, lo : hi + 1], np.float32),
                **spectral,
            )
        )
    if not buckets:
        return None
    return PoolPlan(
        hw=hw, window=warmup * hw, n_streams=int(n_streams), group=group,
        buckets=tuple(buckets), ola=ola,
    )


def _spectral_bucket_fields(
    dplan, B: int, H: int, hw: int, weight_limit: int, n_bins: int | None = None
):
    """Window-dot weight for spectral-OLA: the frame-spectra window for
    hops [dQ, dQ+Q) spans slots dQ..dQ+Q+Kr-2 of the (carry ++ new)
    spectra lanes, slot i holding frame i-(Kr-1)'s padded [kp] spectrum.
    Output col c = r*H + tau (hop p = dQ + r) takes frame f = dQ-(Kr-1)+j
    at within-frame offset (r + Kr-1 - j)*H + tau, valid iff
    r <= j <= r+Kr-1 — so Wq[j*kp+k, r*H+tau] = w_inv[k, (r+Kr-1-j)*H+tau]
    on that band and 0 elsewhere.  A dense dot against Wq wastes only the
    kp/2K lane padding at Q=1 (the usual case: every bucket with
    H >= 128)."""
    P = hw // H
    Kr = B // H
    if Kr < 2:
        return None  # no overlap — the time fold is already trivial
    twoK = 2 * n_bins if dplan is None else dplan.w_inv.shape[0]
    kp = -(-twoK // 128) * 128
    Q = 1
    while Q <= P and (Q * H) % 128:
        Q += 1
    if Q > P or P % Q:
        return None
    nrow = Q + Kr - 1
    if nrow * kp * Q * H * 2 > weight_limit:  # baked as bf16 halves
        return None
    if dplan is None:  # shape-only plan: all geometry, no weight bake
        return {"Kr": Kr, "kp": kp, "Q": Q, "wq_hi": None, "wq_lo": None}
    wi = np.asarray(dplan.w_inv, np.float32)  # [2K, B]
    wq = np.zeros((nrow * kp, Q * H), np.float32)
    for j in range(nrow):
        for r in range(Q):
            s = r + Kr - 1 - j
            if 0 <= s < Kr:
                wq[j * kp : j * kp + twoK, r * H : (r + 1) * H] = wi[
                    :, s * H : (s + 1) * H
                ]
    wq_hi, wq_lo = _split_bf16(wq)
    return {"Kr": Kr, "kp": kp, "Q": Q, "wq_hi": wq_hi, "wq_lo": wq_lo}


def _read_span(qrefs, start: int, stop: int, hw: int):
    """Value [G, stop-start) of the logical history window held as
    per-quarter refs (each [G, hw], oldest -> newest): static per-quarter
    slices concatenated along the lane axis."""
    segs = []
    pos = start
    while pos < stop:
        q, a = divmod(pos, hw)
        b = min(hw, stop - q * hw)
        seg = qrefs[q][:, a:b] if (a, b) != (0, hw) else qrefs[q][...]
        segs.append(seg)
        pos = q * hw + b
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)


def _spectral_bucket(b, hw, G, nq, histL, histR, wref, carry_val, ready,
                     accs):
    """Spectral-OLA bucket body: sequential framing -> forward dot ->
    mask -> frame spectra stacked on LANES (slot i = frame i-(Kr-1),
    carry first) -> one window dot per Q hops against the rearranged
    inverse weight -> lane-concat of hop outputs.  No [3PG, B] rec, no
    shifted-pad fold, no [G, B] time-domain carries — the two largest
    VPU-materialization items of the time-OLA kernel (DESIGN.md §6).

    The carry arrives and returns as a VALUE (not a ref) so the
    multi-hop kernel can chain hops without round-tripping the carry
    through the output ref between hops."""
    B, H, P, Kr, kp, Q = b.B, b.H, b.P, b.Kr, b.kp, b.Q
    K = b.gains.shape[1]
    wf_hi, wf_lo, wq_hi, wq_lo, g_ref = wref
    # Sequential framing: frame p starts at p*H; rows come out (s, p),
    # so the masked spectra reshape straight onto lanes in frame order
    # (grouped framing would need a lane interleave here instead).
    needed = (P - 1) * H + B
    if H % 128 or hw % 128:
        # Sub-128-lane hops: the P frame slices below get LANE-CONCATED,
        # and Mosaic rejects concats whose inputs' lane offsets mismatch
        # — slice frames from ONE aligned pre-materialized base value
        # instead (both history layouts; the window layout's base is a
        # single offset-0 ref slice).
        unit = hw if hw % 128 else 128
        if nq is None:
            blen = min(histL.shape[1], -(-needed // unit) * unit)
            srcs = (histL[:, :blen], histR[:, :blen])
        else:
            blen = min(nq * hw, -(-needed // unit) * unit)
            srcs = (
                _read_span(histL, 0, blen, hw),
                _read_span(histR, 0, blen, hw),
            )
    else:
        srcs = None
    zs = []
    for ci, ch_ref in enumerate((histL, histR)):
        pieces = []
        for p in range(P):
            if srcs is not None:
                piece = srcs[ci][:, p * H : p * H + B]
            elif nq is None:
                piece = ch_ref[:, p * H : p * H + B]
            else:
                piece = _read_span(ch_ref, p * H, p * H + B, hw)
            pieces.append(piece)
        flat = pieces[0] if P == 1 else jnp.concatenate(pieces, axis=1)
        zs.append(flat.reshape(G * P, B))
    Z = jnp.concatenate(zs, axis=0)  # [2PG, B] rows (ch, s, p)
    F = P * G
    s2 = _dot3(Z, wf_hi[...], wf_lo[...])  # [2PG, 2K]
    sl, sr = s2[:F], s2[F:]
    gains_list = [g_ref[i, :] for i in range(b.gains.shape[0])]
    parts = _mask_sum(sl[:, :K], sl[:, K:], sr[:, :K], sr[:, K:], gains_list)
    # parts = (c_re, c_im, l_re, l_im, r_re, r_im), each [PG, K] rows (s, p)
    cw = (Kr - 1) * kp  # carry lanes per output channel
    S_os = []
    for o in range(3):
        spec = jnp.concatenate([parts[2 * o], parts[2 * o + 1]], axis=1)
        if kp > 2 * K:
            spec = jnp.pad(spec, ((0, 0), (0, kp - 2 * K)))
        lanes = spec.reshape(G, P * kp)  # frame p at lane block p
        c_o = carry_val[:, o * cw : (o + 1) * cw]
        S_os.append(jnp.concatenate([c_o, lanes], axis=1))  # [G, (Kr-1+P)*kp]
    S_all = jnp.concatenate(S_os, axis=0)  # [3G, .] rows (o, s)
    outs = []
    for d in range(P // Q):
        win = S_all[:, d * Q * kp : (d * Q + Q + Kr - 1) * kp]
        outs.append(_dot3(win, wq_hi[...], wq_lo[...]))  # [3G, Q*H]
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    for o in range(3):  # y [3G, hw] rows (o, s)
        part = y[o * G : (o + 1) * G]
        accs[o] = part if accs[o] is None else accs[o] + part
    newc = jnp.concatenate([S_os[o][:, P * kp :] for o in range(3)], axis=1)
    return jnp.where(ready, newc, carry_val)


def _build_pool_kernel(plan: PoolPlan, nq: int | None = None, hops: int = 1):
    """Pool kernel body.  nq=None: one [G, window] history ref per
    channel (the wrapper shifts the window in XLA each block).  nq=k:
    the history arrives as k [G, hw] QUARTER refs per channel in logical
    order oldest->newest, the newest being the current input block — no
    per-block shift copy anywhere (CLAUDE.md round-4 candidate #2).

    hops=T (quarters layout only): T consecutive hardware blocks run
    inside THIS kernel invocation — the history arrives as nq-1+T
    quarter refs per channel (hop i reads quarters [i, i+nq)), the OLA
    carries chain across hops as VALUES (one HBM read before hop 0, one
    write after hop T-1), and the outputs are [G, T*hw].  Temporal
    batching: per block, history operand reads drop from nq quarters to
    (nq-1+T)/T and carry traffic drops by T; per-hop compute is
    unchanged.  Trades per-block serving latency (one dispatch covers
    T deadlines) for throughput — the sustained/batch path's knob."""
    hw, G = plan.hw, plan.group
    buckets = plan.buckets
    counts = [len(b.arrays) for b in buckets]
    spectral = plan.ola == "spectral"
    n_carry = 1 if spectral else 3  # refs per bucket: one packed
    # spectral-carry lane block vs three [G, B] LCR accumulators
    hops = int(hops)
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    if hops > 1 and nq is None:
        raise ValueError("multi-hop pool kernel requires the quarters layout")
    nh = None if nq is None else nq - 1 + hops  # quarter refs per channel

    warmup = plan.window // hw
    # Snapshot the profiling flags at build time (trace-consistent).
    now, noola = _PROF_NOW, _PROF_NOOLA
    nodot, nofold = _PROF_NODOT or now, _PROF_NOFOLD
    nomask = _PROF_NOMASK or now
    if spectral and (now or noola or nodot or nofold or nomask):
        raise ValueError("profiling fabrications only support ola='time'")
    if hops > 1 and (now or noola or nodot or nofold or nomask):
        raise ValueError("profiling fabrications only support hops=1")

    def kernel(*refs):
        if nq is None:
            histL_all, histR_all = refs[0], refs[1]  # [G, window]
            pos = 2
        else:
            histL_all = refs[:nh]  # nh x [G, hw], oldest -> newest
            histR_all = refs[nh : 2 * nh]
            pos = 2 * nh
        t_ref = refs[pos]  # [G, 1] int32 — blocks seen AFTER the FIRST hop
        pos += 1
        wrefs = []
        for c in counts:
            if now:
                wrefs.append(None)
            else:
                wrefs.append(refs[pos : pos + c])
                pos += c
        ola_in = []
        for _ in buckets:
            if noola:
                ola_in.append(None)
            else:
                ola_in.append(refs[pos : pos + n_carry])
                pos += n_carry
        outC, outLs, outRs = refs[pos], refs[pos + 1], refs[pos + 2]
        ola_out = []
        pos += 3
        for _ in buckets:
            if noola:
                ola_out.append(None)
            else:
                ola_out.append(refs[pos : pos + n_carry])
                pos += n_carry

        # OLA carries live as VALUES across hops: one ref read here, one
        # ref write after the last hop.
        carry_vals = [
            None if noola else [r[...] for r in ola_in[bi]]
            for bi in range(len(buckets))
        ]
        hop_emits = []  # per hop: [3] x [G, hw], warmup-gated

        for hop in range(hops):
            if nq is None:
                histL, histR = histL_all, histR_all
            else:
                histL = histL_all[hop : hop + nq]
                histR = histR_all[hop : hop + nq]
            # Warmup gating IN the kernel (per stream): not-ready streams
            # emit silence and hold their OLA state (the reference's
            # degraded mode, bela/upmix.cpp:485-491).  Doing the select
            # here on VMEM tiles saves the XLA-side where over every
            # [S, B] carry (~6% of step time at S=2048).
            ready = t_ref[...] + hop >= warmup  # [G, 1]

            accs = [None, None, None]
            for bi, b in enumerate(buckets):
                B, H, P = b.B, b.H, b.P
                K = b.gains.shape[1]
                if spectral:
                    carry_vals[bi][0] = _spectral_bucket(
                        b, hw, G, nq, histL, histR, wrefs[bi],
                        carry_vals[bi][0], ready, accs,
                    )
                    continue
                if now:
                    wf_hi = wf_lo = wi_hi = wi_lo = g_ref = None
                else:
                    wf_hi, wf_lo, wi_hi, wi_lo, g_ref = wrefs[bi]
                # Grouped framing (the omnibus kernel's trick,
                # pallas_upmix.py _kernel): frames p ≡ j (mod Kr) start at
                # j*H + m*B, so group j is ONE contiguous [G, M*B] slice,
                # reshaped to [G*M, B] rows (stream, m).  The reshape
                # materializes an offset-0 layout, making the axis-0
                # concat legal even when H < 128 lanes (Mosaic rejects
                # concats of slices whose lane offsets mismatch on the
                # non-concat dim).  When P does not fill whole groups
                # (B > hw), fall back to one group per pass — those have
                # H >= 128 in practice, so the slices are lane-aligned.
                Kr = B // H
                if P % Kr == 0:
                    NG, M = Kr, P // Kr
                else:
                    NG, M = P, 1
                if nq is not None:
                    # Quarter-held history: group slices may span quarter
                    # boundaries -> lane-axis concat of per-quarter
                    # slices.  When the slice offsets (j*H) are not
                    # 128-lane-aligned (e.g. the H=64 bucket), Mosaic's
                    # concat rules are the risk (CLAUDE.md) —
                    # pre-materialize ONE aligned base value covering the
                    # bucket's span and slice groups from it instead (the
                    # base concat's inputs are whole/aligned quarter
                    # slices).
                    needed = (NG - 1) * H + M * B
                    if H % 128 == 0 and hw % 128 == 0:
                        srcL = srcR = None
                    else:
                        unit = hw if hw % 128 else 128
                        blen = min(plan.window, -(-needed // unit) * unit)
                        srcL = _read_span(histL, 0, blen, hw)
                        srcR = _read_span(histR, 0, blen, hw)
                zs = []
                for ci, ch_ref in enumerate((histL, histR)):
                    for j in range(NG):
                        if nq is None:
                            flat = ch_ref[:, j * H : j * H + M * B]
                        elif srcL is not None:
                            src = srcL if ci == 0 else srcR
                            flat = src[:, j * H : j * H + M * B]
                        else:
                            flat = _read_span(ch_ref, j * H, j * H + M * B, hw)
                        zs.append(flat.reshape(G * M, B))
                Z = jnp.concatenate(zs, axis=0)  # [2*P*G, B] (ch, j, s, m)
                F = P * G
                if nodot:  # fabrication: wide slice/pad of Z, no MXU
                    if 2 * K <= B:
                        s2 = Z[:, : 2 * K]
                    else:
                        s2 = jnp.pad(Z, ((0, 0), (0, 2 * K - B)))
                else:
                    s2 = _dot3(Z, wf_hi[...], wf_lo[...])  # [2PG, 2K]
                if nomask:  # fabrication: 3 output spectra = L, R, L rows
                    S = jnp.concatenate([s2, s2[:F]], axis=0)  # [3PG, 2K]
                else:
                    sl, sr = s2[:F], s2[F:]
                    gains_list = [
                        g_ref[i, :] for i in range(b.gains.shape[0])
                    ]
                    c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
                        sl[:, :K], sl[:, K:], sr[:, :K], sr[:, K:],
                        gains_list,
                    )
                    S = jnp.concatenate(
                        [
                            jnp.concatenate([c_re, c_im], axis=1),
                            jnp.concatenate([l_re, l_im], axis=1),
                            jnp.concatenate([r_re, r_im], axis=1),
                        ],
                        axis=0,
                    )  # [3PG, 2K]
                if nodot:  # fabrication: reuse Z rows, scalar dep on S
                    rec = jnp.concatenate([Z, Z[:F]], axis=0) + S[0, 0]
                else:
                    rec = _dot3(S, wi_hi[...], wi_lo[...])  # [3PG, B]
                L = (P - 1) * H + B
                GM = G * M
                for o in range(3):
                    rec_o = rec[o * F : (o + 1) * F]  # [PG, B] (j, s, m)
                    if nofold:  # fabrication: pad+add, no shifted fold
                        w = min(hw, B)
                        emit = rec_o[:G, :w]
                        if w < hw:
                            emit = jnp.pad(emit, ((0, 0), (0, hw - w)))
                        accs[o] = emit if accs[o] is None else accs[o] + emit
                        if not noola:
                            carry_vals[bi][o] = jnp.where(
                                ready,
                                rec_o[:G] + carry_vals[bi][o],
                                carry_vals[bi][o],
                            )
                        continue
                    acc = None
                    for j in range(NG):
                        # Group j's M frames are contiguous per stream:
                        # rows (s, m) flatten back to [G, M*B] at j*H.
                        flat = rec_o[j * GM : (j + 1) * GM].reshape(
                            G, M * B
                        )
                        part = jnp.pad(
                            flat, ((0, 0), (j * H, L - j * H - M * B))
                        )
                        acc = part if acc is None else acc + part
                    carry = 0.0 if noola else carry_vals[bi][o]
                    if L > B:
                        full = jnp.concatenate(
                            [acc[:, :B] + carry, acc[:, B:]], axis=1
                        )  # [G, L]
                    else:  # P == 1: L == B and acc[:, B:] would be a
                        # zero-width slice, which Mosaic rejects
                        # ("positive constant sizes").
                        full = acc + carry
                    emit = full[:, : P * H]  # [G, hw]
                    accs[o] = emit if accs[o] is None else accs[o] + emit
                    if not noola:
                        tail = jnp.concatenate(
                            [full[:, P * H :], jnp.zeros((G, H), jnp.float32)],
                            axis=1,
                        )
                        carry_vals[bi][o] = jnp.where(
                            ready, tail, carry_vals[bi][o]
                        )
            zero = jnp.zeros((G, hw), jnp.float32)
            hop_emits.append(
                [jnp.where(ready, accs[o], zero) for o in range(3)]
            )

        for o, out_ref in enumerate((outC, outLs, outRs)):
            if hops == 1:
                out_ref[...] = hop_emits[0][o]
            else:
                out_ref[...] = jnp.concatenate(
                    [hop_emits[hop][o] for hop in range(hops)], axis=1
                )
        if not noola:
            for bi in range(len(buckets)):
                for ci in range(n_carry):
                    ola_out[bi][ci][...] = carry_vals[bi][ci]

    return kernel


def pool_step_lcr(
    histL, histR, t, olas, plan: PoolPlan, interpret: bool = False,
    hops: int = 1,
):
    """One hardware block for every stream — or ``hops`` consecutive
    blocks in ONE kernel launch (temporal batching).

    histL/histR: either [S, window] float32 — the UPDATED shared history
    whose last hw samples are the current input block — or a
    tuple/list of window//hw - 1 + hops QUARTER arrays [S, hw] in
    logical order oldest->newest (the newest ``hops`` being the input
    blocks; the quarters layout needs no per-block shift copy).  The
    window layout only supports hops=1.  t: [S] int32 — blocks seen per
    stream INCLUDING the first hop of this call (warmup gating happens
    in the kernel: hop i of a stream with t + i < K emits silence and
    holds its OLA state).  olas: per bucket a tuple of three [S, B]
    accumulators (C, Ls, Rs) for ola="time" plans, or ONE packed
    [S, spec_width] spectral-carry array for ola="spectral" plans; with
    hops > 1 the carries chain across hops INSIDE the kernel (one HBM
    read + one write per call instead of per block).  Returns
    (outC, outLs, outRs) each [S, hops*hw] and the new olas structure.
    """
    S, G = plan.n_streams, plan.group
    n_groups = S // G
    spectral = plan.ola == "spectral"
    now, noola = _PROF_NOW, _PROF_NOOLA
    w_arrays = [] if now else plan.arrays()
    hops = int(hops)

    quarters = isinstance(histL, (tuple, list))
    if hops > 1 and not quarters:
        raise ValueError("hops > 1 requires the quarters history layout")
    if quarters:
        nq = plan.window // plan.hw
        nh = nq - 1 + hops
        if len(histL) != nh or len(histR) != nh:
            raise ValueError(
                f"quarters layout needs {nh} [S, hw] arrays per channel "
                f"at hops={hops}; got {len(histL)}/{len(histR)}"
            )
        hist_args = [*histL, *histR]
        in_specs = [
            pl.BlockSpec((G, plan.hw), lambda s: (s, 0), memory_space=pltpu.VMEM)
            for _ in hist_args
        ]
    else:
        nq = None
        hist_args = [histL, histR]
        in_specs = [
            pl.BlockSpec(
                (G, plan.window), lambda s: (s, 0), memory_space=pltpu.VMEM
            )
            for _ in range(2)
        ]
    in_specs.append(
        pl.BlockSpec((G, 1), lambda s: (s, 0), memory_space=pltpu.VMEM)
    )
    for w in w_arrays:
        zeros = (0,) * w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda s, z=zeros: z, memory_space=pltpu.VMEM)
        )
    ola_flat = []
    if not noola:
        for bi, b in enumerate(plan.buckets):
            if spectral:
                ola_flat.append(olas[bi])
                in_specs.append(
                    pl.BlockSpec(
                        (G, b.spec_width), lambda s: (s, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
                continue
            for o in range(3):
                ola_flat.append(olas[bi][o])
                in_specs.append(
                    pl.BlockSpec(
                        (G, b.B), lambda s: (s, 0), memory_space=pltpu.VMEM
                    )
                )

    out_specs = [
        pl.BlockSpec(
            (G, hops * plan.hw), lambda s: (s, 0), memory_space=pltpu.VMEM
        )
        for _ in range(3)
    ]
    out_shapes = [jax.ShapeDtypeStruct((S, hops * plan.hw), jnp.float32)] * 3
    if not noola:
        for b in plan.buckets:
            if spectral:
                out_specs.append(
                    pl.BlockSpec(
                        (G, b.spec_width), lambda s: (s, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
                out_shapes.append(
                    jax.ShapeDtypeStruct((S, b.spec_width), jnp.float32)
                )
                continue
            for _ in range(3):
                out_specs.append(
                    pl.BlockSpec(
                        (G, b.B), lambda s: (s, 0), memory_space=pltpu.VMEM
                    )
                )
                out_shapes.append(jax.ShapeDtypeStruct((S, b.B), jnp.float32))

    call = pl.pallas_call(
        _build_pool_kernel(plan, nq=nq, hops=hops),
        grid=(n_groups,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )
    outs = call(
        *hist_args,
        jnp.asarray(t, jnp.int32).reshape(S, 1),
        *[jnp.asarray(w) for w in w_arrays],
        *ola_flat,
    )
    outC, outLs, outRs = outs[0], outs[1], outs[2]
    if noola:  # profiling: state passes through unchanged
        return (outC, outLs, outRs), tuple(olas)
    if spectral:
        return (outC, outLs, outRs), tuple(outs[3:])
    new_olas = []
    pos = 3
    for _ in plan.buckets:
        new_olas.append(tuple(outs[pos : pos + 3]))
        pos += 3
    return (outC, outLs, outRs), tuple(new_olas)
