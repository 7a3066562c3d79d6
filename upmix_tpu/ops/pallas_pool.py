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
    wi_hi: np.ndarray  # [2K, B] bf16
    wi_lo: np.ndarray
    gains: np.ndarray  # [nb, K] f32

    @property
    def arrays(self):
        return (self.wf_hi, self.wf_lo, self.wi_hi, self.wi_lo, self.gains)


@dataclass(frozen=True)
class PoolPlan:
    hw: int
    window: int  # shared history length = warmup * hw
    n_streams: int
    group: int  # streams per grid step
    buckets: tuple

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
):
    """Build the pool-kernel plan, or return None when a bucket is not
    direct-DFT eligible (the caller falls back to the XLA engine)."""
    from upmix_tpu.models.streaming import stream_warmup_blocks

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
        aw = make_window(config.window, block_size)
        if config.synthesis == "wola":
            sw = design_wola_synthesis_window(aw, config.overlap)
        else:
            sw = aw
        dplan = make_direct_plan(block_size, lo, hi, aw, sw)
        wf_hi, wf_lo = _split_bf16(dplan.w_fwd)
        wi_hi, wi_lo = _split_bf16(dplan.w_inv)
        buckets.append(
            _PoolBucket(
                B=block_size, H=hop, P=hw // hop,
                wf_hi=wf_hi, wf_lo=wf_lo, wi_hi=wi_hi, wi_lo=wi_lo,
                gains=np.asarray(gains[:, lo : hi + 1], np.float32),
            )
        )
    if not buckets:
        return None
    return PoolPlan(
        hw=hw, window=warmup * hw, n_streams=int(n_streams), group=group,
        buckets=tuple(buckets),
    )


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


def _build_pool_kernel(plan: PoolPlan, nq: int | None = None):
    """Pool kernel body.  nq=None: one [G, window] history ref per
    channel (the wrapper shifts the window in XLA each block).  nq=k:
    the history arrives as k [G, hw] QUARTER refs per channel in logical
    order oldest->newest, the newest being the current input block — no
    per-block shift copy anywhere (CLAUDE.md round-4 candidate #2)."""
    hw, G = plan.hw, plan.group
    buckets = plan.buckets
    counts = [len(b.arrays) for b in buckets]

    warmup = plan.window // hw
    # Snapshot the profiling flags at build time (trace-consistent).
    now, noola = _PROF_NOW, _PROF_NOOLA
    nodot, nofold = _PROF_NODOT or now, _PROF_NOFOLD
    nomask = _PROF_NOMASK or now

    def kernel(*refs):
        if nq is None:
            histL, histR = refs[0], refs[1]  # [G, window]
            pos = 2
        else:
            histL = refs[:nq]  # nq x [G, hw], oldest -> newest
            histR = refs[nq : 2 * nq]
            pos = 2 * nq
        t_ref = refs[pos]  # [G, 1] int32 — blocks seen (AFTER this one)
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
                ola_in.append(refs[pos : pos + 3])  # C/Ls/Rs [G, B] each
                pos += 3
        outC, outLs, outRs = refs[pos], refs[pos + 1], refs[pos + 2]
        ola_out = []
        pos += 3
        for _ in buckets:
            if noola:
                ola_out.append(None)
            else:
                ola_out.append(refs[pos : pos + 3])
                pos += 3

        # Warmup gating IN the kernel (per stream): not-ready streams
        # emit silence and hold their OLA state (the reference's degraded
        # mode, bela/upmix.cpp:485-491).  Doing the select here on VMEM
        # tiles saves the XLA-side where over every [S, B] carry (~6% of
        # step time at S=2048).
        ready = t_ref[...] >= warmup  # [G, 1]

        accs = [None, None, None]
        for bi, b in enumerate(buckets):
            B, H, P = b.B, b.H, b.P
            K = b.gains.shape[1]
            if now:
                wf_hi = wf_lo = wi_hi = wi_lo = g_ref = None
            else:
                wf_hi, wf_lo, wi_hi, wi_lo, g_ref = wrefs[bi]
            # Grouped framing (the omnibus kernel's trick, pallas_upmix.py
            # _kernel): frames p ≡ j (mod Kr) start at j*H + m*B, so group
            # j is ONE contiguous [G, M*B] slice, reshaped to [G*M, B]
            # rows (stream, m).  The reshape materializes an offset-0
            # layout, making the axis-0 concat legal even when H < 128
            # lanes (Mosaic rejects concats of slices whose lane offsets
            # mismatch on the non-concat dim).  When P does not fill whole
            # groups (B > hw), fall back to one group per pass — those
            # have H >= 128 in practice, so the slices are lane-aligned.
            Kr = B // H
            if P % Kr == 0:
                NG, M = Kr, P // Kr
            else:
                NG, M = P, 1
            if nq is not None:
                # Quarter-held history: group slices may span quarter
                # boundaries -> lane-axis concat of per-quarter slices.
                # When the slice offsets (j*H) are not 128-lane-aligned
                # (e.g. the H=64 bucket), Mosaic's concat rules are the
                # risk (CLAUDE.md) — pre-materialize ONE aligned base
                # value covering the bucket's span and slice groups from
                # it instead (the base concat's inputs are whole/aligned
                # quarter slices).
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
                        flat = ch_ref[:, j * H : j * H + M * B]  # [G, M*B]
                    elif srcL is not None:
                        src = srcL if ci == 0 else srcR
                        flat = src[:, j * H : j * H + M * B]
                    else:
                        flat = _read_span(ch_ref, j * H, j * H + M * B, hw)
                    zs.append(flat.reshape(G * M, B))
            Z = jnp.concatenate(zs, axis=0)  # [2*P*G, B] rows (ch, j, s, m)
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
                gains_list = [g_ref[i, :] for i in range(b.gains.shape[0])]
                c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
                    sl[:, :K], sl[:, K:], sr[:, :K], sr[:, K:], gains_list
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
                rec = _dot3(S, wi_hi[...], wi_lo[...])  # [3PG, B] (o,j,s,m)
            L = (P - 1) * H + B
            GM = G * M
            for o in range(3):
                rec_o = rec[o * F : (o + 1) * F]  # [PG, B] rows (j, s, m)
                if nofold:  # fabrication: pad+add only, no shifted fold
                    w = min(hw, B)
                    emit = rec_o[:G, :w]
                    if w < hw:
                        emit = jnp.pad(emit, ((0, 0), (0, hw - w)))
                    accs[o] = emit if accs[o] is None else accs[o] + emit
                    if not noola:
                        ola_out[bi][o][...] = jnp.where(
                            ready,
                            rec_o[:G] + ola_in[bi][o][...],
                            ola_in[bi][o][...],
                        )
                    continue
                acc = None
                for j in range(NG):
                    # Group j's M frames are contiguous per stream: rows
                    # (s, m) flatten back to [G, M*B], landing at j*H.
                    flat = rec_o[j * GM : (j + 1) * GM].reshape(G, M * B)
                    part = jnp.pad(
                        flat, ((0, 0), (j * H, L - j * H - M * B))
                    )
                    acc = part if acc is None else acc + part
                carry = 0.0 if noola else ola_in[bi][o][...]
                if L > B:
                    full = jnp.concatenate(
                        [acc[:, :B] + carry, acc[:, B:]], axis=1
                    )  # [G, L]
                else:  # P == 1: L == B and acc[:, B:] would be a zero-width
                    # slice, which Mosaic rejects ("positive constant sizes").
                    full = acc + carry
                emit = full[:, : P * H]  # [G, hw]
                accs[o] = emit if accs[o] is None else accs[o] + emit
                if not noola:
                    tail = jnp.concatenate(
                        [full[:, P * H :], jnp.zeros((G, H), jnp.float32)],
                        axis=1,
                    )
                    ola_out[bi][o][...] = jnp.where(
                        ready, tail, ola_in[bi][o][...]
                    )
        zero = jnp.zeros((G, hw), jnp.float32)
        outC[...] = jnp.where(ready, accs[0], zero)
        outLs[...] = jnp.where(ready, accs[1], zero)
        outRs[...] = jnp.where(ready, accs[2], zero)

    return kernel


def pool_step_lcr(histL, histR, t, olas, plan: PoolPlan, interpret: bool = False):
    """One hardware block for every stream.

    histL/histR: either [S, window] float32 — the UPDATED shared history
    whose last hw samples are the current input block — or a
    tuple/list of window//hw QUARTER arrays [S, hw] in logical order
    oldest->newest (the newest being the current input block; the
    quarters layout needs no per-block shift copy).  t: [S] int32 —
    blocks seen per stream INCLUDING this one (warmup gating happens in
    the kernel: streams with t < K emit silence and hold their OLA
    state).  olas: per bucket a tuple of three [S, B] accumulators
    (C, Ls, Rs).  Returns (outC, outLs, outRs) each [S, hw] and the new
    olas structure.
    """
    S, G = plan.n_streams, plan.group
    n_groups = S // G
    now, noola = _PROF_NOW, _PROF_NOOLA
    w_arrays = [] if now else plan.arrays()

    quarters = isinstance(histL, (tuple, list))
    if quarters:
        nq = plan.window // plan.hw
        if len(histL) != nq or len(histR) != nq:
            raise ValueError(
                f"quarters layout needs {nq} [S, hw] arrays per channel; "
                f"got {len(histL)}/{len(histR)}"
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
            for o in range(3):
                ola_flat.append(olas[bi][o])
                in_specs.append(
                    pl.BlockSpec(
                        (G, b.B), lambda s: (s, 0), memory_space=pltpu.VMEM
                    )
                )

    out_specs = [
        pl.BlockSpec((G, plan.hw), lambda s: (s, 0), memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    out_shapes = [jax.ShapeDtypeStruct((S, plan.hw), jnp.float32)] * 3
    if not noola:
        for b in plan.buckets:
            for _ in range(3):
                out_specs.append(
                    pl.BlockSpec(
                        (G, b.B), lambda s: (s, 0), memory_space=pltpu.VMEM
                    )
                )
                out_shapes.append(jax.ShapeDtypeStruct((S, b.B), jnp.float32))

    call = pl.pallas_call(
        _build_pool_kernel(plan, nq=nq),
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
    new_olas = []
    pos = 3
    for _ in plan.buckets:
        new_olas.append(tuple(outs[pos : pos + 3]))
        pos += 3
    return (outC, outLs, outRs), tuple(new_olas)
