"""Omnibus pallas kernel: many buckets per launch, summed in VMEM.

Leave-one-out profiling shows each bucket costs ~125 us per scan step
regardless of kernel — launch chains and small-shape stages, not FLOPs or
HBM.  This kernel processes a GROUP of buckets in one launch per tile of
the shared timeline: per bucket it frames (zero-copy group reshapes of the
VMEM-resident tile), transforms (direct banded DFT for narrow buckets;
2-stage Cooley-Tukey matmuls in the banded layout for wide ones), applies
gain+mask, inverts, folds — and accumulates every bucket's folded
contribution into ONE output tile, carrying the combined OLA spill in VMEM
scratch across the sequential grid.

The tile is the LCM of the included block sizes, so all buckets share the
two offset input views (tile i, tile i+1).  All matmuls are bf16x3 with
pre-split hi/lo weight pairs (~1e-6 relative error, ~90+ dB pipeline SNR).

The 4096-block bucket of the default config is direct-eligible but its
12.4 MB of weights would monopolize VMEM here; it keeps its standalone
fused kernel (ops/pallas_upmix.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upmix_tpu.ops.fftmm import make_real_banded_plan, permute_half_bins
from upmix_tpu.ops.pallas_upmix import _dot_f32 as _dot3
from upmix_tpu.ops.pallas_upmix import _mask_sum
from upmix_tpu.ops.pallas_upmix import _split_bf16 as _bf16_pair


@dataclass(frozen=True)
class _DirectSub:
    B: int
    H: int
    wf_hi: np.ndarray  # [B, 2Kb] bf16
    wf_lo: np.ndarray
    wi_hi: np.ndarray  # [2Kb, B] bf16
    wi_lo: np.ndarray
    gains: np.ndarray  # [nb, Kb] f32

    @property
    def arrays(self):
        return (self.wf_hi, self.wf_lo, self.wi_hi, self.wi_lo, self.gains)


@dataclass(frozen=True)
class _TwoStageSub:
    B: int
    H: int
    n1: int
    n2: int
    aw: np.ndarray  # [N1, N2] f32 (analysis window pre-reshaped)
    swv: np.ndarray  # [N1, N2] f32 (synthesis window pre-reshaped)
    d1s_hi: np.ndarray  # [2N1, N1] bf16 — stage-1 DFT, re rows then im rows
    d1s_lo: np.ndarray
    twr: np.ndarray  # [N1, N2] f32
    twi: np.ndarray
    d2_hi: np.ndarray  # [N2, 2C] bf16 — stage-2, re cols then im cols
    d2_lo: np.ndarray
    e2_hi: np.ndarray  # [C, 2N2] bf16 — inverse stage-A, re cols then im cols
    e2_lo: np.ndarray
    b1_hi: np.ndarray  # [N1, 2N1] bf16 — inverse stage-B, [d1r | d1i]
    b1_lo: np.ndarray
    gains: np.ndarray  # [nb, N1, C] f32
    winv: np.ndarray  # [N1, C] f32

    @property
    def arrays(self):
        return (
            self.aw, self.swv, self.d1s_hi, self.d1s_lo, self.twr, self.twi,
            self.d2_hi, self.d2_lo, self.e2_hi, self.e2_lo, self.b1_hi,
            self.b1_lo, self.gains, self.winv,
        )


@dataclass(frozen=True)
class OmnibusPlan:
    tile: int
    halo: int
    n_tiles: int
    chunk: int
    subs: tuple  # mixed _DirectSub / _TwoStageSub

    def arrays(self):
        out = []
        for s in self.subs:
            out.extend(s.arrays)
        return out


def make_omnibus_plan(
    bucket_plans,
    chunk: int,
    direct_weight_limit: int = 4 << 20,
    tile_cap: int = 16384,
):
    """Build the omnibus plan from offline _BucketPlan records.

    Returns (plan_or_None, leftover): leftover bucket plans are NOT
    handled here — direct-eligible buckets whose weights exceed
    `direct_weight_limit` (standalone fused kernel), and buckets whose
    block exceeds `tile_cap` (the omnibus tile is the LCM of included
    blocks, and tile-sized in/out VMEM blocks above ~16k samples blow the
    16 MB scoped-VMEM budget).
    """
    from upmix_tpu.ops.dftmm import make_direct_plan

    subs = []
    leftover = []
    for p in bucket_plans:
        B, H = p.block_size, p.hop_size
        nz = np.nonzero(p.gains.max(axis=0))[0]
        if B > tile_cap or not len(nz):
            # Too big for tile-sized VMEM blocks, or all-zero gains (a
            # dead bucket would still inflate the tile LCM and halo).
            leftover.append(p)
            continue
        lo, hi = int(nz[0]), int(nz[-1])
        kept = hi - lo + 1
        direct_bytes = B * 2 * kept * 4
        if direct_bytes <= direct_weight_limit:
            dp = make_direct_plan(B, lo, hi, p.analysis_window, p.synthesis_window)
            wf_hi, wf_lo = _bf16_pair(dp.w_fwd)
            wi_hi, wi_lo = _bf16_pair(dp.w_inv)
            subs.append(
                _DirectSub(
                    B=B, H=H, wf_hi=wf_hi, wf_lo=wf_lo, wi_hi=wi_hi,
                    wi_lo=wi_lo,
                    gains=np.asarray(p.gains[:, lo : hi + 1], np.float32),
                )
            )
        elif direct_bytes <= (8 << 20):
            # Medium weights (the 4096 bucket): too hungry to share VMEM
            # here, small enough for the standalone fused kernel.  (Its
            # 2-stage form cannot ride the omnibus either: N2 = 64 is
            # below the 128-lane width and Mosaic rejects the reshape.)
            leftover.append(p)
        else:
            subs.append(make_twostage_sub(p))
    if not subs:
        return None, leftover
    tile = 1
    for s in subs:
        tile = tile * s.B // math.gcd(tile, s.B)
    halo = max(s.B - s.H for s in subs)
    if chunk % tile:
        raise ValueError(f"chunk {chunk} not a multiple of omnibus tile {tile}")
    if halo > tile:
        raise ValueError(f"halo {halo} exceeds tile {tile}")
    return (
        OmnibusPlan(
            tile=tile, halo=halo, n_tiles=chunk // tile, chunk=chunk, subs=tuple(subs)
        ),
        leftover,
    )


def make_twostage_sub(p) -> _TwoStageSub:
    """Pack one offline _BucketPlan's 2-stage weights for in-kernel use
    (shared by the omnibus and big-block kernels)."""
    B = p.block_size
    nz = np.nonzero(p.gains.max(axis=0))[0]
    lo, hi = (int(nz[0]), int(nz[-1])) if len(nz) else (0, 0)
    rp = make_real_banded_plan(B, lo, hi)
    d1s = np.concatenate([rp.d1r, rp.d1i], axis=0)  # [2N1, N1]
    d2 = np.concatenate([rp.d2r, rp.d2i], axis=1)  # [N2, 2C]
    e2 = np.concatenate([rp.e2r, rp.e2i], axis=1)  # [C, 2N2]
    b1 = np.concatenate([rp.d1r, rp.d1i], axis=1)  # [N1, 2N1]
    d1s_hi, d1s_lo = _bf16_pair(d1s)
    d2_hi, d2_lo = _bf16_pair(d2)
    e2_hi, e2_lo = _bf16_pair(e2)
    b1_hi, b1_lo = _bf16_pair(b1)
    gains = np.stack([permute_half_bins(rp, g) for g in p.gains]).astype(np.float32)
    return _TwoStageSub(
        B=B, H=p.hop_size, n1=rp.n1, n2=rp.n2,
        aw=np.asarray(p.analysis_window, np.float32).reshape(rp.n1, rp.n2),
        swv=np.asarray(p.synthesis_window, np.float32).reshape(rp.n1, rp.n2),
        d1s_hi=d1s_hi, d1s_lo=d1s_lo,
        twr=rp.twr, twi=rp.twi,
        d2_hi=d2_hi, d2_lo=d2_lo,
        e2_hi=e2_hi, e2_lo=e2_lo,
        b1_hi=b1_hi, b1_lo=b1_lo,
        gains=gains, winv=rp.winv,
    )


def twostage_forward_frame(xm, refs):
    """Forward 2-stage chain for one windowed frame xm [N1, N2] ->
    (re, im) [N1, C].  refs: the _TwoStageSub ref tuple."""
    (_aw, _swv, d1s_hi, d1s_lo, twr, twi, d2_hi, d2_lo, *_rest) = refs
    N1 = xm.shape[0]
    C = d2_hi.shape[1] // 2
    A = _dot3(xm.T, d1s_hi[...].T, d1s_lo[...].T)  # [N2, 2N1] = (D1 @ xm)^T
    a_re = A[:, :N1].T
    a_im = A[:, N1:].T
    b_re = a_re * twr[...] - a_im * twi[...]
    b_im = a_re * twi[...] + a_im * twr[...]
    p1 = _dot3(b_re, d2_hi[...], d2_lo[...])  # [N1, 2C]
    p2 = _dot3(b_im, d2_hi[...], d2_lo[...])
    return p1[:, :C] - p2[:, C:], p1[:, C:] + p2[:, :C]


def twostage_inverse_frame(sre, sim, refs):
    """Inverse 2-stage chain for one spectrum [N1, C] -> y [N1, N2]
    (synthesis weights winv applied, synthesis window NOT)."""
    (_aw, _swv, d1s_hi, d1s_lo, twr, twi, _d2h, _d2l, e2_hi, e2_lo,
     b1_hi, b1_lo, _g, winv) = refs
    N2 = twr.shape[1]
    sre = sre * winv[...]
    sim = sim * winv[...]
    q1 = _dot3(sre, e2_hi[...], e2_lo[...])  # [N1, 2N2]
    q2 = _dot3(sim, e2_hi[...], e2_lo[...])
    t_re = q1[:, :N2] - q2[:, N2:]
    t_im = q1[:, N2:] + q2[:, :N2]
    u_re = t_re * twr[...] + t_im * twi[...]
    u_im = t_im * twr[...] - t_re * twi[...]
    u = jnp.concatenate([u_re, u_im], axis=0)  # [2N1, N2]
    return _dot3(u.T, b1_hi[...].T, b1_lo[...].T).T  # [N1, N2]


def _frames_of(xloc, B, H, tile):
    """[2, K*M, B] frames (group-major order) from xloc [2, >= tile+B-H]."""
    K = B // H
    M = (tile // H) // K
    chans = []
    for ch in range(2):
        groups = [xloc[ch, g * H : g * H + M * B].reshape(M, B) for g in range(K)]
        chans.append(jnp.stack(groups, axis=0).reshape(K * M, B))
    return chans, K, M


def _fold(rec3, B, H, K, M, tile, width):
    """rec3 [3, K*M, B] (group-major) -> folded [3, width] (width >= tile+B-H)."""
    rec = rec3.reshape(3, K, M * B)
    spill_b = B - H
    total = tile + spill_b
    out = None
    for g in range(K):
        part = jnp.pad(rec[:, g], ((0, 0), (g * H, total - g * H - M * B)))
        out = part if out is None else out + part
    if width > total:
        out = jnp.pad(out, ((0, 0), (0, width - total)))
    return out


def _direct_tile(sub: _DirectSub, xloc, refs, tile, width):
    wf_hi, wf_lo, wi_hi, wi_lo, g_ref = refs
    B, H = sub.B, sub.H
    Kb = sub.gains.shape[1]
    chans, K, M = _frames_of(xloc, B, H, tile)
    sl = _dot3(chans[0], wf_hi[...], wf_lo[...])  # [K*M, 2Kb]
    sr = _dot3(chans[1], wf_hi[...], wf_lo[...])
    gains_list = [g_ref[b, :] for b in range(sub.gains.shape[0])]
    c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
        sl[:, :Kb], sl[:, Kb:], sr[:, :Kb], sr[:, Kb:], gains_list
    )
    recs = []
    for sre, sim in ((c_re, c_im), (l_re, l_im), (r_re, r_im)):
        s = jnp.concatenate([sre, sim], axis=1)
        recs.append(_dot3(s, wi_hi[...], wi_lo[...]))  # [K*M, B] (sw folded)
    return _fold(jnp.stack(recs), B, H, K, M, tile, width)


def _twostage_tile(sub: _TwoStageSub, xloc, refs, tile, width):
    aw, swv = refs[0], refs[1]
    g_ref = refs[12]
    B, H, N1, N2 = sub.B, sub.H, sub.n1, sub.n2
    K = B // H
    M = (tile // H) // K
    gains_list = [g_ref[b] for b in range(sub.gains.shape[0])]

    # Frames are sliced straight off the VMEM timeline and reshaped per
    # frame (a row-of-2D slice + reshape is the one shape-cast pattern
    # Mosaic supports here; slicing rows of a stacked [F, B] array is not).
    # F = K*M is small for wide buckets (4-16): static unroll.
    spill_b = B - H
    total = tile + spill_b
    out = None
    for g in range(K):
        flats = [[], [], []]
        for m in range(M):
            start = g * H + m * B
            spec = []
            for ch in range(2):
                xm = xloc[ch, start : start + B].reshape(N1, N2) * aw[...]
                spec.append(twostage_forward_frame(xm, refs))
            c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
                spec[0][0], spec[0][1], spec[1][0], spec[1][1], gains_list
            )
            for idx, (sre, sim) in enumerate(
                ((c_re, c_im), (l_re, l_im), (r_re, r_im))
            ):
                y = twostage_inverse_frame(sre, sim, refs)
                flats[idx].append((y * swv[...]).reshape(1, B))
        flat_g = jnp.stack(
            [jnp.concatenate(f, axis=1)[0] for f in flats]
        )  # [3, M*B]
        part = jnp.pad(flat_g, ((0, 0), (g * H, total - g * H - M * B)))
        out = part if out is None else out + part
    if width > total:
        out = jnp.pad(out, ((0, 0), (0, width - total)))
    return out


def _build_kernel(plan: OmnibusPlan):
    tile, halo, n_tiles = plan.tile, plan.halo, plan.n_tiles
    subs = plan.subs
    counts = [len(s.arrays) for s in subs]

    def kernel(*refs):
        x_ref, x_next_ref = refs[0], refs[1]
        pos = 2
        sub_refs = []
        for c in counts:
            sub_refs.append(refs[pos : pos + c])
            pos += c
        out_ref, spill_ref, acc = refs[pos], refs[pos + 1], refs[pos + 2]

        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        xloc = jnp.concatenate([x_ref[0], x_next_ref[0, :, :halo]], axis=1)
        width = tile + halo
        total = None
        for sub, srefs in zip(subs, sub_refs):
            if isinstance(sub, _DirectSub):
                contrib = _direct_tile(sub, xloc, srefs, tile, width)
            else:
                contrib = _twostage_tile(sub, xloc, srefs, tile, width)
            total = contrib if total is None else total + contrib

        total = jnp.concatenate(
            [total[:, :halo] + acc[...], total[:, halo:]], axis=1
        )
        out_ref[0] = total[:, :tile]
        acc[...] = total[:, tile:]

        @pl.when(i == n_tiles - 1)
        def _():
            spill_ref[0] = total[:, tile:]

    return kernel


def omnibus_lcr_batch(x: jnp.ndarray, plan: OmnibusPlan, interpret: bool = False):
    """Run the omnibus engine over a batch of independent segments.

    x: [S, 2, chunk + halo] float32.  Returns (main [S, 3, chunk],
    spill [S, 3, halo]).
    """
    tile, halo = plan.tile, plan.halo
    n_seg = x.shape[0]
    need = plan.chunk + tile
    pad = need - x.shape[-1]
    if pad < 0:
        raise ValueError(f"x too long: {x.shape[-1]} > {need}")
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))

    w_arrays = plan.arrays()
    in_specs = [
        pl.BlockSpec((1, 2, tile), lambda s, i: (s, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tile), lambda s, i: (s, 0, i + 1), memory_space=pltpu.VMEM),
    ]
    for w in w_arrays:
        zeros = (0,) * w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda s, i, z=zeros: z, memory_space=pltpu.VMEM)
        )

    call = pl.pallas_call(
        _build_kernel(plan),
        grid=(n_seg, plan.n_tiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 3, tile), lambda s, i: (s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, halo), lambda s, i: (s, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_seg, 3, plan.chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_seg, 3, halo), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((3, halo), jnp.float32)],
        interpret=interpret,
    )
    return call(xp, xp, *[jnp.asarray(w) for w in w_arrays])


def omnibus_lcr(x: jnp.ndarray, plan: OmnibusPlan, interpret: bool = False):
    """Single segment: x [2, chunk + halo] -> (main [3, chunk], spill [3, halo])."""
    main, spill = omnibus_lcr_batch(x[None], plan, interpret=interpret)
    return main[0], spill[0]
