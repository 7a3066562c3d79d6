"""Omnibus pallas kernel: ALL buckets in one launch, summed in VMEM.

Round-1 leave-one-out profiling showed each separately-launched bucket
costs ~125 us per scan step regardless of kernel.  This kernel processes
every bucket of the config in one launch per tile of the shared timeline:
per bucket it frames (zero-copy group reshapes of the VMEM-resident
tile), transforms (direct banded DFT for narrow buckets; batched
block-diagonal 2-stage matmuls for medium/wide/huge ones — see
_TwoStageBdSub), applies gain+mask, inverts, folds at the bucket's
natural width — and merges every bucket's folded contribution into ONE
output tile, carrying the combined OLA spill in VMEM scratch across the
sequential grid.

The tile is the LCM of the small buckets' block sizes (<= tile_cap);
buckets whose BLOCK exceeds the tile (65536 at the default config) read
ceil(halo/tile) extra lookahead VIEWS of the input (BlockSpec index maps
i+1, i+2, ...) and fold through the same spill carry — this replaces
round 1's tile=LCM attempt (VMEM blowup at the 16 MB scoped default) and
the manual-DMA bigblock kernel (slower standalone).

All matmuls are bf16x3 with pre-split hi/lo weight pairs (~1e-6 relative
error, ~100 dB pipeline SNR).  bf16x2 was measured at 56-59 dB end to
end — below the 60 dB bar; do not retry.
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

# PROFILING knob (scripts/bench_omnibus_ab.py "proffold"): skip the
# overlap-add folds/merges (WRONG OUTPUT) to attribute their cost.
_PROF_NOFOLD = False

# More PROFILING-ONLY knobs (scripts/bench_kernel_attrib.py) — each skips
# one class of in-kernel work (WRONG OUTPUT) so interleaved A/B runs can
# attribute the kernel's cost structure.  All must be False in production;
# they are read at trace time, like _PROF_NOFOLD.
_PROF_NOWIN = False  # skip analysis/synthesis window multiplies (BD subs)
_PROF_NOTW = False  # skip twiddle rotations (BD subs, both directions)
_PROF_NOREGROUP = False  # skip the q1/q2 inverse-lane regroup concats
_PROF_NOTINY = False  # skip the tiny-K/N stage-2 dots (p12/q12, BD subs)

# Scratch-accumulate folds (A/B knob "foldscratch"): every sub adds its
# per-start/group flats IN PLACE into one [3, tile+halo] VMEM scratch at
# static offsets, replacing the per-start pad-to-width + full-width adds
# and the cross-sub merge concats.  Exact same arithmetic, different
# dataflow.  Must be set BEFORE plans/kernels are built.
_FOLD_SCRATCH = False

# Stacked-activation dots (A/B knob "dotstacked", composes with
# _DOT_PAIRED): q1/q2 (and p1/p2) share their weight matrices, so the
# re/im activations ride ONE row-stacked dot instead of two — identical
# products, half the invocations, one extra [2*rows, N] concat each.
# Trace-time flag like the others.
_DOT_STACKED = False

# p-only stacking (A/B knob "dotstackp"): stack just p1/p2, whose input
# concat is WIDE ([rows, 2N2] blocks — cheap), leaving q1/q2 unstacked
# (their [rows, 3C] tiny-lane concat is what made full dotstacked a
# wash).
_DOT_STACKED_P = False

# E2 split-4 (A/B knob "e2split4", EXACT, lane-stacked subs only): the
# _E2_HALVES weight layout consumed as FOUR separate dots whose weight
# halves are ref-sliced (VMEM loads), so each dot's OUTPUT is already
# t-layout — no result slicing (what made e2halves slower), no concats.
# Same MACs; +6 MXU invocations (measured free).
_E2_SPLIT4 = False

# E2 halves layout (A/B knob "e2halves", EXACT, lane-stacked subs only):
# order the stage-B output columns [all-re | all-im] (s-major 3N2 blocks
# inside each half) so the inverse regroup becomes FOUR half-slices with
# zero concats, replacing the (s,o)-major 12*S-slice regroup.  Round 2
# measured this relayout SLOWER on the per-start path; the lane-stacked
# noregroup variant measures 0.33 ms (5.9%), which is the evidence that
# justifies re-trying it in the new geometry.
_E2_HALVES = False

# Lane-stacked starts (DEFAULT ON since round 3, EXACT): a multi-start
# BD sub runs ONE dot chain for ALL its starts — each start's frame
# columns ride the LANES (Z_all = [Z_s0 | Z_s1 | ...]), the
# start-independent left weights (w1s, w1i) apply unchanged at S-fold
# width, and the narrow stage-2/stage-B weights become block-diagonal
# I_S ⊗ d2b / e2b with quantity-major column permutations so the mask
# slices stay contiguous.  Identical products; the per-tile count of
# serial MXU→VPU→MXU chains drops from 9 to 3 — MEASURED +9.2% end to
# end (5.59 vs 6.16 ms, interleaved min-of-visits; the ~1 ms `notiny`
# cost is chain LATENCY, not invocation throughput — the dotpaired/
# dotpadn/dotstackp probes each measured a wash).  Elementwise
# constants pre-tile S-fold (a few MB of extra VMEM).  Read at
# plan-build time.
_LANE_STACK = True

# Pad the tiny stage-2 dots to native lane width (A/B knob "dotpadn",
# EXACT): the p dots' output (4C <= 24 lanes) and the q dots' input
# (3C <= 18 lanes) are far below the 128-lane native width; this knob
# zero-pads d2b's columns and e2b's rows to 128 (weights — free) and
# widens S_re/S_im with a zero block, probing whether the measured ~1 ms
# tiny-dot cost (notiny variant) is sub-native-lane layout penalty
# (padding helps) or per-invocation latency (it doesn't).
_DOT_PADN = False

# Paired-pass bf16x3 dots (A/B knob "dotpaired"): compute the SAME three
# partial products (hi*hi, hi*lo, lo*hi) in TWO MXU invocations instead
# of three, by pre-concatenating the weight hi/lo halves along the
# non-contracting axis (constants — zero runtime concat).  Exact same
# MACs and products; only the invocation count and the f32 add order
# change (~1e-7).  Applied to the four large block-diagonal dots whose
# slice boundaries are lane/sublane aligned; the tiny d2b (4C lanes) and
# direct-sub dots keep the 3-pass form.  Must be set BEFORE plans are
# built (make_bd_sub stores the paired weight layouts).
_DOT_PAIRED = False


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
class _TwoStageBdSub:
    """Batched block-diagonal 2-stage sub: all M frames of a hop-group go
    through single left-multiplied matmuls (weights I_M ⊗ D1), with N2
    pinned to the 128-lane width.  Eliminates both the per-frame unroll
    and the in-kernel transposes of the original right-multiplied form
    (measured: the unrolled form cost +2.5 ms/iter for the 4096 bucket).

    Covers B <= tile (frames ≡ g mod K tile contiguously; sub-groups of M
    such frames per start) and B > tile (M = 1, one start per hop) with
    identical math: each start reads glen = M*B samples at its offset and
    its folded flat lands there.

    Stage-1 output rows are restricted to R <= N1: only k1 rows that can
    carry a kept bin (k1 + N1*k2 in [lo, hi] for some kept column) are
    computed — a 2.3x MAC cut for single-column buckets like 65536 at
    44.1 kHz, exact because the dropped rows are annihilated by the gains
    anyway.

    The kernel is issue-bound on small MXU ops, so the stereo channels
    ride the LANES of one stage-1 chain (Z = [Z_L | Z_R], stage-2 weights
    I_2 ⊗ D2) and the three outputs (C, Ls, Rs) ride the lanes of one
    inverse chain (I_3 ⊗ E2, one stage-B matmul): 18 MXU dots per group
    instead of 45."""

    B: int
    H: int
    n1: int
    n2: int  # always 128
    M: int  # frames per sub-group (capped so the kron weights stay small)
    starts: tuple  # sub-group start offsets within the tile
    R: int  # kept stage-1 rows (R <= n1)
    aw2: np.ndarray  # [M*N1, 2*N2] f32 ([aw | aw] — stereo lanes)
    sw3: np.ndarray  # [M*N1, 3*N2] f32 ([sw | sw | sw] — output lanes)
    w1s_hi: np.ndarray  # [2*M*R, M*N1] bf16: rows = [I⊗d1r[:R] ; I⊗d1i[:R]]
    w1s_lo: np.ndarray
    twr2: np.ndarray  # [M*R, 2*N2] f32
    twi2: np.ndarray
    d2b_hi: np.ndarray  # [2*N2, 4C] bf16 (I_2 ⊗ d2)
    d2b_lo: np.ndarray
    e2b_hi: np.ndarray  # [3C, 6*N2] bf16 (I_3 ⊗ e2)
    e2b_lo: np.ndarray
    twr3: np.ndarray  # [M*R, 3*N2] f32
    twi3: np.ndarray
    winv_rep: np.ndarray  # [M*R, C] f32
    w1i_hi: np.ndarray  # [M*N1, 2*M*R] bf16: [I⊗d1r[:R].T | I⊗d1i[:R].T]
    w1i_lo: np.ndarray
    gains_rep: np.ndarray  # [nb, M*R, C] f32
    # Lane-stacked starts (see _LANE_STACK): S > 1 means ALL starts ride
    # one dot chain with start-major lane blocks; elementwise constants
    # above arrive pre-tiled S-fold, d2b/e2b arrive as permuted
    # block-diagonals, and gains_rep's last axis is S*C.
    lane_stack: int = 1

    @property
    def arrays(self):
        return (
            self.aw2, self.sw3, self.w1s_hi, self.w1s_lo,
            self.twr2, self.twi2, self.d2b_hi, self.d2b_lo,
            self.e2b_hi, self.e2b_lo, self.twr3, self.twi3,
            self.winv_rep, self.w1i_hi, self.w1i_lo, self.gains_rep,
        )


@dataclass(frozen=True)
class OmnibusPlan:
    tile: int
    halo: int
    n_tiles: int
    chunk: int
    subs: tuple  # mixed _DirectSub / _TwoStageBdSub

    @property
    def n_views(self) -> int:
        # 1 main view + enough lookahead views to cover the halo.
        return 1 + -(-self.halo // self.tile)

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
    include_medium: bool = True,
    include_big: bool = True,
    min_tile: int = 4096,
    tile_pref: int | None = None,
    big_hop_cap: int = 32768,
):
    """Build the omnibus plan from offline _BucketPlan records.

    Every bucket of a typical config rides one launch:
      - narrow buckets whose direct-DFT weights fit `direct_weight_limit`
        -> _DirectSub (one matmul per direction);
      - medium and wide buckets (<= tile_cap) -> _TwoStageBdSub, the
        batched block-diagonal 2-stage form with N2 pinned to 128 lanes
        (round 1 had the medium 4096 bucket in a standalone fused direct
        kernel; both the direct form inside the omnibus (VMEM pressure)
        and the per-frame-unrolled 2-stage (+2.5 ms) measured slower);
      - blocks LARGER than the tile (e.g. 65536) -> _TwoStageBdSub with
        M=1 and one start per hop: the tile stays at tile_cap and the
        kernel reads ceil(halo/tile) extra lookahead views of the input.

    `include_medium`/`include_big` restore the round-1 classification for
    A/B benchmarking (scripts/bench_omnibus_ab.py).

    Returns (plan_or_None, leftover): leftover bucket plans must be
    handled by the caller (dead all-zero-gain buckets, big buckets whose
    hop doesn't divide the tile, and whatever the compat flags exclude).
    """
    from upmix_tpu.ops.dftmm import make_direct_plan

    # Pass 1: classify buckets (the tile depends on which are included).
    picked = []  # (kind, bucket_plan)
    leftover = []
    for p in bucket_plans:
        B, H = p.block_size, p.hop_size
        nz = np.nonzero(p.gains.max(axis=0))[0]
        if not len(nz) or B & (B - 1) or B % H:
            # Dead buckets (all-zero gains) would inflate the tile
            # LCM/halo; non-power-of-two blocks (possible via a non-pow2
            # max_block_size) break the 2-stage factorization and the
            # kernel's reshape geometry; non-divisible hops (arbitrary
            # overlaps) break the hop-group framing every sub relies on
            # (frames ≡ g mod K) — callers run those via gather framing.
            leftover.append(p)
            continue
        if B > tile_cap:
            # Big bucket: frames span multiple tiles (extra lookahead
            # views).  Needs hop | tile and hop <= tile; a hop above
            # tile_cap (e.g. 65536 at overlap 0.5 -> hop 32768) GROWS the
            # tile to the hop rather than dropping the bucket — round 2
            # measured a dropped 65536 bucket's separate XLA chain eating
            # the entire 2x frame-count win of overlap 0.5.
            if include_big and H <= big_hop_cap:
                picked.append(("big", p))
            else:
                leftover.append(p)
            continue
        lo, hi = int(nz[0]), int(nz[-1])
        kept = hi - lo + 1
        direct_bytes = B * 2 * kept * 4
        if direct_bytes <= direct_weight_limit:
            picked.append(("direct", p))
        elif direct_bytes <= (8 << 20) and not include_medium:
            # Round-1 behavior for medium direct-eligible buckets (e.g.
            # 4096): standalone fused kernel outside the omnibus.
            leftover.append(p)
        else:
            picked.append(("twostage", p))
    if not picked:
        return None, leftover

    tile = 1
    for kind, p in picked:
        unit = p.hop_size if kind == "big" else p.block_size
        tile = tile * unit // math.gcd(tile, unit)
    # Optionally scale the tile up to a preferred size (multiples of the
    # LCM keep every geometry valid) — fewer, larger grid steps.
    if tile_pref is not None:
        while tile * 2 <= min(tile_pref, tile_cap):
            tile *= 2
    # (Every big bucket's hop is folded into the LCM above, so hop | tile
    # and hop <= tile hold by construction for all picked buckets.)
    # Big hops above tile_cap raise the effective cap: the grown tile only
    # carries the buckets that forced it (small-bucket M stays capped by
    # the M*B <= 16384 rule below, so the kron waste does not grow).
    tile_cap_eff = max(
        [tile_cap] + [p.hop_size for kind, p in picked if kind == "big"]
    )
    if tile > tile_cap_eff or tile < min_tile:
        # min_tile: Mosaic rejects the fold's offset concats for small
        # tiles on real hardware ("result/input offset mismatch on
        # non-concat dimension"; measured boundary: tile >= 4096 compiles,
        # <= 2048 does not).  Leftover buckets run in the standalone fused
        # kernel (unaffected) or the XLA path.  Interpret-mode callers
        # pass min_tile=0.
        return None, leftover + [p for _, p in picked]

    # Pass 2: build the sub records with the tile known.
    subs = []
    for kind, p in picked:
        B, H = p.block_size, p.hop_size
        if kind == "direct":
            nz = np.nonzero(p.gains.max(axis=0))[0]
            lo, hi = int(nz[0]), int(nz[-1])
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
        elif kind == "twostage":
            # Frames ≡ g (mod K) tile contiguously with stride B; split
            # each such run into sub-groups of M frames.  M is capped so
            # the I_M ⊗ D1 kron weights stay small (their size — and the
            # block-diagonal FLOP waste — grows with M; per-grid-step
            # fixed cost shrinks with fewer, larger tiles instead).
            K = B // H
            M_full = (tile // H) // K
            M = M_full
            while M > 1 and M * B > 16384:
                M //= 2
            starts = tuple(
                g * H + j * M * B
                for g in range(K)
                for j in range(M_full // M)
            )
            subs.append(make_bd_sub(p, M=M, starts=starts))
        else:  # big
            starts = tuple(j * H for j in range(tile // H))
            subs.append(make_bd_sub(p, M=1, starts=starts))

    halo = max(s.B - s.H for s in subs)
    if chunk % tile:
        raise ValueError(f"chunk {chunk} not a multiple of omnibus tile {tile}")
    return (
        OmnibusPlan(
            tile=tile, halo=halo, n_tiles=chunk // tile, chunk=chunk,
            subs=tuple(subs),
        ),
        leftover,
    )


def make_bd_sub(p, M: int, starts: tuple) -> _TwoStageBdSub:
    """Pack one bucket's batched block-diagonal 2-stage weights.

    N2 is pinned to 128 (Mosaic's 1D->2D shape cast supports only the
    native lane width); all M frames of a group ride each matmul via
    I_M ⊗ D1 block-diagonal stage-1/stage-B weights, and the twiddles /
    windows / gains are pre-tiled M times along the rows.
    """
    B = p.block_size
    n1 = B // 128
    nz = np.nonzero(p.gains.max(axis=0))[0]
    lo, hi = (int(nz[0]), int(nz[-1])) if len(nz) else (0, 0)
    rp = make_real_banded_plan(B, lo, hi, n1=n1)
    # Stage-1 row restriction: keep k1 rows [0, R) covering every kept bin
    # (bins outside [lo, hi] are zeroed by the gains, so dropping their
    # rows is exact).  R is rounded up to the f32 sublane multiple.
    need_max = max(
        min(n1 - 1, hi - n1 * c) for c in rp.cols if lo - n1 * c <= n1 - 1
    )
    R = min(n1, -(-(need_max + 1) // 8) * 8)
    eye = np.eye(M, dtype=np.float32)
    bd_r = np.kron(eye, rp.d1r[:R])  # [M*R, M*N1]
    bd_i = np.kron(eye, rp.d1i[:R])
    w1s = np.concatenate([bd_r, bd_i], axis=0)  # [2*M*R, M*N1]
    # Inverse stage-B: y[n] = sum_{k1<R} d1r[k1,n] u_re[k1] + d1i[k1,n] u_im[k1]
    w1i = np.concatenate(
        [np.kron(eye, rp.d1r[:R].T), np.kron(eye, rp.d1i[:R].T)], axis=1
    )  # [M*N1, 2*M*R]
    d2 = np.concatenate([rp.d2r, rp.d2i], axis=1)  # [N2, 2C]
    e2 = np.concatenate([rp.e2r, rp.e2i], axis=1)  # [C, 2N2]
    d2b = np.kron(np.eye(2, dtype=np.float32), d2)  # [2N2, 4C]
    e2b = np.kron(np.eye(3, dtype=np.float32), e2)  # [3C, 6N2]
    C = e2b.shape[0] // 3
    N2 = rp.n2
    S = len(starts) if (_LANE_STACK and len(starts) > 1) else 1
    if S > 1:
        # Lane-stacked starts (see _LANE_STACK): block-diagonal stage-2
        # with QUANTITY-major columns (all starts' re_L block, then im_L,
        # re_R, im_R) so the mask slices stay contiguous at S*C width...
        d2p = np.zeros((S * 2 * N2, S * 4 * C), np.float32)
        for s in range(S):
            for o in range(4):
                d2p[
                    s * 2 * N2 : (s + 1) * 2 * N2,
                    o * S * C + s * C : o * S * C + (s + 1) * C,
                ] = d2b[:, o * C : (o + 1) * C]
        # ...and stage-B with quantity-major rows.  Column order: default
        # is start-major 6N2 blocks with the standard per-output re/im
        # interleave; _E2_HALVES instead emits [all-re | all-im] halves
        # (s-major 3N2 blocks inside each) so the regroup is 4 slices.
        e2p = np.zeros((3 * S * C, S * 6 * N2), np.float32)
        for s in range(S):
            for o in range(3):
                blk = e2b[o * C : (o + 1) * C, o * 2 * N2 : (o + 1) * 2 * N2]
                row = slice(o * S * C + s * C, o * S * C + (s + 1) * C)
                if _E2_HALVES or _E2_SPLIT4:
                    re0 = s * 3 * N2 + o * N2
                    im0 = S * 3 * N2 + s * 3 * N2 + o * N2
                    e2p[row, re0 : re0 + N2] = blk[:, :N2]
                    e2p[row, im0 : im0 + N2] = blk[:, N2:]
                else:
                    col0 = s * 6 * N2 + o * 2 * N2
                    e2p[row, col0 : col0 + 2 * N2] = blk
        d2b, e2b = d2p, e2p
    if _DOT_PADN:
        # Zero-pad the narrow dimensions to the native 128 lanes (exact:
        # the extra p columns are ignored and the extra q rows multiply
        # the zero block appended to S_re/S_im).  See _DOT_PADN.
        if d2b.shape[1] < 128:
            d2b = np.pad(d2b, ((0, 0), (0, 128 - d2b.shape[1])))
        if e2b.shape[0] < 128:
            e2b = np.pad(e2b, ((0, 128 - e2b.shape[0]), (0, 0)))
    w1s_hi, w1s_lo = _bf16_pair(w1s)
    w1i_hi, w1i_lo = _bf16_pair(w1i)
    d2b_hi, d2b_lo = _bf16_pair(d2b)
    e2b_hi, e2b_lo = _bf16_pair(e2b)
    if _DOT_PAIRED:
        # Paired layouts: *_hi carries [hi ; lo] stacked on the
        # NON-contracting axis (rows for left weights, lanes for right
        # weights); *_lo carries the plain hi half (consumed by the
        # activation-lo pass).  See _DOT_PAIRED.
        w1s_hi, w1s_lo = np.concatenate([w1s_hi, w1s_lo], axis=0), w1s_hi
        w1i_hi, w1i_lo = np.concatenate([w1i_hi, w1i_lo], axis=0), w1i_hi
        e2b_hi, e2b_lo = np.concatenate([e2b_hi, e2b_lo], axis=1), e2b_hi
    rep = lambda a, lanes=1: np.tile(np.asarray(a, np.float32), (M, lanes))
    # With lane-stacked starts the elementwise constants repeat S-fold on
    # the lanes (start-major blocks), matching the stacked activations.
    st = lambda a: np.tile(a, (1, S)) if S > 1 else a
    gains_rep = np.stack(
        [np.tile(permute_half_bins(rp, g)[:R], (M, S)) for g in p.gains]
    ).astype(np.float32)
    aw = np.asarray(p.analysis_window, np.float32).reshape(n1, rp.n2)
    sw = np.asarray(p.synthesis_window, np.float32).reshape(n1, rp.n2)
    return _TwoStageBdSub(
        B=B, H=p.hop_size, n1=n1, n2=rp.n2, M=M, starts=tuple(starts), R=R,
        aw2=st(rep(aw, 2)), sw3=st(rep(sw, 3)),
        w1s_hi=w1s_hi, w1s_lo=w1s_lo,
        twr2=st(rep(rp.twr[:R], 2)), twi2=st(rep(rp.twi[:R], 2)),
        d2b_hi=d2b_hi, d2b_lo=d2b_lo, e2b_hi=e2b_hi, e2b_lo=e2b_lo,
        twr3=st(rep(rp.twr[:R], 3)), twi3=st(rep(rp.twi[:R], 3)),
        winv_rep=st(rep(rp.winv[:R])),
        w1i_hi=w1i_hi, w1i_lo=w1i_lo,
        gains_rep=gains_rep,
        lane_stack=S,
    )


def _frames_of(xloc, B, H, tile):
    """[2, K*M, B] frames (group-major order) from xloc [2, >= tile+B-H]."""
    K = B // H
    M = (tile // H) // K
    chans = []
    for ch in range(2):
        groups = [xloc[ch, g * H : g * H + M * B].reshape(M, B) for g in range(K)]
        chans.append(jnp.stack(groups, axis=0).reshape(K * M, B))
    return chans, K, M


def _fold_store(work, rec3, B, H, K, M):
    """Scratch-accumulate fold: add each group's flat [3, M*B] into the
    shared work ref at its static offset g*H."""
    rec = rec3.reshape(3, K, M * B)
    glen = M * B
    for g in range(K):
        off = g * H
        work[:, off : off + glen] += rec[:, g]


def _fold(rec3, B, H, K, M, tile, width):
    """rec3 [3, K*M, B] (group-major) -> folded [3, width] (width >= tile+B-H)."""
    rec = rec3.reshape(3, K, M * B)
    if _PROF_NOFOLD:  # profiling only: 1 pad, no shifted adds
        return jnp.pad(rec[:, 0], ((0, 0), (0, width - M * B)))
    spill_b = B - H
    total = tile + spill_b
    out = None
    for g in range(K):
        part = jnp.pad(rec[:, g], ((0, 0), (g * H, total - g * H - M * B)))
        out = part if out is None else out + part
    if width > total:
        out = jnp.pad(out, ((0, 0), (0, width - total)))
    return out


def _direct_tile(sub: _DirectSub, xloc, refs, tile, width, work=None):
    wf_hi, wf_lo, wi_hi, wi_lo, g_ref = refs
    B, H = sub.B, sub.H
    Kb = sub.gains.shape[1]
    chans, K, M = _frames_of(xloc, B, H, tile)
    F = K * M
    # Channels stacked on the sublanes: one forward dot for both.
    s2 = _dot3(
        jnp.concatenate(chans, axis=0), wf_hi[...], wf_lo[...]
    )  # [2F, 2Kb]
    sl, sr = s2[:F], s2[F:]
    gains_list = [g_ref[b, :] for b in range(sub.gains.shape[0])]
    c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
        sl[:, :Kb], sl[:, Kb:], sr[:, :Kb], sr[:, Kb:], gains_list
    )
    # The three outputs stacked on the sublanes: one inverse dot.
    s = jnp.concatenate(
        [
            jnp.concatenate([c_re, c_im], axis=1),
            jnp.concatenate([l_re, l_im], axis=1),
            jnp.concatenate([r_re, r_im], axis=1),
        ],
        axis=0,
    )  # [3F, 2Kb]
    rec = _dot3(s, wi_hi[...], wi_lo[...])  # [3F, B] (sw folded)
    if work is not None:
        _fold_store(work, rec.reshape(3, F, B), B, H, K, M)
        return None
    return _fold(rec.reshape(3, F, B), B, H, K, M, tile, width)


def _dot3l(a_hi, a_lo, b):
    """bf16x3 matmul with the LEFT operand pre-split (constant weights):
    the activation b is split at runtime.  Mirror of _dot3 (which pre-
    splits the right operand)."""
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)


def _dot3l_paired(a_pair, a_hi, b):
    """Paired-pass form of _dot3l (see _DOT_PAIRED): a_pair = [hi ; lo]
    rows-stacked constant; ONE tall dot computes hi*b_hi and lo*b_hi,
    summed by a row-half add, plus one dot for hi*b_lo.  Identical
    products, 2 MXU invocations instead of 3."""
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)
    q = d(a_pair, b_hi)  # [2M, N]
    m = a_pair.shape[0] // 2
    return q[:m] + q[m:] + d(a_hi, b_lo)


def _dot3_paired(a, b_pair, b_hi):
    """Paired-pass form of _dot3: b_pair = [hi | lo] lane-concatenated
    constant; ONE wide dot computes a_hi*b_hi and a_hi*b_lo side by side,
    summed by a lane-half add, plus one dot for a_lo*b_hi."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)
    p = d(a_hi, b_pair)  # [M, 2N]
    n = b_pair.shape[1] // 2
    return p[:, :n] + p[:, n:] + d(a_lo, b_hi)


def _bd_tile_ls(sub: _TwoStageBdSub, xloc, refs, tile, width, work=None):
    """Lane-stacked variant of _bd_tile (see _LANE_STACK): ONE dot chain
    carries every start, with start-major lane blocks throughout.  Same
    products as the per-start loop; 18 MXU invocations per sub instead
    of 18 per start."""
    (aw2, sw3, w1s_hi, w1s_lo, twr2, twi2, d2b_hi, d2b_lo, e2b_hi, e2b_lo,
     twr3, twi3, winv, w1i_hi, w1i_lo, g_ref) = refs
    B, H, N2, M, S = sub.B, sub.H, sub.n2, sub.M, sub.lane_stack
    rows_t = M * sub.n1
    rows = M * sub.R
    Cw = sub.gains_rep.shape[2]  # = S * C
    C1 = Cw // S
    glen = M * B
    gains_list = [g_ref[b] for b in range(sub.gains_rep.shape[0])]

    # Stacked input: per start [Z_L | Z_R], starts major — matches the
    # S-fold tiling of every elementwise constant.
    zparts = []
    for start in sub.starts:
        zparts.append(xloc[0, start : start + glen].reshape(rows_t, N2))
        zparts.append(xloc[1, start : start + glen].reshape(rows_t, N2))
    Z = jnp.concatenate(zparts, axis=1)  # [rows_t, S*2N2]
    if not _PROF_NOWIN:
        Z = Z * aw2[...]
    if _DOT_PAIRED:
        As = _dot3l_paired(w1s_hi[...], w1s_lo[...], Z)
    else:
        As = _dot3l(w1s_hi[...], w1s_lo[...], Z)  # [2*rows, S*2N2]
    a_re, a_im = As[:rows], As[rows:]
    if _PROF_NOTW:
        b_re, b_im = a_re, a_im
    else:
        b_re = a_re * twr2[...] - a_im * twi2[...]
        b_im = a_re * twi2[...] + a_im * twr2[...]
    p1 = _dot3(b_re, d2b_hi[...], d2b_lo[...])  # [rows, 4*Cw (+pad)]
    p2 = _dot3(b_im, d2b_hi[...], d2b_lo[...])
    sl = (p1[:, :Cw] - p2[:, Cw : 2 * Cw], p1[:, Cw : 2 * Cw] + p2[:, :Cw])
    sr = (
        p1[:, 2 * Cw : 3 * Cw] - p2[:, 3 * Cw : 4 * Cw],
        p1[:, 3 * Cw : 4 * Cw] + p2[:, 2 * Cw : 3 * Cw],
    )
    c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
        sl[0], sl[1], sr[0], sr[1], gains_list
    )
    w = winv[...]
    s_parts_re = [c_re * w, l_re * w, r_re * w]
    s_parts_im = [c_im * w, l_im * w, r_im * w]
    if _DOT_PADN and 3 * Cw < 128:
        zpad = jnp.zeros((rows, 128 - 3 * Cw), jnp.float32)
        s_parts_re.append(zpad)
        s_parts_im.append(zpad)
    S_re = jnp.concatenate(s_parts_re, axis=1)  # [rows, 3*Cw (+pad)]
    S_im = jnp.concatenate(s_parts_im, axis=1)
    if _E2_SPLIT4:
        # Four dots from weight-half REF slices: outputs land directly in
        # t-layout (no result slicing, no concats).
        h = 3 * S * N2
        ehr, elr = e2b_hi[:, :h], e2b_lo[:, :h]
        ehi, eli = e2b_hi[:, h:], e2b_lo[:, h:]
        q1r = _dot3(S_re, ehr, elr)
        q1i = _dot3(S_re, ehi, eli)
        q2r = _dot3(S_im, ehr, elr)
        q2i = _dot3(S_im, ehi, eli)
        t_re = q1r - q2i
        t_im = q1i + q2r
        q1 = q2 = None
    elif _DOT_PAIRED:
        q1 = _dot3_paired(S_re, e2b_hi[...], e2b_lo[...])
        q2 = _dot3_paired(S_im, e2b_hi[...], e2b_lo[...])
    else:
        q1 = _dot3(S_re, e2b_hi[...], e2b_lo[...])  # [rows, S*6N2]
        q2 = _dot3(S_im, e2b_hi[...], e2b_lo[...])
    # Regroup across starts: (s, o)-major N2 slices — the layout the
    # S-fold tiled twr3/twi3 constants expect.
    def regroup(q, off):
        return jnp.concatenate(
            [
                q[:, s * 6 * N2 + o * 2 * N2 + off : s * 6 * N2 + o * 2 * N2 + off + N2]
                for s in range(S)
                for o in range(3)
            ],
            axis=1,
        )

    if _E2_SPLIT4:
        pass  # t_re/t_im already produced in final layout above
    elif _PROF_NOREGROUP:
        t_re, t_im = q1[:, : 3 * S * N2], q2[:, : 3 * S * N2]
    elif _E2_HALVES:
        # [all-re | all-im] halves: zero concats, four half-slices.
        h = 3 * S * N2
        t_re = q1[:, :h] - q2[:, h:]
        t_im = q1[:, h:] + q2[:, :h]
    else:
        t_re = regroup(q1, 0) - regroup(q2, N2)
        t_im = regroup(q1, N2) + regroup(q2, 0)
    if _PROF_NOTW:
        u_re, u_im = t_re, t_im
    else:
        u_re = t_re * twr3[...] + t_im * twi3[...]
        u_im = t_im * twr3[...] - t_re * twi3[...]
    u = jnp.concatenate([u_re, u_im], axis=0)  # [2*rows, S*3N2]
    if _DOT_PAIRED:
        y = _dot3l_paired(w1i_hi[...], w1i_lo[...], u)
    else:
        y = _dot3l(w1i_hi[...], w1i_lo[...], u)  # [rows_t, S*3N2]
    if not _PROF_NOWIN:
        y = y * sw3[...]
    out = None
    for si, start in enumerate(sub.starts):
        ys = y[:, si * 3 * N2 : (si + 1) * 3 * N2]
        rec = jnp.concatenate(
            [ys[:, o * N2 : (o + 1) * N2].reshape(1, glen) for o in range(3)],
            axis=0,
        )  # [3, glen]
        if work is not None:
            work[:, start : start + glen] += rec
            continue
        if _PROF_NOFOLD:
            out = rec if out is None else out + rec
            continue
        part = jnp.pad(rec, ((0, 0), (start, width - start - glen)))
        out = part if out is None else out + part
    if work is not None:
        return None
    if _PROF_NOFOLD:
        out = jnp.pad(out, ((0, 0), (0, width - out.shape[1])))
    return out


def _bd_tile(sub: _TwoStageBdSub, xloc, refs, tile, width, work=None):
    """One tile's contribution from a batched block-diagonal 2-stage sub.

    Per group g: glen = M*B samples at offset g*H, reshaped [M*N1, 128]
    (zero-copy, native lane width), pushed through left-multiplied
    block-diagonal stage-1, banded stage-2, gains+mask, and the inverse —
    every matmul carries all M frames at once, and no transposes appear
    anywhere.  The group flat [3, M*B] folds at offset g*H.
    """
    (aw2, sw3, w1s_hi, w1s_lo, twr2, twi2, d2b_hi, d2b_lo, e2b_hi, e2b_lo,
     twr3, twi3, winv, w1i_hi, w1i_lo, g_ref) = refs
    B, H, N2, M = sub.B, sub.H, sub.n2, sub.M
    rows_t = M * sub.n1  # time-domain rows
    rows = M * sub.R  # spectral rows (stage-1 restricted to kept bins)
    C = sub.gains_rep.shape[2]  # kept columns (e2b rows may be padded)
    glen = M * B
    gains_list = [g_ref[b] for b in range(sub.gains_rep.shape[0])]
    out = None
    for start in sub.starts:
        # Forward: both channels in the lanes of one chain.
        Z = jnp.concatenate(
            [
                xloc[0, start : start + glen].reshape(rows_t, N2),
                xloc[1, start : start + glen].reshape(rows_t, N2),
            ],
            axis=1,
        )  # [rows_t, 2*N2]
        if not _PROF_NOWIN:
            Z = Z * aw2[...]
        if _DOT_PAIRED:
            As = _dot3l_paired(w1s_hi[...], w1s_lo[...], Z)
        else:
            As = _dot3l(w1s_hi[...], w1s_lo[...], Z)  # [2*rows, 2*N2]
        a_re, a_im = As[:rows], As[rows:]
        if _PROF_NOTW:  # profiling only: skip the twiddle rotation
            b_re, b_im = a_re, a_im
        else:
            b_re = a_re * twr2[...] - a_im * twi2[...]
            b_im = a_re * twi2[...] + a_im * twr2[...]
        if _PROF_NOTINY:  # profiling only: fabricate p1/p2 without the
            # [.., 2N2] x [2N2, 4C] stage-2 dots.  Lane-slices of the
            # existing wide tensors, NOT zeros+broadcast: fresh tiny-lane
            # layouts crash Mosaic's vector layout pass on real hardware
            # ("limits[i] <= dim(i)" SIGABRT).
            p1 = b_re[:, : 4 * C] * 0.5
            p2 = b_im[:, : 4 * C] * 0.5
        elif _DOT_STACKED or _DOT_STACKED_P:  # p1/p2 share d2b: one row-stacked dot
            p12 = _dot3(
                jnp.concatenate([b_re, b_im], axis=0), d2b_hi[...], d2b_lo[...]
            )  # [2*rows, 4C]
            p1, p2 = p12[:rows], p12[rows:]
        else:
            p1 = _dot3(b_re, d2b_hi[...], d2b_lo[...])  # [rows, 4C]
            p2 = _dot3(b_im, d2b_hi[...], d2b_lo[...])
        sl = (p1[:, :C] - p2[:, C : 2 * C], p1[:, C : 2 * C] + p2[:, :C])
        sr = (
            p1[:, 2 * C : 3 * C] - p2[:, 3 * C : 4 * C],
            p1[:, 3 * C : 4 * C] + p2[:, 2 * C : 3 * C],
        )
        c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
            sl[0], sl[1], sr[0], sr[1], gains_list
        )
        # Inverse: the three outputs in the lanes of one chain.
        w = winv[...]
        s_parts_re = [c_re * w, l_re * w, r_re * w]
        s_parts_im = [c_im * w, l_im * w, r_im * w]
        if _DOT_PADN and 3 * C < 128:
            # Widen to the padded e2b's 128 rows with a zero block (the
            # padded weight rows are zero, so the product is exact).
            zpad = jnp.zeros((rows, 128 - 3 * C), jnp.float32)
            s_parts_re.append(zpad)
            s_parts_im.append(zpad)
        S_re = jnp.concatenate(s_parts_re, axis=1)  # [rows, 3C (+pad)]
        S_im = jnp.concatenate(s_parts_im, axis=1)
        if _PROF_NOTINY:  # profiling only: fabricate q1/q2 without the
            # [.., 3C] x [3C, 6N2] stage-B dots (wide-tensor concats keep
            # the layouts Mosaic already handles; see p1/p2 note)
            q1 = jnp.concatenate([b_re, b_re, b_re], axis=1)  # [rows, 6N2]
            q2 = jnp.concatenate([b_im, b_im, b_im], axis=1)
            # Keep the mask chain live (else DCE removes it and the
            # variant conflates tiny-dots with the whole mask): a full
            # reduction to scalar is layout-safe.
            s_dep = (jnp.sum(S_re) + jnp.sum(S_im)) * 1e-30
            q1 = q1 + s_dep
            q2 = q2 + s_dep
        elif _DOT_STACKED:  # q1/q2 share e2b: one row-stacked dot
            S_all = jnp.concatenate([S_re, S_im], axis=0)  # [2*rows, 3C]
            if _DOT_PAIRED:
                q12 = _dot3_paired(S_all, e2b_hi[...], e2b_lo[...])
            else:
                q12 = _dot3(S_all, e2b_hi[...], e2b_lo[...])
            q1, q2 = q12[:rows], q12[rows:]
        elif _DOT_PAIRED:
            q1 = _dot3_paired(S_re, e2b_hi[...], e2b_lo[...])
            q2 = _dot3_paired(S_im, e2b_hi[...], e2b_lo[...])
        else:
            q1 = _dot3(S_re, e2b_hi[...], e2b_lo[...])  # [rows, 6*N2]
            q2 = _dot3(S_im, e2b_hi[...], e2b_lo[...])
        # Per output o the lane block is [o*2N2, (o+1)*2N2) with re then im
        # halves; regroup into u_re/u_im of 3*N2 lanes each.
        if _PROF_NOREGROUP:  # profiling only: skip the 12-slice regroup
            t_re, t_im = q1[:, : 3 * N2], q2[:, : 3 * N2]
        else:
            q1_re = jnp.concatenate([q1[:, o * 2 * N2 : o * 2 * N2 + N2] for o in range(3)], axis=1)
            q1_im = jnp.concatenate([q1[:, o * 2 * N2 + N2 : (o + 1) * 2 * N2] for o in range(3)], axis=1)
            q2_re = jnp.concatenate([q2[:, o * 2 * N2 : o * 2 * N2 + N2] for o in range(3)], axis=1)
            q2_im = jnp.concatenate([q2[:, o * 2 * N2 + N2 : (o + 1) * 2 * N2] for o in range(3)], axis=1)
            t_re = q1_re - q2_im
            t_im = q1_im + q2_re
        if _PROF_NOTW:
            u_re, u_im = t_re, t_im
        else:
            u_re = t_re * twr3[...] + t_im * twi3[...]
            u_im = t_im * twr3[...] - t_re * twi3[...]
        u = jnp.concatenate([u_re, u_im], axis=0)  # [2*rows, 3*N2]
        if _DOT_PAIRED:
            y = _dot3l_paired(w1i_hi[...], w1i_lo[...], u)
        else:
            y = _dot3l(w1i_hi[...], w1i_lo[...], u)  # [rows_t, 3*N2]
        if not _PROF_NOWIN:
            y = y * sw3[...]
        rec = jnp.concatenate(
            [y[:, o * N2 : (o + 1) * N2].reshape(1, glen) for o in range(3)],
            axis=0,
        )  # [3, glen]
        if work is not None:
            work[:, start : start + glen] += rec
            continue
        if _PROF_NOFOLD:  # profiling only: drop the shifted pad-add
            out = rec if out is None else out + rec
            continue
        part = jnp.pad(rec, ((0, 0), (start, width - start - glen)))
        out = part if out is None else out + part
    if work is not None:
        return None
    if _PROF_NOFOLD:
        out = jnp.pad(out, ((0, 0), (0, width - out.shape[1])))
    return out


def _build_kernel(plan: OmnibusPlan, fold_scratch: bool = False):
    tile, halo, n_tiles = plan.tile, plan.halo, plan.n_tiles
    n_views = plan.n_views
    subs = plan.subs
    counts = [len(s.arrays) for s in subs]

    def kernel(*refs):
        x_views = refs[:n_views]
        pos = n_views
        sub_refs = []
        for c in counts:
            sub_refs.append(refs[pos : pos + c])
            pos += c
        out_ref, spill_ref, acc = refs[pos], refs[pos + 1], refs[pos + 2]
        work = refs[pos + 3] if fold_scratch else None

        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # Slice the LAST view down to the halo remainder BEFORE the concat
        # (concat-then-slice leaves Mosaic with mismatched vector offsets).
        rem = tile + halo - (n_views - 1) * tile
        parts = [xv[0] for xv in x_views[:-1]]
        parts.append(x_views[-1][0] if rem == tile else x_views[-1][0][:, :rem])
        xloc = jnp.concatenate(parts, axis=1)

        # Per-tile cost is dominated by vector ops whose width is the fold
        # width, so each sub folds at its NATURAL width (tile + own spill,
        # rounded up to the lane width) and the merge concatenates rather
        # than padding everything to tile + halo (measured: full-width
        # folds cost ~20 us/tile at halo 49152).  Widest first.
        order = sorted(
            range(len(subs)), key=lambda k: -(subs[k].B - subs[k].H)
        )
        if fold_scratch:
            # Scratch-accumulate dataflow: one zero-fill, then every sub
            # adds its flats in place at static offsets — no per-start
            # pad-to-width, no cross-sub merge concats.
            work[...] = jnp.zeros_like(work)
            for k in order:
                sub, srefs = subs[k], sub_refs[k]
                if isinstance(sub, _DirectSub):
                    _direct_tile(sub, xloc, srefs, tile, None, work=work)
                elif sub.lane_stack > 1:
                    _bd_tile_ls(sub, xloc, srefs, tile, None, work=work)
                else:
                    _bd_tile(sub, xloc, srefs, tile, None, work=work)
            total = work[...]
            total = jnp.concatenate(
                [total[:, :halo] + acc[...], total[:, halo:]], axis=1
            )
            out_ref[0] = total[:, :tile]
            acc[...] = total[:, tile:]

            @pl.when(i == n_tiles - 1)
            def _():
                spill_ref[0] = total[:, tile:]

            return
        total = None
        for k in order:
            sub, srefs = subs[k], sub_refs[k]
            w_nat = tile + (sub.B - sub.H)
            w_nat = -(-w_nat // 128) * 128  # lane-align the merge boundary
            # The rounding must not overshoot the full width (halo itself
            # may be lane-unaligned for tiny configs).
            w_nat = min(w_nat, tile + halo)
            if isinstance(sub, _DirectSub):
                contrib = _direct_tile(sub, xloc, srefs, tile, w_nat)
            elif not isinstance(sub, _DirectSub) and sub.lane_stack > 1:
                contrib = _bd_tile_ls(sub, xloc, srefs, tile, w_nat)
            else:
                contrib = _bd_tile(sub, xloc, srefs, tile, w_nat)
            if total is None:
                pad = tile + halo - w_nat
                total = (
                    jnp.pad(contrib, ((0, 0), (0, pad))) if pad else contrib
                )
            elif w_nat == total.shape[1]:
                total = total + contrib
            else:
                total = jnp.concatenate(
                    [total[:, :w_nat] + contrib, total[:, w_nat:]], axis=1
                )

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
    n_views = plan.n_views
    n_seg = x.shape[0]
    need = plan.chunk + (n_views - 1) * tile
    pad = need - x.shape[-1]
    if pad < 0:
        raise ValueError(f"x too long: {x.shape[-1]} > {need}")
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))

    w_arrays = plan.arrays()
    in_specs = [
        pl.BlockSpec(
            (1, 2, tile), lambda s, i, v=v: (s, 0, i + v), memory_space=pltpu.VMEM
        )
        for v in range(n_views)
    ]
    for w in w_arrays:
        zeros = (0,) * w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda s, i, z=zeros: z, memory_space=pltpu.VMEM)
        )

    scratch = [pltpu.VMEM((3, halo), jnp.float32)]
    if _FOLD_SCRATCH:
        scratch.append(pltpu.VMEM((3, tile + halo), jnp.float32))
    call = pl.pallas_call(
        _build_kernel(plan, fold_scratch=_FOLD_SCRATCH),
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
        scratch_shapes=scratch,
        # With big subs aboard (weights + per-frame transients for a
        # B > tile frame) the kernel needs ~19 MB of scoped VMEM — above
        # the 16 MB default, comfortably under the v5e core's capacity.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )
    return call(*([xp] * n_views), *[jnp.asarray(w) for w in w_arrays])


def omnibus_lcr(x: jnp.ndarray, plan: OmnibusPlan, interpret: bool = False):
    """Single segment: x [2, chunk + halo] -> (main [3, chunk], spill [3, halo])."""
    main, spill = omnibus_lcr_batch(x[None], plan, interpret=interpret)
    return main[0], spill[0]
