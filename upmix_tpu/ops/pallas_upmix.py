"""Pallas fused bucket engine — the whole per-bucket pipeline in one kernel.

For small-block buckets the XLA direct-DFT path still materializes the 4x
overlapped frame tensor, the masked spectra, and the reconstructed frames
in HBM (~35 input-widths of traffic).  This kernel fuses framing, the
windowed forward DFT (MXU dot against the precomputed [B, 2K] weight
slice), the per-band gain + center-extraction mask, the inverse DFT
([2K, B], synthesis window folded in), and the overlap-add fold — reading
the input once and writing the folded output once.

Structure (TPU pallas semantics):
  - grid over tiles of TF consecutive frames; grid steps execute
    sequentially on the TensorCore, so the OLA spill between tiles lives
    in VMEM scratch carried across steps (initialized at step 0).
  - the input is passed TWICE with offset block indices (tile i and
    i + 1): the second view provides the B-H lookahead samples that the
    tile's last frames need — overlapping reads without manual DMA.
  - within a tile, frames with index ≡ g (mod K) are contiguous, so
    framing is K reshapes of the VMEM-resident tile.
  - outputs: the folded main region [3, TF*H] per tile (non-overlapping
    block writes) plus the final tile's spill [3, B-H].

Used for buckets whose DFT weight slices fit comfortably in VMEM
(B*2K*4 bytes per direction; models/offline.py gates on
_PALLAS_WEIGHT_BYTES = 7 MB per direction).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upmix_tpu.config import EPS


@dataclass(frozen=True)
class FusedPlan:
    block_size: int
    hop_size: int
    tile_frames: int  # TF, multiple of K = block/hop
    n_tiles: int
    chunk: int  # TF*H*n_tiles == total fresh output samples
    # DFT weight slices pre-split into bf16 hi/lo pairs (bf16x3 matmuls
    # without in-kernel splitting — halves the VMEM high-water mark).
    wf_hi: np.ndarray  # [B, 2K] bf16
    wf_lo: np.ndarray
    wi_hi: np.ndarray  # [2K, B] bf16
    wi_lo: np.ndarray
    gains: np.ndarray  # [nb, K]


def _split_bf16(w: np.ndarray):
    import jax.numpy as _jnp

    hi = np.asarray(w, np.float32).astype(_jnp.bfloat16)
    lo = (np.asarray(w, np.float32) - np.asarray(hi, np.float32)).astype(
        _jnp.bfloat16
    )
    return np.asarray(hi), np.asarray(lo)


def make_fused_plan(
    block_size: int,
    hop_size: int,
    chunk: int,
    w_fwd: np.ndarray,
    w_inv: np.ndarray,
    gains: np.ndarray,
    tile_samples: int = 2**15,
) -> FusedPlan:
    B, H = block_size, hop_size
    K = B // H
    frames = chunk // H
    tf = max(K, min(frames, tile_samples // H))
    # TF must divide the frame count and be a multiple of K (powers of two).
    while frames % tf:
        tf //= 2
    tf = max(tf, K)
    if frames % tf or tf % K:
        raise ValueError(f"cannot tile {frames} frames with K={K}")
    wf_hi, wf_lo = _split_bf16(w_fwd)
    wi_hi, wi_lo = _split_bf16(w_inv)
    return FusedPlan(
        block_size=B,
        hop_size=H,
        tile_frames=tf,
        n_tiles=frames // tf,
        chunk=chunk,
        wf_hi=wf_hi,
        wf_lo=wf_lo,
        wi_hi=wi_hi,
        wi_lo=wi_lo,
        gains=np.ascontiguousarray(gains, np.float32),
    )


def _dot_f32(a, b_hi, b_lo):
    """f32-grade matmul inside a Mosaic kernel.

    Mosaic lowers a plain f32 jnp.dot as a single bf16 MXU pass (~8
    mantissa bits -> ~53 dB pipeline SNR, below the 60 dB bar), and the
    XLA `precision` knob does not reach the Mosaic lowering.  bf16x3:
    split the activation into hi+lo bf16 parts (weights arrive pre-split)
    and accumulate three partial products in f32 (~1e-6 relative error)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _mask_soa(slre, slim, srre, srim):
    """Center-extraction mask on separate re/im parts (reference math)."""
    magl = jnp.sqrt(slre * slre + slim * slim)
    magr = jnp.sqrt(srre * srre + srim * srim)
    cross = magl * magr  # |L * conj(R)| == |L| |R|
    coh = cross / (cross + EPS)
    bal = (magl - magr) / (magl + magr + EPS)
    f = 0.5 * coh * (1.0 - jnp.abs(bal))
    cre = f * (slre + srre)
    cim = f * (slim + srim)
    return cre, cim


def _mask_sum(slre, slim, srre, srim, gains_list):
    """Per-band gain + mask + band sum on SoA spectra (shared by every
    pallas kernel — keep the precision-critical math in ONE place)."""
    c_re = c_im = l_re = l_im = r_re = r_im = 0.0
    for g in gains_list:
        glre, glim = slre * g, slim * g
        grre, grim = srre * g, srim * g
        cre, cim = _mask_soa(glre, glim, grre, grim)
        c_re = c_re + cre
        c_im = c_im + cim
        l_re = l_re + (glre - cre)
        l_im = l_im + (glim - cim)
        r_re = r_re + (grre - cre)
        r_im = r_im + (grim - cim)
    return c_re, c_im, l_re, l_im, r_re, r_im


def _kernel(plan: FusedPlan):
    B, H, TF = plan.block_size, plan.hop_size, plan.tile_frames
    K = B // H
    M = TF // K
    nb, Kb = plan.gains.shape
    tile = TF * H
    spill = B - H
    n_tiles = plan.n_tiles

    def kernel(
        x_ref, x_next_ref, wfh_ref, wfl_ref, wih_ref, wil_ref, g_ref,
        out_ref, spill_ref, acc,
    ):
        # Grid is (segments, tiles) — tiles iterate fastest; the OLA spill
        # carry resets at each segment's first tile (segments are
        # independent; their spills recombine outside the kernel).
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # Tile-local signal: TF*H fresh samples + B-H lookahead.
        xloc = jnp.concatenate([x_ref[0], x_next_ref[0, :, :spill]], axis=1)

        # Frames (natural order j = g + K*m within the tile): group g holds
        # frames starting at g*H, stride B — contiguous slices.
        specs = []
        for ch in range(2):
            groups = [
                xloc[ch, g * H : g * H + M * B].reshape(M, B) for g in range(K)
            ]
            fr = jnp.stack(groups, axis=0).reshape(K * M, B)  # [K, M] order
            specs.append(_dot_f32(fr, wfh_ref[...], wfl_ref[...]))
        sl, sr = specs  # [K*M, 2K]
        slre, slim = sl[:, :Kb], sl[:, Kb:]
        srre, srim = sr[:, :Kb], sr[:, Kb:]

        # Per-band gain + mask, band-summed (static unroll over bands).
        c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
            slre, slim, srre, srim, [g_ref[b, :] for b in range(nb)]
        )

        recs = []
        for sre, sim in ((c_re, c_im), (l_re, l_im), (r_re, r_im)):
            s = jnp.concatenate([sre, sim], axis=1)  # [K*M, 2K]
            recs.append(_dot_f32(s, wih_ref[...], wil_ref[...]))
        rec = jnp.stack(recs)  # [3, K*M, B], synthesis-windowed

        # Fold within the tile: group flats + K shifted adds -> [3, tile+spill].
        rec = rec.reshape(3, K, M * B)
        total = tile + spill
        folded = jnp.zeros((3, total), jnp.float32)
        for g in range(K):
            part = jnp.pad(rec[:, g], ((0, 0), (g * H, total - g * H - M * B)))
            folded = folded + part

        # (.at[].add lowers to scatter-add, which Mosaic lacks — concat.)
        folded = jnp.concatenate(
            [folded[:, :spill] + acc[...], folded[:, spill:]], axis=1
        )
        out_ref[0] = folded[:, :tile]
        acc[...] = folded[:, tile:]

        @pl.when(i == n_tiles - 1)
        def _():
            spill_ref[0] = folded[:, tile:]

    return kernel


def _build_call(plan: FusedPlan, n_seg: int, interpret: bool):
    B, H, TF = plan.block_size, plan.hop_size, plan.tile_frames
    tile = TF * H
    spill = B - H
    nb, Kb = plan.gains.shape

    return pl.pallas_call(
        _kernel(plan),
        grid=(n_seg, plan.n_tiles),
        in_specs=[
            pl.BlockSpec((1, 2, tile), lambda s, i: (s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tile), lambda s, i: (s, 0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2 * Kb), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2 * Kb), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Kb, B), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Kb, B), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, Kb), lambda s, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, tile), lambda s, i: (s, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, spill), lambda s, i: (s, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_seg, 3, plan.chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_seg, 3, spill), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((3, spill), jnp.float32)],
        # Headroom above the 16 MB scoped default: the 4096 bucket's
        # direct weights alone are ~12.4 MB (hi/lo pairs), and co-residing
        # with other raised-limit kernels shifts the accounting.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )


def fused_bucket_lcr_batch(x: jnp.ndarray, plan: FusedPlan, interpret: bool = False):
    """Run the fused engine over a batch of independent segments in ONE
    kernel launch.

    x: [S, 2, chunk + B - H] float32 (each segment: fresh samples + right
    halo).  Returns (main [S, 3, chunk], spill [S, 3, B - H]) — spill[s]
    overlaps segment s+1's head (combine outside).
    """
    B, H = plan.block_size, plan.hop_size
    tile = plan.tile_frames * H
    need = plan.chunk + tile  # lookahead view needs one extra tile
    pad = need - x.shape[-1]
    if pad < 0:
        raise ValueError(f"x too long: {x.shape[-1]} > {need}")
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    call = _build_call(plan, x.shape[0], interpret)
    return call(
        xp,
        xp,
        jnp.asarray(plan.wf_hi),
        jnp.asarray(plan.wf_lo),
        jnp.asarray(plan.wi_hi),
        jnp.asarray(plan.wi_lo),
        jnp.asarray(plan.gains),
    )


def fused_bucket_lcr(x: jnp.ndarray, plan: FusedPlan, interpret: bool = False):
    """Single-segment convenience wrapper: x [2, chunk + B - H] ->
    (main [3, chunk], spill [3, B - H])."""
    main, spill = fused_bucket_lcr_batch(x[None], plan, interpret=interpret)
    return main[0], spill[0]
