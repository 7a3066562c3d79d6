"""Offline (whole-file) multiband upmix pipeline — the flagship model.

TPU-first re-design of the reference's offline path
(center_extraction.py:426-513).  Instead of a per-band ThreadPoolExecutor
running sequential hop loops, the entire job is ONE jitted program:

  - Bands are bucketed by block size (config.bucket_bands); each bucket's
    frames are extracted once, windowed, and rFFT'd as a single batched
    transform shared by all bands in the bucket.
  - Per-band band-limit gains and the center-extraction mask are fused
    elementwise math batched over the bucket's band axis; the band sum is
    taken IN THE SPECTRAL DOMAIN (linearity of the iSTFT), so each bucket
    needs only 2 forward + 3 inverse FFTs regardless of band count —
    versus 2+3 per band per hop in the reference.
  - Overlap-add is a static pad-sum fold (ops.framing.overlap_add); the
    reference's accumulator state machine disappears.

Numerics: float32 / complex64 throughout (the reference's C++ path is
float32; the Python path is float64 — parity is by SNR, with ≈140 dB of
margin in the WOLA round-trip per SURVEY.md §6).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from upmix_tpu.config import UpmixConfig, bucket_bands
from upmix_tpu.ops.framing import frame_signal, offline_frame_plan, overlap_add
from upmix_tpu.ops.gains import band_gain_curve
from upmix_tpu.ops.mask import center_mask
from upmix_tpu.ops.windows import design_wola_synthesis_window, make_window


@dataclass(frozen=True)
class _BucketPlan:
    block_size: int
    hop_size: int
    num_frames: int
    total_padded: int
    analysis_window: np.ndarray  # [block]
    synthesis_window: np.ndarray  # [block]
    gains: np.ndarray  # [n_bands_in_bucket, n_bins]


def _plan_buckets(config: UpmixConfig, n_samples: int):
    plans = []
    for block_size, bands in bucket_bands(config.bands).items():
        hop = bands[0].hop_size
        num_frames, total_padded = offline_frame_plan(n_samples, block_size, hop)
        aw = make_window(config.window, block_size)
        if config.synthesis == "wola":
            sw = design_wola_synthesis_window(aw, config.overlap)
        elif config.synthesis == "analysis":
            sw = aw
        else:
            raise ValueError(f"unknown synthesis mode {config.synthesis!r}")
        gains = np.stack([band_gain_curve(b, dtype=np.float32) for b in bands])
        plans.append(
            _BucketPlan(
                block_size=block_size,
                hop_size=hop,
                num_frames=num_frames,
                total_padded=total_padded,
                analysis_window=aw,
                synthesis_window=sw,
                gains=gains,
            )
        )
    return plans


def _bucket_lcr(plan: _BucketPlan, L: jnp.ndarray, R: jnp.ndarray, n_samples: int):
    """One bucket's (C, Ls, Rs) time-domain contribution, length n_samples.

    L, R: [n] float32.  Shapes are static; everything fuses under jit.
    """
    pad = plan.total_padded - n_samples
    x = jnp.stack([L, R])  # [2, n]
    x = jnp.pad(x, ((0, 0), (0, pad)))
    frames = frame_signal(x, plan.block_size, plan.hop_size, plan.num_frames)
    frames = frames * jnp.asarray(plan.analysis_window)
    spec = jnp.fft.rfft(frames)  # [2, F, n_bins] complex64
    gains = jnp.asarray(plan.gains)[:, None, :]  # [B, 1, n_bins]
    spec_l = spec[0][None, :, :] * gains
    spec_r = spec[1][None, :, :] * gains
    spec_c, spec_ls, spec_rs = center_mask(spec_l, spec_r)
    # Band sum in the spectral domain (iSTFT is linear).
    summed = jnp.stack(
        [spec_c.sum(axis=0), spec_ls.sum(axis=0), spec_rs.sum(axis=0)]
    )  # [3, F, n_bins]
    rec = jnp.fft.irfft(summed, n=plan.block_size)  # [3, F, block] float32
    rec = rec * jnp.asarray(plan.synthesis_window)
    folded = overlap_add(rec, plan.hop_size)  # [3, total_padded]
    return folded[:, :n_samples]


def build_offline_fn(config: UpmixConfig, n_samples: int):
    """Build the (un-jitted) whole-file processing function for a fixed
    input length.  Returns fn(L, R) -> (C, Ls, Rs), each [n_samples] f32."""
    plans = _plan_buckets(config, n_samples)

    def fn(L: jnp.ndarray, R: jnp.ndarray):
        L = L.astype(jnp.float32)
        R = R.astype(jnp.float32)
        acc = None
        for plan in plans:
            contrib = _bucket_lcr(plan, L, R, n_samples)
            acc = contrib if acc is None else acc + contrib
        return acc[0], acc[1], acc[2]

    return fn


class Upmixer:
    """Config-specialized offline upmixer with a per-length jit cache.

    Distinct input lengths trigger recompilation (static shapes are what
    lets XLA tile the FFTs and fuse the pipeline); `pad_granularity` rounds
    lengths up to bound the number of compiled variants.
    """

    def __init__(self, config: UpmixConfig, pad_granularity: int = 1):
        self.config = config
        self.pad_granularity = max(1, int(pad_granularity))
        self._cache = {}

    def _compiled(self, n_padded: int):
        fn = self._cache.get(n_padded)
        if fn is None:
            fn = jax.jit(build_offline_fn(self.config, n_padded))
            self._cache[n_padded] = fn
        return fn

    def process(self, L, R):
        """stereo in → (C, Ls, Rs) out, each a length-len(L) jax array."""
        n = len(L)
        g = self.pad_granularity
        n_padded = -(-n // g) * g
        L = jnp.asarray(L, dtype=jnp.float32)
        R = jnp.asarray(R, dtype=jnp.float32)
        if n_padded != n:
            L = jnp.pad(L, (0, n_padded - n))
            R = jnp.pad(R, (0, n_padded - n))
        c, ls, rs = self._compiled(n_padded)(L, R)
        return c[:n], ls[:n], rs[:n]

    def process_np(self, L, R):
        c, ls, rs = self.process(L, R)
        return np.asarray(c), np.asarray(ls), np.asarray(rs)


def upmix_offline(L, R, config: UpmixConfig):
    """One-shot convenience wrapper (numpy in/out)."""
    return Upmixer(config).process_np(np.asarray(L), np.asarray(R))
