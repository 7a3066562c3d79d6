"""Numeric feasibility of int8x3 split matmuls for the DFT transform pair.

Question: can the omnibus kernel's bf16x3 dots (70% of kernel time,
DESIGN.md 4c) be replaced by 3-pass int8 dots (v5e MXU int8 runs at 2x
the bf16 rate) without dropping below the 60 dB oracle bar?

Scheme per dot y = a @ W (mirrors _dot_f32's hi/lo structure):
  W  = s_w * (Wh + Wl/254)   s_w per-COLUMN  = max|W[:,j]|/127 (static)
  a  = s_a * (Ah + Al/254)   s_a per-ROW     = max|a[i,:]|/127 (runtime)
  y ~= s_a[:,None] * (Phh + (Phl + Plh)/254) * s_w[None,:]
with Phh = Ah@Wh etc accumulated in int32 (K<=1024 * 127^2 < 2^31 holds:
1024*16129 = 16.5M).  The dropped Al@Wl term is O(2^-16) relative.

This script is CPU-only numpy: it measures SNR of (a) a single forward
transform, (b) the fwd->mask->inv->WOLA-fold chain, vs float64, for the
int8x3 scheme and the existing bf16x3 scheme as calibration.  Run before
any pallas work; if the chain SNR is not comfortably >60 dB the idea is
dead at the numerics stage.
"""
from __future__ import annotations

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from upmix_tpu.ops.windows import make_blackman_harris
from upmix_tpu.ops.windows import design_wola_synthesis_window
from upmix_tpu.ops.dftmm import make_direct_plan


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    p = float(np.mean(ref * ref))
    e = float(np.mean(err * err))
    if e == 0.0:
        return np.inf
    return 10.0 * np.log10(p / max(e, 1e-300))


def split_int8(x, axis):
    """x ~= s*(H + L/254) with H,L int8, s = max|x|/127 along axis."""
    x = np.asarray(x, np.float64)
    s = np.max(np.abs(x), axis=axis, keepdims=True) / 127.0
    s = np.where(s == 0.0, 1.0, s)
    h = np.rint(x / s)
    h = np.clip(h, -127, 127)
    r = x - s * h
    l = np.rint(r / (s / 254.0))
    l = np.clip(l, -127, 127)
    return h.astype(np.int32), l.astype(np.int32), s


def dot_int8x3(a, w, wq=None):
    ah, al, sa = split_int8(a, axis=-1)  # per-row
    if wq is None:
        wq = split_int8(w, axis=0)  # per-column
    wh, wl, sw = wq
    phh = ah @ wh
    pcross = ah @ wl + al @ wh  # int32 adds before the single scale
    y = (phh.astype(np.float64) + pcross.astype(np.float64) / 254.0)
    return sa * y * sw


def split_bf16(x):
    import jax.numpy as jnp

    h = np.asarray(x, np.float32).astype(jnp.bfloat16)
    l = (np.asarray(x, np.float32) - np.asarray(h, np.float32)).astype(jnp.bfloat16)
    return np.asarray(h, np.float32), np.asarray(l, np.float32)


def dot_bf16x3(a, w):
    ah, al = split_bf16(a)
    wh, wl = split_bf16(w)
    return (ah @ wh + ah @ wl + al @ wh).astype(np.float64)


def mask_c(slre, slim, srre, srim, eps=1e-12):
    magl = np.sqrt(slre**2 + slim**2)
    magr = np.sqrt(srre**2 + srim**2)
    cross = magl * magr
    coh = cross / (cross + eps)
    bal = (magl - magr) / (magl + magr + eps)
    cf = coh * (1.0 - np.abs(bal))
    cre = 0.5 * cf * (slre + srre)
    cim = 0.5 * cf * (slim + srim)
    return cre, cim


def run_chain(n, lo_bin, hi_bin, dot, amp=1.0, seed=0, frames=64):
    rng = np.random.default_rng(seed)
    aw = make_blackman_harris(n)
    sw = design_wola_synthesis_window(aw, 0.75)
    plan = make_direct_plan(n, lo_bin, hi_bin, aw, sw)
    hop = n // 4
    nsamp = frames * hop + (n - hop)
    # correlated stereo: shared center + sides
    c = rng.standard_normal(nsamp)
    l = amp * (c + 0.5 * rng.standard_normal(nsamp)).astype(np.float64)
    r = amp * (c + 0.5 * rng.standard_normal(nsamp)).astype(np.float64)
    idx = np.arange(frames)[:, None] * hop + np.arange(n)[None, :]
    fl, fr = l[idx], r[idx]
    k = hi_bin - lo_bin + 1

    def chain(d):
        sl = d(fl, plan.w_fwd)
        sr = d(fr, plan.w_fwd)
        cre, cim = mask_c(sl[:, :k], sl[:, k:], sr[:, :k], sr[:, k:])
        spec_c = np.concatenate([cre, cim], axis=1)
        rec = d(spec_c, plan.w_inv)  # [frames, n]
        out = np.zeros(nsamp)
        for i in range(frames):
            out[i * hop : i * hop + n] += rec[i]
        return out

    exact = chain(lambda a, w: np.asarray(a, np.float64) @ np.asarray(w, np.float64))
    test = chain(dot)
    lo, hi = n, frames * hop - n  # steady state
    return snr_db(exact[lo:hi], test[lo:hi])


if __name__ == "__main__":
    cases = [
        ("1024 full", 1024, 0, 512),
        ("1024 band 45-178", 1024, 45, 178),
        ("256 band 45-128", 256, 45, 128),
        ("4096 band 12-45", 4096, 12, 45),
    ]
    for amp in (1.0, 1e-3):
        for name, n, lo, hi in cases:
            s_i8 = run_chain(n, lo, hi, dot_int8x3, amp=amp)
            s_bf = run_chain(n, lo, hi, dot_bf16x3, amp=amp)
            print(
                f"amp={amp:g} {name:18s} int8x3 {s_i8:7.1f} dB   "
                f"bf16x3 {s_bf:7.1f} dB"
            )
