"""Big-block pallas kernel: the streaming-OLA structure on TPU.

Buckets with very large blocks (65536 samples in the default config) can't
ride the omnibus kernel — tile-sized VMEM in/out blocks exceed the 16 MB
scoped budget.  This kernel instead keeps the input in HBM and walks the
frame axis like the reference's streaming engine: per grid step it DMAs
ONE frame window [2, B] into VMEM, runs the 2-stage banded transform
chain (stage-1 matmul, twiddle, banded stage-2, gain+mask, banded inverse,
synthesis window), accumulates into a VMEM OLA buffer, and emits one
hop-sized output block.  VMEM high-water is a few MB regardless of B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upmix_tpu.ops.pallas_omnibus import _TwoStageSub, _dot3, _mask_sum


def _make_sub(p) -> _TwoStageSub:
    from upmix_tpu.ops.fftmm import make_real_banded_plan, permute_half_bins
    from upmix_tpu.ops.pallas_omnibus import _bf16_pair

    B = p.block_size
    nz = np.nonzero(p.gains.max(axis=0))[0]
    lo, hi = (int(nz[0]), int(nz[-1])) if len(nz) else (0, 0)
    rp = make_real_banded_plan(B, lo, hi)
    d1s = np.concatenate([rp.d1r, rp.d1i], axis=0)
    d2 = np.concatenate([rp.d2r, rp.d2i], axis=1)
    e2 = np.concatenate([rp.e2r, rp.e2i], axis=1)
    b1 = np.concatenate([rp.d1r, rp.d1i], axis=1)
    d1s_hi, d1s_lo = _bf16_pair(d1s)
    d2_hi, d2_lo = _bf16_pair(d2)
    e2_hi, e2_lo = _bf16_pair(e2)
    b1_hi, b1_lo = _bf16_pair(b1)
    gains = np.stack([permute_half_bins(rp, g) for g in p.gains]).astype(np.float32)
    return _TwoStageSub(
        B=B, H=p.hop_size, n1=rp.n1, n2=rp.n2,
        aw=np.asarray(p.analysis_window, np.float32).reshape(rp.n1, rp.n2),
        swv=np.asarray(p.synthesis_window, np.float32).reshape(rp.n1, rp.n2),
        d1s_hi=d1s_hi, d1s_lo=d1s_lo, twr=rp.twr, twi=rp.twi,
        d2_hi=d2_hi, d2_lo=d2_lo, e2_hi=e2_hi, e2_lo=e2_lo,
        b1_hi=b1_hi, b1_lo=b1_lo, gains=gains, winv=rp.winv,
    )


def make_bigblock_plan(bucket_plan, chunk: int):
    sub = _make_sub(bucket_plan)
    if chunk % sub.H:
        raise ValueError(f"chunk {chunk} not a multiple of hop {sub.H}")
    return sub, chunk // sub.H  # (sub, n_frames)


def bigblock_lcr_batch(x: jnp.ndarray, sub: _TwoStageSub, n_frames: int,
                       interpret: bool = False):
    """x: [S, 2, chunk + B - H] f32 -> (main [S, 3, chunk], spill [S, 3, B-H])."""
    B, H, N1, N2 = sub.B, sub.H, sub.n1, sub.n2
    C = sub.winv.shape[1]
    S = x.shape[0]
    chunk = n_frames * H
    spill = B - H
    need = chunk + spill
    if x.shape[-1] < need:
        raise ValueError(f"x too short: {x.shape[-1]} < {need}")
    x = x[:, :, :need]
    nb = sub.gains.shape[0]

    def kernel(x_hbm, aw, swv, d1s_hi, d1s_lo, twr, twi, d2_hi, d2_lo,
               e2_hi, e2_lo, b1_hi, b1_lo, g_ref, winv,
               out_ref, spill_ref, xbuf, accum, sem):
        s = pl.program_id(0)
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _():
            accum[...] = jnp.zeros_like(accum)

        dma = pltpu.make_async_copy(
            x_hbm.at[s, :, pl.ds(f * H, B)], xbuf, sem
        )
        dma.start()
        dma.wait()

        twr_v = twr[...]
        twi_v = twi[...]
        gains_list = [g_ref[b] for b in range(nb)]
        spec = []
        for ch in range(2):
            xm = xbuf[ch].reshape(N1, N2) * aw[...]
            A = _dot3(xm.T, d1s_hi[...].T, d1s_lo[...].T)  # [N2, 2N1]
            a_re = A[:, :N1].T
            a_im = A[:, N1:].T
            b_re = a_re * twr_v - a_im * twi_v
            b_im = a_re * twi_v + a_im * twr_v
            p1 = _dot3(b_re, d2_hi[...], d2_lo[...])
            p2 = _dot3(b_im, d2_hi[...], d2_lo[...])
            spec.append((p1[:, :C] - p2[:, C:], p1[:, C:] + p2[:, :C]))
        c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
            spec[0][0], spec[0][1], spec[1][0], spec[1][1], gains_list
        )
        ys = []
        for sre, sim in ((c_re, c_im), (l_re, l_im), (r_re, r_im)):
            sre = sre * winv[...]
            sim = sim * winv[...]
            q1 = _dot3(sre, e2_hi[...], e2_lo[...])
            q2 = _dot3(sim, e2_hi[...], e2_lo[...])
            t_re = q1[:, :N2] - q2[:, N2:]
            t_im = q1[:, N2:] + q2[:, :N2]
            u_re = t_re * twr_v + t_im * twi_v
            u_im = t_im * twr_v - t_re * twi_v
            u = jnp.concatenate([u_re, u_im], axis=0)
            y = _dot3(u.T, b1_hi[...].T, b1_lo[...].T).T  # [N1, N2]
            ys.append((y * swv[...]).reshape(1, B))
        y3 = jnp.concatenate(ys, axis=0)  # [3, B]

        acc = accum[...] + y3
        out_ref[0] = acc[:, :H]
        accum[...] = jnp.concatenate(
            [acc[:, H:], jnp.zeros((3, H), jnp.float32)], axis=1
        )

        @pl.when(f == n_frames - 1)
        def _():
            spill_ref[0] = acc[:, H:]

    w_arrays = [sub.aw, sub.swv, sub.d1s_hi, sub.d1s_lo, sub.twr, sub.twi,
                sub.d2_hi, sub.d2_lo, sub.e2_hi, sub.e2_lo, sub.b1_hi,
                sub.b1_lo, sub.gains, sub.winv]
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for w in w_arrays:
        zeros = (0,) * w.ndim
        in_specs.append(
            pl.BlockSpec(w.shape, lambda s, f, z=zeros: z, memory_space=pltpu.VMEM)
        )
    call = pl.pallas_call(
        kernel,
        grid=(S, n_frames),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 3, H), lambda s, f: (s, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, spill), lambda s, f: (s, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 3, chunk), jnp.float32),
            jax.ShapeDtypeStruct((S, 3, spill), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B), jnp.float32),
            pltpu.VMEM((3, B), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    return call(x, *[jnp.asarray(w) for w in w_arrays])


def bigblock_lcr(x: jnp.ndarray, sub: _TwoStageSub, n_frames: int,
                 interpret: bool = False):
    main, spill = bigblock_lcr_batch(x[None], sub, n_frames, interpret=interpret)
    return main[0], spill[0]
