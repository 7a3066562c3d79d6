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

from upmix_tpu.ops.pallas_omnibus import (
    _TwoStageSub,
    _mask_sum,
    make_twostage_sub,
    twostage_forward_frame,
    twostage_inverse_frame,
)


def make_bigblock_plan(bucket_plan, chunk: int):
    sub = make_twostage_sub(bucket_plan)
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

        w_refs = (aw, swv, d1s_hi, d1s_lo, twr, twi, d2_hi, d2_lo,
                  e2_hi, e2_lo, b1_hi, b1_lo, g_ref, winv)
        gains_list = [g_ref[b] for b in range(nb)]
        spec = []
        for ch in range(2):
            xm = xbuf[ch].reshape(N1, N2) * aw[...]
            spec.append(twostage_forward_frame(xm, w_refs))
        c_re, c_im, l_re, l_im, r_re, r_im = _mask_sum(
            spec[0][0], spec[0][1], spec[1][0], spec[1][1], gains_list
        )
        ys = []
        for sre, sim in ((c_re, c_im), (l_re, l_im), (r_re, r_im)):
            y = twostage_inverse_frame(sre, sim, w_refs)
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
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
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
