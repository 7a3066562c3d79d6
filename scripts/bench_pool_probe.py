"""Leave-one-out probe of the serving pool's per-step cost (round 3).

The pool's B-sweep splits into ~0.55 ms fixed + ~17 us/stream marginal;
this script attributes both: scan-sustained step time at B=1 and B=128
for (a) the full step, (b) each bucket alone, (c) mask removed, (d)
transforms collapsed to a single bf16 pass.

    python scripts/bench_pool_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 64))
VISITS = int(os.environ.get("BENCH_VISITS", 4))


def main():
    import jax
    import jax.numpy as jnp

    import upmix_tpu.models.streaming as strm
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)

    import upmix_tpu.ops.dftmm as dftmm
    import upmix_tpu.ops.mask as maskmod

    orig_mask = maskmod.center_mask

    def mask_cheap(sl, sr_):
        c = 0.5 * (sl + sr_)
        return c, sl - c, sr_ - c

    orig_plan = strm._plan_stream_buckets

    def plan_only(block_size):
        def f(config, hw):
            return [p for p in orig_plan(config, hw)
                    if p.block_size == block_size]
        return f

    all_plans = orig_plan(cfg, HW)
    variants = [("full", {})]
    for p in all_plans:
        variants.append((f"only-{p.block_size}", {"only": p.block_size}))
    variants.append(("nomask", {"mask": True}))
    variants.append(("presplit", {"presplit": True}))

    # EXACT-ALGEBRA variant: explicit bf16x3 with PRE-SPLIT bf16 weight
    # constants, probing whether XLA re-decomposes the f32 weight
    # constants per scan step under precision HIGH.
    from upmix_tpu.ops.pallas_upmix import _split_bf16

    orig_rdft, orig_irdft = dftmm.rdft_direct, dftmm.irdft_direct

    def _dot3e(x, w_hi, w_lo, spec):
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        e = lambda a, b: jnp.einsum(
            spec, a, b, preferred_element_type=jnp.float32
        )
        return e(x_hi, w_hi) + e(x_lo, w_hi) + e(x_hi, w_lo)

    def rdft_split(x, plan):
        w_hi, w_lo = _split_bf16(plan.w_fwd)
        s = _dot3e(x, jnp.asarray(w_hi), jnp.asarray(w_lo), "...i,ij->...j")
        k = plan.n_bins
        return s[..., :k], s[..., k:]

    def irdft_split(sre, sim, plan):
        w_hi, w_lo = _split_bf16(plan.w_inv)
        s = jnp.concatenate([sre, sim], axis=-1)
        return _dot3e(s, jnp.asarray(w_hi), jnp.asarray(w_lo), "...j,ji->...i")

    rng = np.random.default_rng(0)
    runs = {}
    for name, kw in variants:
        if "only" in kw:
            strm._plan_stream_buckets = plan_only(kw["only"])
        if kw.get("mask"):
            maskmod.center_mask = mask_cheap
            strm.center_mask = mask_cheap
        if kw.get("presplit"):
            dftmm.rdft_direct = rdft_split
            dftmm.irdft_direct = irdft_split
        try:
            step = strm.build_stream_step(cfg, HW)
            for B in (1, 128):
                state = jax.tree.map(
                    lambda a, B=B: jnp.zeros((B,) + a.shape, a.dtype),
                    strm.init_stream_state(cfg, HW),
                )
                blocks = jnp.asarray(
                    rng.standard_normal((N_BLOCKS, B, 2, HW)), jnp.float32
                )

                @jax.jit
                def scan_all(state, blocks):
                    return jax.lax.scan(jax.vmap(step), state, blocks)

                st, outs = scan_all(state, blocks)
                jax.block_until_ready(outs)
                float(np.asarray(outs[0, 0, 0, 0]))
                runs[(name, B)] = {
                    "fn": scan_all, "state": state, "blocks": blocks,
                    "times": [],
                }
        finally:
            strm._plan_stream_buckets = orig_plan
            maskmod.center_mask = orig_mask
            strm.center_mask = orig_mask
            dftmm.rdft_direct = orig_rdft
            dftmm.irdft_direct = orig_irdft

    for v in range(VISITS):
        for key, e in runs.items():
            t0 = time.perf_counter()
            st, outs = e["fn"](e["state"], e["blocks"])
            float(np.asarray(outs[0, 0, 0, 0]))
            e["times"].append((time.perf_counter() - t0) / N_BLOCKS)
        time.sleep(1.0)

    for (name, B), e in runs.items():
        us = min(e["times"]) * 1e6
        print(f"{name:12s} B={B:4d}: {us:8.1f} us/block "
              f"({us / B:6.1f} us/block/stream)", flush=True)


if __name__ == "__main__":
    main()
