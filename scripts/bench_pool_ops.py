"""Per-op attribution for the pallas serving-pool kernel.

Leave-one-op-out profiling variants (wrong output, layout-safe — see
the _PROF_* flags in ops/pallas_pool.py) plus a dot1 single-bf16-pass
variant, scanned over N_BLOCKS hardware blocks and measured with the
interleaved min-of-visits protocol (CLAUDE.md measurement rules):

  full      — the production kernel
  dot1      — bf16x3 -> one bf16 MXU pass (attributes the 2 extra passes)
  nodot     — both dots fabricated (attributes ALL MXU work)
  nomask    — mask sqrt/div replaced by linear glue
  nofold    — static OLA fold replaced by one pad+add per output
  skeleton  — nodot + nomask + nofold (framing + IO + launch floor)

Weight operand copies are NOT removed by nodot (they are BlockSpec
operands fetched regardless), so nodot attributes MXU issue time, not
weight HBM traffic.

    BENCH_B=2048 python scripts/bench_pool_ops.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HW = 48000.0, 2048
EDGES = [0.0, 500.0, 2000.0, 8000.0]
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 32))
VISITS = int(os.environ.get("BENCH_VISITS", 5))
B = int(os.environ.get("BENCH_B", 2048))
GROUP = int(os.environ.get("BENCH_GROUP", 16))


def main():
    import jax
    import jax.numpy as jnp

    import upmix_tpu.ops.pallas_pool as pp
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan, pool_step_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)
    plan = make_pool_plan(cfg, HW, B, group=GROUP)
    assert plan is not None

    def _dot1(a, b_hi, b_lo):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), b_hi, preferred_element_type=jnp.float32
        )

    def _mask_cheap(slre, slim, srre, srim, gains_list):
        c_re = c_im = l_re = l_im = r_re = r_im = 0.0
        for g in gains_list:
            glre, glim = slre * g, slim * g
            grre, grim = srre * g, srim * g
            cre, cim = 0.5 * (glre + grre), 0.5 * (glim + grim)
            c_re, c_im = c_re + cre, c_im + cim
            l_re, l_im = l_re + (glre - cre), l_im + (glim - cim)
            r_re, r_im = r_re + (grre - cre), r_im + (grim - cim)
        return c_re, c_im, l_re, l_im, r_re, r_im

    orig_dot3, orig_mask = pp._dot3, pp._mask_sum
    _ALL_FLAGS = (
        "_PROF_NODOT", "_PROF_NOFOLD", "_PROF_NOMASK", "_PROF_NOW",
        "_PROF_NOOLA",
    )
    variants = [
        ("full", {}),
        ("dot1", {"dot1": True}),
        ("nodot", {"flags": ("_PROF_NODOT",)}),
        ("nomask", {"mask": True}),
        ("nofold", {"flags": ("_PROF_NOFOLD",)}),
        ("skeleton", {"flags": ("_PROF_NODOT", "_PROF_NOMASK", "_PROF_NOFOLD")}),
        # Operand-machinery attribution: drop whole operand groups from
        # the pallas_call (weights / OLA carries), all compute fabricated.
        ("skel-now", {"flags": ("_PROF_NOW", "_PROF_NOFOLD")}),
        ("skel-noola", {
            "flags": ("_PROF_NODOT", "_PROF_NOMASK", "_PROF_NOFOLD",
                      "_PROF_NOOLA"),
        }),
        ("skel-none", {"flags": ("_PROF_NOW", "_PROF_NOFOLD", "_PROF_NOOLA")}),
    ]

    blocks = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N_BLOCKS, B, 2, HW), jnp.float32
        )
        * 0.3
    )()
    blocks.block_until_ready()

    def pool_step(state, x):
        histL = jnp.concatenate([state["histL"][:, HW:], x[:, 0, :]], axis=1)
        histR = jnp.concatenate([state["histR"][:, HW:], x[:, 1, :]], axis=1)
        t = state["t"] + 1
        olas = tuple(
            tuple(state["ola"][str(b.B)][o] for o in range(3))
            for b in plan.buckets
        )
        (oc, ols, ors), new_olas = pool_step_lcr(histL, histR, t, olas, plan)
        ola_state = {
            str(b.B): new_olas[bi] for bi, b in enumerate(plan.buckets)
        }
        return (
            {"histL": histL, "histR": histR, "t": t, "ola": ola_state},
            (oc, ols, ors),
        )

    state = jax.device_put(
        {
            "histL": jnp.zeros((B, plan.window), jnp.float32),
            "histR": jnp.zeros((B, plan.window), jnp.float32),
            "t": jnp.zeros((B,), jnp.int32),
            "ola": {
                str(b.B): tuple(
                    jnp.zeros((B, b.B), jnp.float32) for _ in range(3)
                )
                for b in plan.buckets
            },
        }
    )

    progs = {}
    for name, kw in variants:
        if kw.get("dot1"):
            pp._dot3 = _dot1
        if kw.get("mask"):
            pp._mask_sum = _mask_cheap
        for f in kw.get("flags", ()):
            setattr(pp, f, True)
        try:
            fn = jax.jit(lambda st, bl: jax.lax.scan(pool_step, st, bl))
            _, outs = fn(state, blocks)  # compile under the variant flags
            _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
        except Exception as exc:  # Mosaic can reject a fabrication layout
            print(
                f"{name:9s} COMPILE FAILED: {type(exc).__name__}: "
                f"{str(exc)[:160]}",
                flush=True,
            )
            continue
        finally:
            pp._dot3, pp._mask_sum = orig_dot3, orig_mask
            for f in _ALL_FLAGS:
                setattr(pp, f, False)
        progs[name] = fn
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in progs}
    for v in range(VISITS):
        for name, fn in progs.items():
            t0 = time.perf_counter()
            _, outs = fn(state, blocks)
            _ = float(np.asarray(jax.tree.leaves(outs)[0].ravel()[0]))
            results[name].append((time.perf_counter() - t0) / N_BLOCKS)
        print(f"visit {v} done", flush=True)

    full = min(results["full"]) * 1e3
    print(f"\nfull: {full:7.3f} ms/block ({full * 1e3 / B:5.2f} us/stream)")
    for name, ts in results.items():
        if name == "full":
            continue
        ms = min(ts) * 1e3
        d = full - ms
        print(
            f"{name:9s} {ms:7.3f} ms  saves {d:+7.3f} ms "
            f"({d / full * 100:+5.1f}%)"
        )


if __name__ == "__main__":
    main()
