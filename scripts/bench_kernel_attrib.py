"""Complete in-kernel cost attribution of the omnibus launch (round 3).

DESIGN.md §4c left ~45% of tile time as unattributed "structural"
VPU/layout work.  This harness decomposes the WHOLE kernel with
leave-one-out profiling variants (each skips one class of work — wrong
output, profiling only) plus per-sub leave-one-out plan subsets, all
measured INTERLEAVED round-robin (min-of-visits per variant) so tunnel
noise bursts cannot masquerade as component costs.

Times the raw omnibus_lcr at chunk 2^21 (no scan, one launch of 128
tiles) — the same object bench.py's device time is 97% made of.

    python scripts/bench_kernel_attrib.py            # variant pass
    ATTRIB_SUBS=1 python scripts/bench_kernel_attrib.py  # plan subsets
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)
N = 2**21
ITERS = int(os.environ.get("BENCH_ITERS", 4))
INNER = int(os.environ.get("BENCH_INNER", 10))  # launches chained/dispatch
VISITS = int(os.environ.get("BENCH_VISITS", 8))


def build_timer(plan, omnibus_lcr, x, jax, jnp):
    need = plan.chunk + (plan.n_views - 1) * plan.tile
    xin = x[:, :need]

    def step(xin, seed, plan=plan):
        # INNER chained launches per dispatch: the ~1 ms tunnel RPC per
        # dispatch would otherwise be ~15% of the measurement and its
        # jitter would swamp the variant deltas.
        for _ in range(INNER):
            main, spill = omnibus_lcr(xin + seed, plan)
            seed = main[0, 0] * 1e-6
        return main, spill, seed

    fn = jax.jit(step)

    def run(iters):
        seed = jnp.zeros((), jnp.float32)
        out = None
        for _ in range(iters):
            out = fn(xin, seed)
            seed = out[2]
        return float(np.asarray(out[0][0, 0]))

    return run


def main():
    import jax
    import jax.numpy as jnp

    import upmix_tpu.ops.pallas_omnibus as pom
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = UpmixConfig.make(list(EDGES), sr=SR)
    all_plans = _plan_buckets(config, N)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((2, N + 3 * 16384)), jnp.float32)
    )

    import jax as _jax

    def _dot1(a, b_hi, b_lo):
        return _jax.lax.dot(
            a.astype(jnp.bfloat16), b_hi, preferred_element_type=jnp.float32
        )

    def _dot1l(a_hi, a_lo, b):
        return _jax.lax.dot(
            a_hi, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

    def _dot0(a, b_hi, b_lo):
        # No MXU at all (shape-correct zeros that still depend on the
        # inputs, so nothing upstream is dead-code-eliminated).
        return jnp.zeros((a.shape[0], b_hi.shape[1]), jnp.float32) + (
            a[:, :1] * 0.0 + b_hi[:1, :].astype(jnp.float32) * 0.0
        )

    def _dot0l(a_hi, a_lo, b):
        return jnp.zeros((a_hi.shape[0], b.shape[1]), jnp.float32) + (
            a_hi[:, :1].astype(jnp.float32) * 0.0 + b[:1, :] * 0.0
        )

    # int8 TIMING probes (wrong output): the real scheme
    # (scripts/exp_int8_numerics.py, 87-88 dB chain SNR on CPU) pre-splits
    # WEIGHTS into int8 hi/lo constants; here the bf16 weight halves are
    # cast in-kernel instead (garbage scales — timing stand-in) while the
    # ACTIVATION runtime split is the real thing (max-reduce + round +
    # clip + cast + rescale).  Tiny dots (either weight dim < 128: the
    # d2b/e2b stage-2 pair) keep the production bf16x3 path, matching
    # what an exact integration would ship (sub-lane int8 layouts are
    # Mosaic landmines and carry ~no MACs anyway).
    def _int8_act_rows(a):
        sa = jnp.maximum(
            jnp.max(jnp.abs(a), axis=1, keepdims=True) * (1.0 / 127.0), 1e-30
        )
        q = a * (1.0 / sa)
        ah = jnp.clip(jnp.round(q), -127.0, 127.0)
        al = jnp.clip(jnp.round((q - ah) * 254.0), -127.0, 127.0)
        return ah.astype(jnp.int8), al.astype(jnp.int8), sa

    def _int8_act_cols(b):
        sb = jnp.maximum(
            jnp.max(jnp.abs(b), axis=0, keepdims=True) * (1.0 / 127.0), 1e-30
        )
        q = b * (1.0 / sb)
        bh = jnp.clip(jnp.round(q), -127.0, 127.0)
        bl = jnp.clip(jnp.round((q - bh) * 254.0), -127.0, 127.0)
        return bh.astype(jnp.int8), bl.astype(jnp.int8), sb

    def _di(x, y):
        return _jax.lax.dot(x, y, preferred_element_type=jnp.int32)

    def _make_doti(passes):
        def _doti(a, b_hi, b_lo):
            k, n = b_hi.shape
            if k < 128 or n < 128:
                return orig_dot3(a, b_hi, b_lo)
            ah8, al8, sa = _int8_act_rows(a)
            wh = b_hi.astype(jnp.int8)
            sw = b_hi[:1, :].astype(jnp.float32) * 0.0 + 1.0  # [1, n] stand-in
            if passes == 1:
                acc = _di(ah8, wh).astype(jnp.float32)
            else:
                wl = b_lo.astype(jnp.int8)
                acc = _di(ah8, wh).astype(jnp.float32) + (
                    _di(ah8, wl) + _di(al8, wh)
                ).astype(jnp.float32) * (1.0 / 254.0)
            return acc * sa * sw

        def _dotil(a_hi, a_lo, b):
            k, n = a_hi.shape[1], b.shape[1]
            if k < 128 or n < 128:
                return orig_dot3l(a_hi, a_lo, b)
            bh8, bl8, sb = _int8_act_cols(b)
            wh = a_hi.astype(jnp.int8)
            sw = a_hi[:, :1].astype(jnp.float32) * 0.0 + 1.0  # [rows, 1]
            if passes == 1:
                acc = _di(wh, bh8).astype(jnp.float32)
            else:
                wl = a_lo.astype(jnp.int8)
                acc = _di(wh, bh8).astype(jnp.float32) + (
                    _di(wh, bl8) + _di(wl, bh8)
                ).astype(jnp.float32) * (1.0 / 254.0)
            return acc * sb * sw

        return _doti, _dotil

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

    orig_dot3, orig_dot3l, orig_mask = pom._dot3, pom._dot3l, pom._mask_sum
    _FLAGS = ("_PROF_NOWIN", "_PROF_NOTW", "_PROF_NOREGROUP",
              "_PROF_NOFOLD", "_PROF_NOTINY", "_DOT_PAIRED",
              "_DOT_STACKED", "_DOT_STACKED_P", "_DOT_PADN", "_LANE_STACK",
              "_E2_HALVES", "_E2_SPLIT4")
    flag_defaults = {f: getattr(pom, f) for f in _FLAGS}

    if os.environ.get("ATTRIB_SUBS"):
        variants = [("all", {})]
        for p in all_plans:
            variants.append((f"drop-{p.block_size}",
                             {"drop": p.block_size}))
    else:
        variants = [
            ("full", {}),
            ("nodot23", {"dot1": True}),  # bf16x3 -> 1 MXU pass
            ("nodot", {"dot0": True}),  # ALL MXU work removed
            # int8 timing probes (wrong output; see _make_doti above).
            ("doti3", {"dotint": 3}),  # 3 int8 passes + runtime act split
            ("doti1", {"dotint": 1}),  # 1 int8 pass (int8 MXU floor)
            # EXACT candidates (not profiling variants): same products,
            # fewer MXU invocations.
            ("dotpaired", {"flag": "_DOT_PAIRED"}),
            ("dotpadn", {"flag": "_DOT_PADN"}),
            ("dotstackp", {"flag": "_DOT_STACKED_P"}),
            # _LANE_STACK defaults ON since round 3; A/B the off state.
            ("nolanestack", {"flag_off": "_LANE_STACK"}),
            ("e2split4", {"flag": "_E2_SPLIT4"}),
            ("notiny", {"flag": "_PROF_NOTINY"}),  # tiny stage-2 dots out
            ("nomasksd", {"mask": True}),  # mask sqrt/div removed
            ("nowin", {"flag": "_PROF_NOWIN"}),
            ("notw", {"flag": "_PROF_NOTW"}),
            ("noregroup", {"flag": "_PROF_NOREGROUP"}),
            ("nofold", {"flag": "_PROF_NOFOLD"}),
        ]

    if len(sys.argv) > 1:  # optional variant-name filter
        keep = set(sys.argv[1:])
        variants = [v for v in variants if v[0] in keep]

    runs = {}
    for name, kw in variants:
        plans = all_plans
        if "drop" in kw:
            plans = [p for p in all_plans if p.block_size != kw["drop"]]
        if kw.get("dot1"):
            pom._dot3, pom._dot3l = _dot1, _dot1l
        if kw.get("dot0"):
            pom._dot3, pom._dot3l = _dot0, _dot0l
        if kw.get("dotint"):
            pom._dot3, pom._dot3l = _make_doti(kw["dotint"])
        if kw.get("mask"):
            pom._mask_sum = _mask_cheap
        if "flag" in kw:
            setattr(pom, kw["flag"], True)
        if "flag_off" in kw:
            setattr(pom, kw["flag_off"], False)
        for f in kw.get("flags", ()):
            setattr(pom, f, True)
        try:
            plan, leftover = make_omnibus_plan(plans, N)
            assert not leftover, leftover
            run = build_timer(plan, omnibus_lcr, x, jax, jnp)
            t0 = time.perf_counter()
            run(1)
            compile_s = time.perf_counter() - t0
        except Exception as exc:  # Mosaic can reject a variant's layout
            print(f"{name:10s} COMPILE FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
            continue
        finally:
            pom._dot3, pom._dot3l, pom._mask_sum = (
                orig_dot3, orig_dot3l, orig_mask
            )
            for f, v in flag_defaults.items():
                setattr(pom, f, v)
        runs[name] = {"run": run, "times": [], "compile_s": compile_s,
                      "n_tiles": plan.n_tiles}

    for v in range(VISITS):
        for name in runs:
            e = runs[name]
            t0 = time.perf_counter()
            e["run"](ITERS)
            e["times"].append((time.perf_counter() - t0) / (ITERS * INNER))
        time.sleep(1.0)

    base_key = "full" if "full" in runs else "all"
    base = min(runs[base_key]["times"]) if base_key in runs else None
    for name, e in runs.items():
        ms = min(e["times"]) * 1e3
        per_tile = ms * 1e3 / e["n_tiles"]
        delta = ""
        if base is not None and name != base_key:
            d = (base - min(e["times"])) * 1e3
            delta = f"  saves {d:+6.2f} ms ({d / (base * 1e3) * 100:+5.1f}%)"
        allv = " ".join(f"{t*1e3:.2f}" for t in e["times"])
        print(f"{name:10s} {ms:7.2f} ms ({per_tile:5.1f} us/tile)"
              f"{delta}  visits [{allv}]", flush=True)


if __name__ == "__main__":
    main()
