"""A/B benchmark: merged omnibus (all 5 buckets, one launch) vs the
round-1 configuration (omnibus of 3 + standalone fused 4096 + XLA 65536).

Run on the real chip (ONE process at a time):
    python scripts/bench_omnibus_ab.py [variants...]
Variants: old, new, nobig, nomed (default: old new).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100.0
EDGES = (0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0)
N = int(os.environ.get("BENCH_SAMPLES", 2**21))
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import build_offline_chunked_fn
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = UpmixConfig.make(list(EDGES), sr=SR)

    variants = sys.argv[1:] or ["old", "new"]
    settings = {
        "old": dict(omnibus_medium=False, omnibus_big=False),
        "t32k": dict(tile32k=True),
        "nobig": dict(omnibus_medium=True, omnibus_big=False),
        "nomed": dict(omnibus_medium=False, omnibus_big=True),
        "new": dict(omnibus_medium=True, omnibus_big=True),
        # PROFILING-ONLY variants (wrong outputs!): cost attribution
        # inside the omnibus kernel.
        "profmask": dict(prof="mask"),  # mask sqrt/div -> passthrough
        "profdot1": dict(prof="dot1"),  # bf16x3 dots -> single bf16 pass
        # EXACT-ALGEBRA variant: one division in the mask instead of two.
        "mask1div": dict(prof="1div"),
        "proffold": dict(prof="fold"),  # skip OLA folds/merges (wrong output)
        # EXACT variant (f32 sum order differs, ~1e-7): scratch-accumulate
        # folds instead of pad-to-width adds + merge concats.
        "foldscratch": dict(prof="scratch"),
    }

    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.standard_normal(N), jnp.float32)
    R = jnp.asarray(rng.standard_normal(N), jnp.float32)
    L, R = jax.device_put((L, R))

    # Correctness spot-check data (CPU oracle comparison is too slow here;
    # compare variants against each other instead).
    outputs = {}
    import jax as _jax
    import upmix_tpu.ops.pallas_omnibus as _pom

    _orig_mask = _pom._mask_sum
    _orig_dot3 = _pom._dot3
    _orig_dot3l = _pom._dot3l

    def _mask_sum_cheap(slre, slim, srre, srim, gains_list):
        # Same gain/sum structure, no sqrt/div (PROFILING ONLY).
        c_re = c_im = l_re = l_im = r_re = r_im = 0.0
        for g in gains_list:
            glre, glim = slre * g, slim * g
            grre, grim = srre * g, srim * g
            cre, cim = 0.5 * (glre + grre), 0.5 * (glim + grim)
            c_re, c_im = c_re + cre, c_im + cim
            l_re, l_im = l_re + (glre - cre), l_im + (glim - cim)
            r_re, r_im = r_re + (grre - cre), r_im + (grim - cim)
        return c_re, c_im, l_re, l_im, r_re, r_im

    def _dot1(a, b_hi, b_lo):
        return _jax.lax.dot(
            a.astype(jnp.bfloat16), b_hi, preferred_element_type=jnp.float32
        )

    def _dot1l(a_hi, a_lo, b):
        return _jax.lax.dot(
            a_hi, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

    import upmix_tpu.ops.pallas_upmix as _pup

    _orig_soa = _pup._mask_soa
    _EPS = 1e-12

    def _mask_soa_1div(slre, slim, srre, srim):
        # Same algebra as _mask_soa with the two divisions merged into
        # one: f = 0.5*cross*(s+eps-d) / ((cross+eps)*(s+eps)).
        magl = jnp.sqrt(slre * slre + slim * slim)
        magr = jnp.sqrt(srre * srre + srim * srim)
        cross = magl * magr
        s = magl + magr + _EPS
        d = jnp.abs(magl - magr)
        f = 0.5 * cross * (s - d) / ((cross + _EPS) * s)
        return f * (slre + srre), f * (slim + srim)

    for name in variants:
        kw = dict(settings[name])
        tile32k = kw.pop("tile32k", False)
        prof = kw.pop("prof", None)
        if prof == "mask":
            _pom._mask_sum = _mask_sum_cheap
        elif prof == "dot1":
            _pom._dot3 = _dot1
            _pom._dot3l = _dot1l
        elif prof == "1div":
            _pup._mask_soa = _mask_soa_1div
        elif prof == "fold":
            _pom._PROF_NOFOLD = True
        elif prof == "scratch":
            _pom._FOLD_SCRATCH = True
        if tile32k:
            import upmix_tpu.ops.pallas_omnibus as _po
            _orig = _po.make_omnibus_plan
            def _patched(plans, chunk, **k):
                k["tile_cap"] = 32768
                k["tile_pref"] = 32768
                return _orig(plans, chunk, **k)
            _po.make_omnibus_plan = _patched
            import upmix_tpu.models.offline as _off
            _off.make_omnibus_plan = _patched
        base_fn = build_offline_chunked_fn(config, N, **kw)
        if tile32k:
            _po.make_omnibus_plan = _orig
            _off.make_omnibus_plan = _orig

        def step(L, R, seed, base_fn=base_fn):
            return base_fn(L + seed, R - seed)

        fn = jax.jit(step)

        def run(iters):
            seed = jnp.zeros((), jnp.float32)
            out = None
            for _ in range(iters):
                out = fn(L, R, seed)
                seed = out[0][0] * 1e-6
            return out

        t0 = time.perf_counter()
        out = run(1)
        _ = float(np.asarray(out[0][0]))
        compile_s = time.perf_counter() - t0
        # Profiling patches must stay live through the first call (jit
        # traces the kernel body then); restore once compiled.
        _pom._mask_sum = _orig_mask
        _pom._dot3 = _orig_dot3
        _pom._dot3l = _orig_dot3l
        _pup._mask_soa = _orig_soa
        _pom._PROF_NOFOLD = False
        _pom._FOLD_SCRATCH = False
        if prof is None or prof in ("1div", "scratch"):  # exact variants
            outputs[name] = np.stack([np.asarray(o[:65536]) for o in out])

        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(ITERS)
            _ = float(np.asarray(out[0][0]))
            times.append((time.perf_counter() - t0) / ITERS)
        times.sort()
        ms = times[1] * 1e3
        rt = (N / SR) / times[1]
        print(f"{name:6s}  {ms:7.2f} ms/iter  {rt:8.1f}x realtime  (compile+warm {compile_s:.1f}s)  all3={ [round(t*1e3,2) for t in times] }")

    if len(outputs) > 1:
        names = list(outputs)
        a = outputs[names[0]]
        for nm in names[1:]:
            b = outputs[nm]
            err = np.abs(a - b).max()
            denom = np.abs(a).max() + 1e-12
            print(f"max|{names[0]} - {nm}| = {err:.3e} (rel {err/denom:.2e})")


def chunk_sweep():
    """Chunk-size sweep for the merged omnibus (run: ... sweep)."""
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import build_offline_chunked_fn
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = UpmixConfig.make(list(EDGES), sr=SR)
    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.standard_normal(N), jnp.float32)
    R = jnp.asarray(rng.standard_normal(N), jnp.float32)
    L, R = jax.device_put((L, R))

    for chunk in (2**18, 2**19, 2**20, 2**21):
        fn0 = build_offline_chunked_fn(config, N, chunk=chunk)

        def step(L, R, seed, fn0=fn0):
            return fn0(L + seed, R - seed)

        fn = jax.jit(step)

        def run(iters):
            seed = jnp.zeros((), jnp.float32)
            out = None
            for _ in range(iters):
                out = fn(L, R, seed)
                seed = out[0][0] * 1e-6
            return out

        out = run(1)
        _ = float(np.asarray(out[0][0]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(ITERS)
            _ = float(np.asarray(out[0][0]))
            times.append((time.perf_counter() - t0) / ITERS)
        times.sort()
        ms = times[1] * 1e3
        print(f"chunk 2^{chunk.bit_length()-1}: {ms:7.2f} ms/iter  {(N/SR)/times[1]:8.1f}x")


if __name__ == "__main__":
    if "sweep" in sys.argv:
        chunk_sweep()
    else:
        main()
