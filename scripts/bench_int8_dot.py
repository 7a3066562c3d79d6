"""Microbench: int8 3-pass split dots vs bf16x3 inside a pallas kernel.

Motivation (DESIGN.md 4c): dots are 70% of the omnibus kernel; bf16
precision rungs are exhausted (bf16x2 < 60 dB, bf16x3 is the default).
v5e's MXU runs int8 at 2x the bf16 rate, and the int8x3 split scheme
measures ~88 dB through the full transform chain on CPU
(scripts/exp_int8_numerics.py) — 28 dB above the bar.  This benchmark
answers the two open hardware questions:
  1. does Mosaic compile jax.lax.dot on int8 operands at all?
  2. what is the REAL rate vs bf16x3 at the omnibus's shapes, including
     the runtime activation split (max-reduce + round + clip + cast)?

Variants (square [M,K]@[K,K] chained dots, orthonormal DCT weights):
  bf16x3   runtime hi/lo split + 3 bf16 passes      (the current scheme)
  bf16x1   single bf16 pass                          (MXU floor, wrong math)
  int8x3   runtime row-scaled int8 split + 3 int8 passes + scale combine
  int8x3f  int8x3 with a FIXED activation scale (isolates the max-reduce)
  int8x1   single int8 pass, fixed scales            (int8 MXU floor)

Protocol: interleaved min-of-visits (VISITS x INNER chained pallas calls
per dispatch), plus interpret-mode parity vs numpy before timing.
Run on the real chip, ONE process:  python scripts/bench_int8_dot.py
CPU sanity (interpret only):        JAX_PLATFORMS=cpu python scripts/bench_int8_dot.py check
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("BENCH_M", 512))
K = int(os.environ.get("BENCH_K", 512))
CHAIN = int(os.environ.get("BENCH_CHAIN", 64))  # dots per pallas call
INNER = int(os.environ.get("BENCH_INNER", 10))  # pallas calls per dispatch
VISITS = int(os.environ.get("BENCH_VISITS", 12))
REPS = int(os.environ.get("BENCH_REPS", 3))  # timed dispatches per visit


def make_weights():
    # Orthonormal DCT-II: chained applications stay O(1) in magnitude.
    n = np.arange(K)
    w = np.cos(np.pi * (n[:, None] + 0.5) * n[None, :] / K) * np.sqrt(2.0 / K)
    w[:, 0] *= 1.0 / np.sqrt(2.0)
    return w.astype(np.float32)


def split_bf16_np(w):
    import jax.numpy as jnp

    h = w.astype(jnp.bfloat16)
    l = (w - np.asarray(h, np.float32)).astype(jnp.bfloat16)
    return np.asarray(h), np.asarray(l)


def split_int8_np(w, axis=0):
    s = np.max(np.abs(w), axis=axis, keepdims=True).astype(np.float64) / 127.0
    s = np.where(s == 0.0, 1.0, s)
    h = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    r = w - s * h
    l = np.clip(np.rint(r / (s / 254.0)), -127, 127).astype(np.int8)
    return h, l, s.astype(np.float32)


def build(variant, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    w = make_weights()
    wh_bf, wl_bf = split_bf16_np(w)
    wh_i8, wl_i8, sw = split_int8_np(w, axis=0)
    dot = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32)
    doti = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    if variant == "bf16x3":
        consts = (jnp.asarray(wh_bf), jnp.asarray(wl_bf))

        def apply(x, wh, wl):
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return dot(xh, wh) + dot(xh, wl) + dot(xl, wh)

    elif variant == "bf16x1":
        consts = (jnp.asarray(wh_bf),)

        def apply(x, wh):
            return dot(x.astype(jnp.bfloat16), wh)

    elif variant in ("int8x3", "int8x3f"):
        consts = (
            jnp.asarray(wh_i8),
            jnp.asarray(wl_i8),
            jnp.asarray(sw),  # [1, K] f32
        )
        fixed = variant == "int8x3f"

        def apply(x, wh, wl, swv):
            if fixed:
                sa = jnp.full((M, 1), 8.0 / 127.0, jnp.float32)
            else:
                sa = jnp.max(jnp.abs(x), axis=1, keepdims=True) * (1.0 / 127.0)
                sa = jnp.maximum(sa, 1e-30)
            q = x * (1.0 / sa)
            xh = jnp.clip(jnp.round(q), -127.0, 127.0)
            xl = jnp.clip(jnp.round((q - xh) * 254.0), -127.0, 127.0)
            xh8 = xh.astype(jnp.int8)
            xl8 = xl.astype(jnp.int8)
            phh = doti(xh8, wh)
            pcross = doti(xh8, wl) + doti(xl8, wh)
            acc = phh.astype(jnp.float32) + pcross.astype(jnp.float32) * (
                1.0 / 254.0
            )
            return acc * sa * swv

    elif variant == "int8x1":
        consts = (jnp.asarray(wh_i8), jnp.asarray(sw))

        def apply(x, wh, swv):
            sa = jnp.full((M, 1), 8.0 / 127.0, jnp.float32)
            q = x * (1.0 / sa)
            xh8 = jnp.clip(jnp.round(q), -127.0, 127.0).astype(jnp.int8)
            return doti(xh8, wh).astype(jnp.float32) * sa * swv

    else:
        raise SystemExit(f"unknown variant {variant}")

    def kernel(x_ref, *rest):
        const_refs, (o_ref,) = rest[:-1], rest[-1:]
        cs = tuple(r[...] for r in const_refs)
        x = x_ref[...]

        def body(_, x):
            return apply(x, *cs)

        y = jax.lax.fori_loop(0, CHAIN, body, x)
        o_ref[...] = y

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def chained(x):
        for _ in range(INNER):
            x = fn(x, *consts)
        return x

    return chained, (w, consts, apply)


def check():
    import jax

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((M, K)) * 4.0).astype(np.float32)
    w = make_weights().astype(np.float64)
    ref = x.astype(np.float64)
    for _ in range(CHAIN * INNER):
        ref = ref @ w
    for variant in ("bf16x3", "int8x3", "int8x3f", "int8x1"):
        fn, _ = build(variant, interpret=True)
        y = np.asarray(fn(x), np.float64)
        err = np.sqrt(np.mean((y - ref) ** 2) / max(np.mean(ref**2), 1e-300))
        snr = -20 * np.log10(max(err, 1e-300))
        print(f"{variant:8s} chain of {CHAIN*INNER}: SNR {snr:6.1f} dB")


def bench():
    import jax

    rng = np.random.default_rng(0)
    x0 = jax.device_put((rng.standard_normal((M, K)) * 4.0).astype(np.float32))
    variants = sys.argv[1:] or ["bf16x3", "int8x3", "int8x3f", "int8x1", "bf16x1"]
    fns = {}
    for v in variants:
        fn, _ = build(v)
        t0 = time.perf_counter()
        try:
            y = fn(x0)
            _ = float(np.asarray(y[0, 0]))
        except Exception as e:  # compile failure IS a result here
            print(f"{v:8s} FAILED to compile/run: {type(e).__name__}: {e}")
            continue
        print(f"{v:8s} compile+warm {time.perf_counter()-t0:.1f}s")
        fns[v] = fn

    best = {v: np.inf for v in fns}
    for visit in range(VISITS):
        for v, fn in fns.items():
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                y = fn(x0)
                _ = float(np.asarray(y[0, 0]))
                ts.append(time.perf_counter() - t0)
            best[v] = min(best[v], min(ts))
    ndots = {"bf16x3": 3, "int8x3": 3, "int8x3f": 3, "int8x1": 1, "bf16x1": 1}
    print(f"\nshape [{M},{K}]@[{K},{K}], {CHAIN} dots/call x {INNER} calls/dispatch")
    for v, t in best.items():
        per_dot_us = t / (CHAIN * INNER) * 1e6
        flops = 2.0 * M * K * K * ndots[v]
        eff = flops / (t / (CHAIN * INNER)) / 197e12 * 100  # vs bf16 peak
        print(
            f"{v:8s} min {t*1e3:8.3f} ms/dispatch  {per_dot_us:7.2f} us/apply"
            f"  ({eff:5.1f}% of bf16 peak)"
        )


if __name__ == "__main__":
    if "check" in sys.argv:
        check()
    else:
        bench()
