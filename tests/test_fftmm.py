"""Matmul-FFT kernel tests: transform correctness vs numpy in the permuted
layout, layout helpers, and full-pipeline parity of the "mm" kernel vs the
NumPy oracle (forced on CPU, where "auto" would pick "xla")."""

import numpy as np
import pytest

import jax.numpy as jnp

from upmix_tpu.config import UpmixConfig
from upmix_tpu.models.offline import resolve_kernel, upmix_offline
from upmix_tpu.oracle import oracle_multiband
from upmix_tpu.ops.fftmm import (
    bin_of,
    conj_mirror,
    fft_mm,
    half_to_full,
    ifft_mm,
    irfft_mm,
    make_plan,
    pair_irfft_mm,
    permute_bins,
    stereo_rfft_mm,
)

from helpers import make_stereo, snr_db


@pytest.mark.parametrize("n", [16, 256, 1024, 4096])
def test_fft_mm_matches_numpy(n):
    plan = make_plan(n)
    assert plan.n1 * plan.n2 == n
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(
        np.complex64
    )
    Z = np.asarray(fft_mm(jnp.asarray(x), plan))
    ref = np.fft.fft(x)
    k1 = np.arange(plan.n1)[:, None]
    k2 = np.arange(plan.n2)[None, :]
    refp = ref[:, bin_of(plan, k1, k2)]
    assert np.abs(Z - refp).max() / np.abs(ref).max() < 1e-5
    y = np.asarray(ifft_mm(jnp.asarray(Z), plan))
    assert np.abs(y - x).max() / np.abs(x).max() < 1e-5


@pytest.mark.parametrize("n", [256, 1024])
def test_stereo_pack_unpack(n):
    plan = make_plan(n)
    rng = np.random.default_rng(1)
    l = rng.standard_normal((2, n)).astype(np.float32)
    r = rng.standard_normal((2, n)).astype(np.float32)
    sl, sr = stereo_rfft_mm(jnp.asarray(l), jnp.asarray(r), plan)
    k1 = np.arange(plan.n1)[:, None]
    k2 = np.arange(plan.n2)[None, :]
    idx = bin_of(plan, k1, k2)
    assert np.abs(np.asarray(sl) - np.fft.fft(l)[:, idx]).max() < 1e-3
    assert np.abs(np.asarray(sr) - np.fft.fft(r)[:, idx]).max() < 1e-3
    y0, y1 = pair_irfft_mm(sl, sr, plan)
    assert np.abs(np.asarray(y0) - l).max() < 1e-5
    assert np.abs(np.asarray(y1) - r).max() < 1e-5
    y2 = irfft_mm(sl, plan)
    assert np.abs(np.asarray(y2) - l).max() < 1e-5


def test_conj_mirror_is_negation_map():
    plan = make_plan(64)
    z = np.arange(64, dtype=np.complex64).reshape(plan.n1, plan.n2)
    # entry (k1,k2) holds bin value k1 + n1*k2 — mirror must hold (-k)%n
    m = np.asarray(conj_mirror(jnp.asarray(z)))
    k1 = np.arange(plan.n1)[:, None]
    k2 = np.arange(plan.n2)[None, :]
    k = bin_of(plan, k1, k2)
    flat = np.zeros(64, dtype=np.complex64)
    flat[k.reshape(-1)] = z.reshape(-1)
    expect = flat[(-k) % 64]
    np.testing.assert_allclose(m, expect)


def test_permute_and_half_to_full():
    plan = make_plan(16)
    half = np.arange(9, dtype=np.float32)
    full = half_to_full(half, 16)
    assert full[0] == 0 and full[8] == 8
    np.testing.assert_array_equal(full[9:], half[1:8][::-1])
    perm = permute_bins(plan, full)
    k1 = np.arange(plan.n1)[:, None]
    k2 = np.arange(plan.n2)[None, :]
    np.testing.assert_array_equal(perm, full[bin_of(plan, k1, k2)])


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        make_plan(48)


def test_resolve_kernel():
    assert resolve_kernel("mm") == "mm"
    assert resolve_kernel("xla") == "xla"
    assert resolve_kernel("auto") in ("mm", "xla")
    with pytest.raises(ValueError):
        resolve_kernel("cuda")


def test_mm_pipeline_parity_vs_oracle():
    cfg = UpmixConfig.make([0.0, 400.0, 1600.0], sr=8000.0, max_block_size=512)
    L, R = make_stereo(5000, cfg.sr, seed=0)
    L32, R32 = L.astype(np.float32), R.astype(np.float32)
    ref = oracle_multiband(L32, R32, cfg)
    got = upmix_offline(L32, R32, cfg, kernel="mm")
    for name, r, g in zip("C Ls Rs".split(), ref, got):
        s = snr_db(r, g)
        assert s > 60.0, f"{name}: {s:.1f} dB"


def test_mm_matches_xla_kernel():
    cfg = UpmixConfig.make([0.0, 400.0], sr=8000.0, max_block_size=256)
    L, R = make_stereo(3000, cfg.sr, seed=1)
    a = upmix_offline(L.astype(np.float32), R.astype(np.float32), cfg, kernel="xla")
    b = upmix_offline(L.astype(np.float32), R.astype(np.float32), cfg, kernel="mm")
    for x, y in zip(a, b):
        assert snr_db(x, y) > 80.0


def test_banded_plan_and_transforms():
    from upmix_tpu.ops.fftmm import (
        conj_mirror_banded,
        fft_banded,
        ifft_banded,
        make_banded_plan,
        pair_irfft_banded,
        permute_bins_banded,
        stereo_rfft_banded,
    )

    n = 1024
    bp = make_banded_plan(n, 10, 80)  # narrow support -> few columns
    assert bp.n_cols < bp.base.n2
    # support columns (bins 10..80 and their conjugate mirrors) are kept
    support_cols = {b // bp.base.n1 for b in range(10, 81)}
    support_cols |= {((-b) % n) // bp.base.n1 for b in range(10, 81)}
    assert support_cols <= set(bp.cols)

    rng = np.random.default_rng(2)
    l = rng.standard_normal((3, n)).astype(np.float32)
    r = rng.standard_normal((3, n)).astype(np.float32)
    sl, sr = stereo_rfft_banded(jnp.asarray(l), jnp.asarray(r), bp)
    # banded forward must agree with numpy on the SUPPORT columns (the
    # mirror-only columns are contractually garbage — see make_banded_plan)
    ref = np.fft.fft(l)
    k1 = np.arange(bp.base.n1)[:, None]
    sup_idx = [i for i, c in enumerate(bp.cols) if c in support_cols]
    k2s = np.asarray([bp.cols[i] for i in sup_idx])[None, :]
    refb = ref[:, k1 + bp.base.n1 * k2s]
    assert (
        np.abs(np.asarray(sl)[..., sup_idx] - refb).max() / np.abs(ref).max() < 1e-5
    )

    # gain -> inverse round-trip: zero outside support, compare vs numpy
    g_half = np.zeros(n // 2 + 1, np.float32)
    g_half[10:81] = 1.0
    g_full = half_to_full(g_half, n)
    gp = jnp.asarray(permute_bins_banded(bp, g_full))
    y0, y1 = pair_irfft_banded(sl * gp, sr * gp, bp)
    ref_y0 = np.fft.irfft(np.fft.rfft(l) * g_half, n=n)
    ref_y1 = np.fft.irfft(np.fft.rfft(r) * g_half, n=n)
    assert np.abs(np.asarray(y0) - ref_y0).max() < 1e-5
    assert np.abs(np.asarray(y1) - ref_y1).max() < 1e-5


def test_banded_full_support_degenerates_to_full():
    from upmix_tpu.ops.fftmm import make_banded_plan

    bp = make_banded_plan(256, 0, 128)
    assert bp.is_full


def test_chunked_scan_parity_vs_oracle():
    from upmix_tpu.models.offline import build_offline_chunked_fn

    import jax

    cfg = UpmixConfig.make([0.0, 400.0, 1600.0], sr=8000.0, max_block_size=512)
    n = 10000
    L, R = make_stereo(n, cfg.sr, seed=3)
    L32, R32 = L.astype(np.float32), R.astype(np.float32)
    ref = oracle_multiband(L32, R32, cfg)
    fn = jax.jit(build_offline_chunked_fn(cfg, n, kernel="mm", chunk=2048))
    got = fn(jnp.asarray(L32), jnp.asarray(R32))
    for name, r, g in zip("C Ls Rs".split(), ref, got):
        s = snr_db(r, np.asarray(g))
        assert s > 60.0, f"{name}: {s:.1f} dB"


def test_chunked_matches_whole_file():
    from upmix_tpu.models.offline import build_offline_chunked_fn, build_offline_fn

    import jax

    cfg = UpmixConfig.make([0.0, 400.0], sr=8000.0, max_block_size=256)
    n = 7000
    L, R = make_stereo(n, cfg.sr, seed=4)
    L32, R32 = jnp.asarray(L, jnp.float32), jnp.asarray(R, jnp.float32)
    whole = jax.jit(build_offline_fn(cfg, n, kernel="mm", chunk=0))(L32, R32)
    chunked = jax.jit(build_offline_chunked_fn(cfg, n, kernel="mm", chunk=1024))(L32, R32)
    for a, b in zip(whole, chunked):
        assert snr_db(np.asarray(a), np.asarray(b)) > 100.0


def test_tiny_chunk_rounded_up_to_block_lcm():
    # chunk is rounded up to a multiple of every block size, which also
    # guarantees chunk >= halo (max block > max block - hop).
    import jax

    from upmix_tpu.models.offline import build_offline_chunked_fn

    cfg = UpmixConfig.make([0.0, 400.0], sr=8000.0, max_block_size=512)
    n = 4096
    fn = jax.jit(build_offline_chunked_fn(cfg, n, kernel="mm", chunk=128))
    L, R = make_stereo(n, cfg.sr, seed=7)
    got = fn(jnp.asarray(L, jnp.float32), jnp.asarray(R, jnp.float32))
    ref = oracle_multiband(L.astype(np.float32), R.astype(np.float32), cfg)
    for r, g in zip(ref, got):
        assert snr_db(r, np.asarray(g)) > 60.0


def test_pallas_fused_bucket_matches_fold():
    # Fused pallas engine (interpret mode on CPU) vs the XLA bucket fold.
    import jax

    from upmix_tpu.models.offline import _bucket_fold_mm, _plan_buckets
    from upmix_tpu.ops.dftmm import make_direct_plan
    from upmix_tpu.ops.pallas_upmix import fused_bucket_lcr, make_fused_plan

    cfg = UpmixConfig.make([0.0, 400.0, 1600.0], sr=8000.0, max_block_size=512)
    p = _plan_buckets(cfg, 4096)[0]
    B, H = p.block_size, p.hop_size
    K = B // H
    chunk = 2048
    nz = np.nonzero(p.gains.max(axis=0))[0]
    lo, hi = int(nz[0]), int(nz[-1])
    dplan = make_direct_plan(B, lo, hi, p.analysis_window, p.synthesis_window)
    fp = make_fused_plan(
        B, H, chunk, dplan.w_fwd, dplan.w_inv, p.gains[:, lo : hi + 1], tile_samples=512
    )
    assert fp.n_tiles > 1  # exercises the cross-tile spill carry
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, chunk + B - H)).astype(np.float32)
    main, spill = fused_bucket_lcr(jnp.asarray(x), fp, interpret=True)
    F = chunk // H
    ref = _bucket_fold_mm(p, jnp.asarray(x[:, : (F + K - 1) * H]), F)
    assert snr_db(np.asarray(ref[:, :chunk]), np.asarray(main)) > 100.0
    assert snr_db(np.asarray(ref[:, chunk:]), np.asarray(spill)) > 100.0


def test_chunked_with_pallas_parity_vs_oracle():
    import jax

    from upmix_tpu.models.offline import build_offline_chunked_fn

    cfg = UpmixConfig.make([0.0, 400.0, 1600.0], sr=8000.0, max_block_size=512)
    n = 9000
    L, R = make_stereo(n, cfg.sr, seed=5)
    L32, R32 = L.astype(np.float32), R.astype(np.float32)
    ref = oracle_multiband(L32, R32, cfg)
    fn = jax.jit(
        build_offline_chunked_fn(cfg, n, kernel="mm", chunk=2048, use_pallas=True)
    )
    got = fn(jnp.asarray(L32), jnp.asarray(R32))
    for name, r, g in zip("C Ls Rs".split(), ref, got):
        s = snr_db(r, np.asarray(g))
        assert s > 60.0, f"{name}: {s:.1f} dB"


def test_chunked_rounds_chunk_to_block_lcm():
    # A chunk that is a multiple of every hop but not every block must be
    # rounded up so grouped framing stays valid (e.g. 50% overlap, K=2).
    import jax

    from upmix_tpu.models.offline import build_offline_chunked_fn

    cfg = UpmixConfig.make(
        [0.0, 400.0], sr=8000.0, max_block_size=512, overlap=0.5
    )
    n = 6000
    L, R = make_stereo(n, cfg.sr, seed=6)
    fn = jax.jit(build_offline_chunked_fn(cfg, n, kernel="mm", chunk=768))
    got = fn(jnp.asarray(L, jnp.float32), jnp.asarray(R, jnp.float32))
    ref = oracle_multiband(L.astype(np.float32), R.astype(np.float32), cfg)
    for r, g in zip(ref, got):
        assert snr_db(r, np.asarray(g)) > 60.0


def test_chunked_with_omnibus_parity_vs_oracle():
    import jax

    from upmix_tpu.models.offline import build_offline_chunked_fn

    cfg = UpmixConfig.make([0.0, 100.0, 400.0, 1600.0], sr=8000.0, max_block_size=512)
    n = 9000
    L, R = make_stereo(n, cfg.sr, seed=8)
    L32, R32 = L.astype(np.float32), R.astype(np.float32)
    ref = oracle_multiband(L32, R32, cfg)
    fn = jax.jit(
        build_offline_chunked_fn(
            cfg, n, kernel="mm", chunk=2048, use_pallas=True, use_omnibus=True
        )
    )
    got = fn(jnp.asarray(L32), jnp.asarray(R32))
    for name, r, g in zip("C Ls Rs".split(), ref, got):
        s = snr_db(r, np.asarray(g))
        assert s > 60.0, f"{name}: {s:.1f} dB"


def test_omnibus_plan_classification():
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan

    cfg = UpmixConfig.make([0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=44100.0)
    plans = _plan_buckets(cfg, 2**17)
    op, leftover = make_omnibus_plan(plans, 2**17)
    kinds = {s.B: type(s).__name__ for s in op.subs}
    # Round 2: every bucket rides the one launch — narrow buckets direct,
    # medium/wide as batched block-diagonal 2-stage, 65536 via multi-view
    # lookahead frames (tile stays at 16384, halo covers the big block).
    assert kinds[65536] == "_TwoStageBdSub"
    assert kinds[16384] == "_TwoStageBdSub"
    assert kinds[4096] == "_TwoStageBdSub"
    assert kinds[1024] == "_DirectSub"
    assert kinds[256] == "_DirectSub"
    assert leftover == []
    assert op.tile == 16384 and op.halo == 49152 and op.n_views == 4
    # Round-1 classification still reachable via the compat flags.
    op1, leftover1 = make_omnibus_plan(
        plans, 2**17, include_medium=False, include_big=False
    )
    assert sorted(p.block_size for p in leftover1) == [4096, 65536]
    assert op1.tile == 16384 and op1.halo == 12288

    # Stage-1 row restriction: the single-column 65536 bucket keeps only
    # the k1 rows that can carry a kept bin.
    big = next(s for s in op.subs if s.B == 65536)
    assert big.R < big.n1 and big.R % 8 == 0


def test_omnibus_big_hop_grows_tile():
    # overlap 0.5 halves the hop count but pushes the 65536 bucket's hop
    # (32768) past the 16384 tile cap; round 2 dropped that bucket to a
    # separate XLA chain, which ate the entire 2x frame-count win.  The
    # tile must GROW to the big hop instead, keeping every bucket in the
    # one omnibus launch.
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan

    cfg = UpmixConfig.make(
        [0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=44100.0, overlap=0.5
    )
    plans = _plan_buckets(cfg, 2**18)
    op, leftover = make_omnibus_plan(plans, 2**18)
    assert leftover == []
    assert op.tile == 32768 and op.halo == 32768 and op.n_views == 2
    kinds = {s.B: type(s).__name__ for s in op.subs}
    assert kinds[65536] == "_TwoStageBdSub"
    # Small-bucket kron waste stays bounded: M*B <= 16384 still holds.
    for s in op.subs:
        if type(s).__name__ == "_TwoStageBdSub" and s.B <= 16384:
            assert s.M * s.B <= 16384


def test_omnibus_grown_tile_parity():
    # Numerical parity of the grown-tile geometry at miniature scale: the
    # 512 bucket at overlap 0.5 has hop 256 > tile_cap 128, so the tile
    # grows to 256 and the bucket folds through one lookahead view.
    from upmix_tpu.models.offline import _bucket_fold_mm, _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr

    cfg = UpmixConfig.make(
        [0.0, 2000.0], sr=8000.0, max_block_size=512, overlap=0.5
    )
    chunk = 1024
    plans = _plan_buckets(cfg, chunk)
    assert sorted(p.block_size for p in plans) == [128, 512]
    op, leftover = make_omnibus_plan(plans, chunk, tile_cap=128, min_tile=0)
    assert leftover == []
    assert op.tile == 256 and op.halo == 256 and op.n_views == 2
    big = next(s for s in op.subs if s.B == 512)
    assert type(big).__name__ == "_TwoStageBdSub" and big.M == 1

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, chunk + op.halo)).astype(np.float32)
    main, spill = omnibus_lcr(jnp.asarray(x), op, interpret=True)

    ref = None
    for p in plans:
        K = p.block_size // p.hop_size
        F = chunk // p.hop_size
        T = (F + K - 1) * p.hop_size
        contrib = np.asarray(_bucket_fold_mm(p, jnp.asarray(x[:, :T]), F))
        contrib = np.pad(contrib, ((0, 0), (0, chunk + op.halo - T)))
        ref = contrib if ref is None else ref + contrib
    got = np.concatenate([np.asarray(main), np.asarray(spill)], axis=1)
    assert snr_db(ref, got) > 80.0


def test_omnibus_dot_knob_parity():
    # The exact-rewrite knobs (_DOT_PAIRED: hi/lo weight halves ride one
    # taller/wider MXU invocation; _DOT_PADN: tiny stage-2 dots zero-
    # padded to native lane width) must reproduce the default kernel to
    # float32 tolerance in interpret mode.
    import upmix_tpu.ops.pallas_omnibus as pom
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr

    cfg = UpmixConfig.make(
        [0.0, 100.0, 400.0, 1600.0], sr=8000.0, max_block_size=512
    )
    chunk = 2048
    plans = _plan_buckets(cfg, chunk)
    base, _ = make_omnibus_plan(plans, chunk, min_tile=0, direct_weight_limit=0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((2, chunk + (base.n_views - 1) * base.tile)),
        jnp.float32,
    )
    ref = np.asarray(omnibus_lcr(x, base, interpret=True)[0])
    # _LANE_STACK defaults ON; check the OFF (per-start loop) state too.
    for knob, value in (
        ("_DOT_PAIRED", True),
        ("_DOT_PADN", True),
        ("_LANE_STACK", False),
    ):
        saved = getattr(pom, knob)
        setattr(pom, knob, value)
        try:
            plan, lo = make_omnibus_plan(
                plans, chunk, min_tile=0, direct_weight_limit=0
            )
            assert not lo
            out = np.asarray(omnibus_lcr(x, plan, interpret=True)[0])
        finally:
            setattr(pom, knob, saved)
        rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-12)
        assert rel < 1e-5, f"{knob}={value}: rel {rel:.2e}"


def test_omnibus_lane_stack_plan_invariants():
    # Lane-stacked subs (default on): multi-start BD subs must carry
    # S-fold-tiled elementwise constants and permuted block-diagonal
    # stage-2/stage-B weights; single-start subs stay untouched.
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import _TwoStageBdSub, make_omnibus_plan

    cfg = UpmixConfig.make(
        [0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=44100.0
    )
    plans = _plan_buckets(cfg, 2**18)
    op, leftover = make_omnibus_plan(plans, 2**18)
    assert leftover == []
    bd = {s.B: s for s in op.subs if isinstance(s, _TwoStageBdSub)}
    big = bd[65536]
    assert big.lane_stack == 1 and len(big.starts) == 1
    for B in (16384, 4096):
        s = bd[B]
        S = s.lane_stack
        assert S == len(s.starts) > 1
        rows_t, rows = s.M * s.n1, s.M * s.R
        C = s.gains_rep.shape[2] // S
        # Constants tiled S-fold on lanes; weights block-diagonal.
        assert s.aw2.shape == (rows_t, S * 2 * s.n2)
        assert s.sw3.shape == (rows_t, S * 3 * s.n2)
        assert s.twr2.shape == (rows, S * 2 * s.n2)
        assert s.d2b_hi.shape == (S * 2 * s.n2, S * 4 * C)
        assert s.e2b_hi.shape == (3 * S * C, S * 6 * s.n2)
        # Stage-1/inverse weights are NOT stacked (start-independent).
        assert s.w1s_hi.shape == (2 * rows, rows_t)
        assert s.w1i_hi.shape == (rows_t, 2 * rows)
        # The d2 block-diagonal's quantity-major columns: each start's
        # block lands at [o*S*C + s*C, ...] and rows outside the start's
        # lane block are zero.
        d2 = np.asarray(s.d2b_hi, np.float32)
        for si in range(S):
            other = np.delete(
                d2[:, si * C : si * C + C],  # quantity 0, start si cols
                np.s_[si * 2 * s.n2 : (si + 1) * 2 * s.n2],
                axis=0,
            )
            assert np.abs(other).max() == 0.0


def test_omnibus_bigblock_multiview_parity():
    # A bucket whose BLOCK exceeds the omnibus tile rides extra lookahead
    # input views (round 2); check the multi-view fold against the plain
    # grouped-framing path at tiny sizes (tile_cap=128 makes the 512
    # bucket "big": halo 384 = 3 extra views).
    from upmix_tpu.models.offline import _bucket_fold_mm, _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr

    cfg = UpmixConfig.make([0.0, 2000.0], sr=8000.0, max_block_size=512)
    chunk = 1024
    plans = _plan_buckets(cfg, chunk)
    assert sorted(p.block_size for p in plans) == [128, 512]
    op, leftover = make_omnibus_plan(plans, chunk, tile_cap=128, min_tile=0)
    assert leftover == []
    assert op.tile == 128 and op.halo == 384 and op.n_views == 4
    big = next(s for s in op.subs if s.B == 512)
    assert type(big).__name__ == "_TwoStageBdSub" and big.M == 1

    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, chunk + op.halo)).astype(np.float32)
    main, spill = omnibus_lcr(jnp.asarray(x), op, interpret=True)

    ref = None
    for p in plans:
        K = p.block_size // p.hop_size
        F = chunk // p.hop_size
        T = (F + K - 1) * p.hop_size
        contrib = np.asarray(_bucket_fold_mm(p, jnp.asarray(x[:, :T]), F))
        contrib = np.pad(contrib, ((0, 0), (0, chunk + op.halo - T)))
        ref = contrib if ref is None else ref + contrib
    got = np.concatenate([np.asarray(main), np.asarray(spill)], axis=1)
    assert snr_db(ref, got) > 80.0


def test_omnibus_lane_stack_random_fuzz():
    # Randomized 2-stage lane-stacked geometries (interpret mode): force
    # every bucket onto the block-diagonal path (direct_weight_limit=0)
    # so multi-start subs exercise the S-fold lane stacking, and compare
    # the raw omnibus against the per-bucket grouped-framing reference.
    from upmix_tpu.models.offline import _bucket_fold_mm, _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan, omnibus_lcr

    rng = np.random.default_rng(55)
    for trial in range(3):
        sr = float(rng.choice([8000, 16000, 44100]))
        edges = [0.0] + sorted(
            float(f) for f in rng.uniform(sr * 0.03, sr * 0.4, size=2)
        )
        if edges[2] - edges[1] < sr * 0.02:
            continue
        max_block = int(rng.choice([512, 1024]))
        cfg = UpmixConfig.make(edges, sr=sr, max_block_size=max_block)
        unit = 1
        for b in cfg.bands:
            unit = unit * b.block_size // np.gcd(unit, b.block_size)
        chunk = 4 * unit
        plans = _plan_buckets(cfg, chunk)
        op, leftover = make_omnibus_plan(
            plans, chunk, min_tile=0, direct_weight_limit=0
        )
        assert leftover == []
        assert any(
            getattr(s, "lane_stack", 1) > 1 for s in op.subs
        ), f"trial {trial}: no lane-stacked sub (edges={edges}, mb={max_block})"
        x = rng.standard_normal((2, chunk + (op.n_views - 1) * op.tile))
        x = x.astype(np.float32)
        main, spill = omnibus_lcr(jnp.asarray(x), op, interpret=True)
        ref = None
        for p in plans:
            K = p.block_size // p.hop_size
            F = chunk // p.hop_size
            T = (F + K - 1) * p.hop_size
            contrib = np.asarray(_bucket_fold_mm(p, jnp.asarray(x[:, :T]), F))
            contrib = np.pad(
                contrib, ((0, 0), (0, chunk + op.halo - T))
            )
            ref = contrib if ref is None else ref + contrib
        got = np.concatenate(
            [np.asarray(main), np.asarray(spill[:, : op.halo])], axis=1
        )
        s = snr_db(ref, got)
        assert s > 80.0, f"trial {trial}: {s:.1f} dB (edges={edges})"


def test_omnibus_random_config_fuzz():
    # Bounded fuzz of the full pallas path (interpret mode): random edges,
    # rates, caps, and xover modes through the single-launch omnibus must
    # hold >60 dB vs the oracle.  (The broader fuzz in test_edge_cases
    # covers the non-pallas kernels; this one pins the kernel that runs
    # on the chip.)
    import jax

    from upmix_tpu.models.offline import build_offline_chunked_fn

    rng = np.random.default_rng(77)
    for trial in range(4):
        sr = float(rng.choice([8000, 22050, 48000]))
        n_edges = int(rng.integers(1, 4))
        edges = [0.0] + sorted(
            float(f) for f in rng.uniform(sr * 0.02, sr * 0.45, size=n_edges)
        )
        if any(b - a < sr * 0.01 for a, b in zip(edges, edges[1:])):
            continue  # avoid near-degenerate bands
        max_block = int(rng.choice([256, 512, 1024]))
        xover = str(rng.choice(["raised_cosine", "hard_zero"]))
        cfg = UpmixConfig.make(
            edges, sr=sr, max_block_size=max_block, xover_mode=xover
        )
        unit = 1
        for b in cfg.bands:
            unit = unit * b.block_size // np.gcd(unit, b.block_size)
        chunk = max(2 * unit, 2048)
        n = int(chunk * 2.5)
        L, R = make_stereo(n, sr, seed=100 + trial)
        L32, R32 = L.astype(np.float32), R.astype(np.float32)
        ref = oracle_multiband(L32, R32, cfg)
        fn = jax.jit(
            build_offline_chunked_fn(
                cfg, n, chunk=chunk, use_pallas=True, use_omnibus=True
            )
        )
        got = fn(jnp.asarray(L32), jnp.asarray(R32))
        for name, r, g in zip("C Ls Rs".split(), ref, got):
            if np.max(np.abs(r)) < 1e-7:
                continue
            s = snr_db(r, np.asarray(g))
            assert s > 60.0, (
                f"trial {trial} {name}: {s:.1f} dB "
                f"(sr={sr}, edges={edges}, mb={max_block}, {xover})"
            )
