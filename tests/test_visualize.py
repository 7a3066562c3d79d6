"""Visualization smoke tests (Agg backend, file output)."""

import numpy as np

from upmix_tpu.ops.windows import design_wola_synthesis_window, make_blackman_harris
from upmix_tpu.visualize import compare_upmix_vs_original, visualize_windows


def test_visualize_windows_writes_file(tmp_path):
    aw = make_blackman_harris(256)
    sw = design_wola_synthesis_window(aw, 0.75)
    out = visualize_windows(aw, sw, 0.75, save_path=tmp_path / "win.png")
    assert (tmp_path / "win.png").stat().st_size > 0
    assert out is not None


def test_compare_plot_writes_file(tmp_path):
    rng = np.random.default_rng(0)
    n = 2048
    C, Ls, Rs, L, R = (rng.standard_normal(n).astype(np.float32) for _ in range(5))
    compare_upmix_vs_original(C, Ls, Rs, L, R, 8000.0, save_path=tmp_path / "ab.png")
    assert (tmp_path / "ab.png").stat().st_size > 0
