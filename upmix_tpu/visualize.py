"""Window/overlap-add visualization and A/B comparison plots.

Developer-facing parity with the reference's visual affordances: the
3-panel window/OA plot (center_extraction.py:585-640) and the demo's
time/spectrum comparison of `Ls+C+Rs` vs `L+R`
(center_extraction.py:699-736).  The WOLA invariant these plots eyeball is
also an assert in tests/test_windows.py.  matplotlib import is deferred so
headless use of the package never pays for it.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def visualize_windows(analysis_window, synthesis_window, overlap: float, save_path=None):
    """3 panels: single-frame windows; sum of K overlapped analysis windows;
    sum of K overlapped analysis*synthesis products (≈1.0 when the WOLA
    design is correct)."""
    plt = _plt()
    L = len(analysis_window)
    hop = int(L * (1 - overlap))
    K = int(round(1.0 / (1.0 - overlap)))
    total = L + (K - 1) * hop

    fig, axes = plt.subplots(3, 1, figsize=(10, 10))
    axes[0].set_title("Analysis vs. Synthesis Window (Single Frame)")
    axes[0].plot(analysis_window, label="Analysis")
    axes[0].plot(synthesis_window, label="Synthesis (WOLA)")
    axes[0].legend(loc="best")

    asum = np.zeros(total, dtype=np.float64)
    wsum = np.zeros(total, dtype=np.float64)
    prod = np.asarray(analysis_window, dtype=np.float64) * np.asarray(
        synthesis_window, dtype=np.float64
    )
    for k in range(K):
        asum[k * hop : k * hop + L] += analysis_window
        wsum[k * hop : k * hop + L] += prod
    axes[1].set_title(f"Sum of {K} Overlapped Analysis Windows at {overlap * 100:.0f}% Overlap")
    axes[1].plot(asum)
    axes[2].set_title(f"Sum of {K} Overlapped Weighted Windows (Analysis*Synthesis)")
    axes[2].plot(wsum)

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    plt.show()
    return None


def compare_upmix_vs_original(C, Ls, Rs, L, R, sr: float, save_path=None):
    """Time-domain + log-magnitude-spectrum comparison of the upmix sum
    (Ls+C+Rs) against the original stereo sum (L+R), both peak-normalized."""
    plt = _plt()
    upmix = np.asarray(Ls) + np.asarray(C) + np.asarray(Rs)
    orig = np.asarray(L) + np.asarray(R)
    n = min(len(upmix), len(orig))
    upmix, orig = upmix[:n], orig[:n]
    upmix = upmix / (np.max(np.abs(upmix)) + 1e-12)
    orig = orig / (np.max(np.abs(orig)) + 1e-12)
    t = np.arange(n) / sr

    fig, axes = plt.subplots(2, 1, figsize=(12, 8))
    axes[0].plot(t, upmix, label="Upmix (Ls + C + Rs)")
    axes[0].plot(t, orig, label="Original (L + R)", alpha=0.75)
    axes[0].set_title("Time Domain Comparison")
    axes[0].legend(loc="upper right")

    freqs = np.linspace(0, sr / 2, n // 2 + 1)
    axes[1].semilogy(freqs, np.abs(np.fft.rfft(upmix)), label="Upmix Spectrum")
    axes[1].semilogy(freqs, np.abs(np.fft.rfft(orig)), label="Original Spectrum", alpha=0.75)
    axes[1].set_title("Frequency Domain Comparison")
    axes[1].legend(loc="upper right")

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    plt.show()
    return None
