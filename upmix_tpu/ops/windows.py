"""Window generation and WOLA synthesis-window design.

Host-side NumPy: windows are trace-time constants baked into jitted
programs.  Semantics follow the reference exactly
(center_extraction.py:42-105; bela/upmix.cpp:59-71), but the reference's
O(L*K) scalar WOLA design loop (262k iterations for the largest default
band) is replaced by a vectorized formulation.
"""

from __future__ import annotations

import numpy as np

from upmix_tpu.config import EPS


def make_blackman_harris(N: int) -> np.ndarray:
    """4-term Blackman–Harris window, a0..a3 = 0.35875/0.48829/0.14128/0.01168
    (reference: center_extraction.py:42-53; identical coefficients in
    bela/upmix.cpp:61-64)."""
    n = np.arange(N)
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    w = (
        a0
        - a1 * np.cos(2 * np.pi * n / (N - 1))
        + a2 * np.cos(4 * np.pi * n / (N - 1))
        - a3 * np.cos(6 * np.pi * n / (N - 1))
    )
    return w.astype(np.float32)


def make_sqrt_hann(N: int) -> np.ndarray:
    """Square-root Hann (reference: center_extraction.py:56-59)."""
    return np.sqrt(np.hanning(N)).astype(np.float32)


def make_hann(N: int) -> np.ndarray:
    """Hann (reference: center_extraction.py:61-63)."""
    return np.hanning(N).astype(np.float32)


def make_blackman(N: int) -> np.ndarray:
    """Blackman (reference: center_extraction.py:65-67)."""
    return np.blackman(N).astype(np.float32)


def make_hamming(N: int) -> np.ndarray:
    """Hamming (reference: center_extraction.py:69-71)."""
    return np.hamming(N).astype(np.float32)


def make_rect(N: int) -> np.ndarray:
    """Rectangular (reference: center_extraction.py:73-75)."""
    return np.ones(N, dtype=np.float32)


_WINDOWS = {
    "blackman_harris": make_blackman_harris,
    "sqrt_hann": make_sqrt_hann,
    "hann": make_hann,
    "blackman": make_blackman,
    "hamming": make_hamming,
    "rect": make_rect,
}


def make_window(name: str, N: int) -> np.ndarray:
    try:
        return _WINDOWS[name](N)
    except KeyError:
        raise ValueError(f"unknown window {name!r}; one of {sorted(_WINDOWS)}") from None


def design_wola_synthesis_window(analysis_window: np.ndarray, overlap: float) -> np.ndarray:
    """WOLA synthesis window: w_S(n) = w_A(n) / (sum_k w_A^2((n + k*H) mod L) + EPS).

    Semantics identical to the reference's scalar loop
    (center_extraction.py:80-105): H = floor(L*(1-overlap)),
    K = round(1/(1-overlap)) overlapping frames, modulo indexing simulating
    infinite tiling, float64 accumulation of float32 squared terms.
    Vectorized: the double loop becomes one fancy-indexed reduction.
    """
    L = len(analysis_window)
    hop = int(L * (1.0 - overlap))
    if hop < 1:
        raise ValueError("Overlap too large; resulting hop size < 1.")
    K = int(round(1.0 / (1.0 - overlap)))

    aw = np.asarray(analysis_window)
    idx = (np.arange(L)[:, None] + np.arange(K)[None, :] * hop) % L
    # Match the reference's accumulation: each term is squared in the input
    # dtype (float32), then summed in float64 (Python-float accumulator).
    terms = (aw[idx] * aw[idx]).astype(np.float64)
    denom = terms.sum(axis=1) + EPS
    return (aw / denom).astype(analysis_window.dtype)
