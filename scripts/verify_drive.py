"""On-chip verify drive (verify SKILL.md surface 1 + good checks)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

t0 = time.time()
print("devices:", jax.devices(), flush=True)

from upmix_tpu.config import UpmixConfig
from upmix_tpu.models import Upmixer
from upmix_tpu.oracle import oracle_multiband

SR = 44100.0
N = 2**17
rng = np.random.default_rng(7)
t = np.arange(N) / SR
center = np.sin(2 * np.pi * 440.0 * t).astype(np.float32) * 0.4
sideL = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32) * 0.3
sideR = np.sin(2 * np.pi * 2500.0 * t).astype(np.float32) * 0.3
L = center + sideL
R = center + sideR

cfg = UpmixConfig.make([0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=SR)
up = Upmixer(cfg)
tc = time.time()
C, Ls, Rs = up.process_np(L, R)  # cold: compile + upload
t1 = time.time()
print(f"cold process (incl. compile+upload) {t1 - tc:.1f}s", flush=True)
C, Ls, Rs = up.process_np(L, R)  # warm: same length -> cache hit
t2 = time.time()
C, Ls, Rs = np.asarray(C), np.asarray(Ls), np.asarray(Rs)

# Oracle parity (float64 NumPy reference semantics).
ref = oracle_multiband(L, R, cfg)
def snr(a, b):
    n = np.sum((a.astype(np.float64) - b) ** 2)
    s = np.sum(np.asarray(b, np.float64) ** 2)
    return 10 * np.log10(s / max(n, 1e-300))
snrs = [snr(got, want) for got, want in zip((C, Ls, Rs), ref)]
print(f"oracle SNR C/Ls/Rs: {snrs[0]:.1f} / {snrs[1]:.1f} / {snrs[2]:.1f} dB",
      flush=True)
assert min(snrs) > 60.0

# Tone routing: shared 440 Hz -> C; 1 kHz -> Ls; 2.5 kHz -> Rs.
def band_energy(x, f):
    X = np.abs(np.fft.rfft(x[N // 4 :]))
    k = int(round(f * len(x[N // 4 :]) / SR))
    return float(X[k - 2 : k + 3].max())
eC440, eLs440 = band_energy(C, 440), band_energy(Ls, 440)
eLs1k, eC1k = band_energy(Ls, 1000), band_energy(C, 1000)
eRs25, eC25 = band_energy(Rs, 2500), band_energy(C, 2500)
print(f"routing: C/Ls @440 {eC440:.1f}/{eLs440:.1f}; "
      f"Ls/C @1k {eLs1k:.1f}/{eC1k:.1f}; Rs/C @2.5k {eRs25:.1f}/{eC25:.1f}",
      flush=True)
assert eC440 > 4 * eLs440 and eLs1k > 4 * eC1k and eRs25 > 4 * eC25

# Silence -> exact zeros; mono -> sides ~ 0.
zC, zLs, zRs = (np.asarray(x) for x in up.process_np(np.zeros(N, np.float32), np.zeros(N, np.float32)))
assert np.abs(zC).max() == 0 and np.abs(zLs).max() == 0 and np.abs(zRs).max() == 0
mC, mLs, mRs = (np.asarray(x) for x in up.process_np(center, center))
assert np.abs(mLs).max() <= 1e-5 and np.abs(mRs).max() <= 1e-5
audio_s = N / SR
print(f"silence/mono checks OK; warm process {t2 - t1:.2f}s "
      f"({audio_s / (t2 - t1):.0f}x realtime incl. transfers)", flush=True)
print("VERIFY_DRIVE_OK total", round(time.time() - t0, 1), "s", flush=True)
