"""End-to-end soak: a multi-minute music-like WAV through every surface.

VERDICT r2 #8 asked for a real-audio soak (offline CLI + serve + native
pipe, spot-SNR vs oracle on slices).  This environment has zero egress
and no audio files anywhere on disk, so the program material is
SYNTHESIZED MUSIC — a chord progression with additive-synthesis
harmonics, a vibrato melody panned left, a counter-line panned right, a
bass line, kick/hat percussive transients, and slow stereo motion.  It
is broadband, nonstationary, and transient-rich (unlike the noise/tone
fixtures the test suite uses); it is not a recording, and that caveat
belongs next to the recorded numbers.

Phases (run ONE per invocation — each CLI subprocess owns the TPU claim):

    python scripts/soak_real_audio.py offline   # CLI offline, on-chip, spot-SNR
    python scripts/soak_real_audio.py serve     # job-server mode, same file
    python scripts/soak_real_audio.py pipe      # native binary, host-only

The parent process never initializes a JAX backend (oracle is NumPy), so
the CLI child is the only TPU client alive.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 44100
SECONDS = float(os.environ.get("SOAK_SECONDS", 150.0))
WORKDIR = os.environ.get("SOAK_DIR", "/tmp/soak_audio")
SLICE = 2**16


def synth_music(n: int, sr: int, seed: int = 7):
    """Deterministic music-like stereo program (see module docstring)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    beat = 0.5  # 120 bpm
    bar = 4 * beat

    # Chord progression (Am F C G), 10 partials with 1/k rolloff.
    roots = [220.0, 174.61, 130.81, 196.0]
    thirds = [261.63, 220.0, 164.81, 246.94]
    fifths = [329.63, 261.63, 196.0, 293.66]
    bar_idx = np.minimum((t / bar).astype(np.int64) % 4, 3)
    chords = np.zeros(n)
    for voice in (roots, thirds, fifths):
        f = np.asarray(voice)[bar_idx]
        phase = np.cumsum(2 * np.pi * f / sr)
        for k in range(1, 6):
            chords += np.sin(k * phase) / (k * k + 1)
    # Per-bar amplitude envelope (soft attack each bar).
    tb = np.mod(t, bar)
    chords *= 0.22 * (1 - np.exp(-tb * 8)) * np.exp(-tb * 0.4)

    # Melody: pentatonic walk, one note per beat, vibrato, panned left.
    penta = np.array([440.0, 493.88, 554.37, 659.25, 739.99])
    n_beats = int(np.ceil(SECONDS / beat)) + 1
    steps = rng.integers(0, 5, size=n_beats)
    f_mel = penta[steps][np.minimum((t / beat).astype(np.int64), n_beats - 1)]
    vib = 1 + 0.004 * np.sin(2 * np.pi * 5.5 * t)
    phase = np.cumsum(2 * np.pi * f_mel * vib / sr)
    tn = np.mod(t, beat)
    env = (1 - np.exp(-tn * 30)) * np.exp(-tn * 2.5)
    melody = 0.3 * env * (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.15 * np.sin(3 * phase))

    # Counter-line: slower arpeggio, panned right.
    arp = np.array([329.63, 392.0, 440.0, 523.25])
    f_arp = arp[(t / (beat / 2)).astype(np.int64) % 4]
    phase_a = np.cumsum(2 * np.pi * f_arp / sr)
    ta = np.mod(t, beat / 2)
    counter = 0.2 * np.exp(-ta * 6) * np.sin(phase_a)

    # Bass: root an octave down, center.
    f_bass = np.asarray(roots)[bar_idx] / 2
    phase_b = np.cumsum(2 * np.pi * f_bass / sr)
    bass = 0.25 * np.sin(phase_b) * (1 - np.exp(-tb * 20)) * np.exp(-tb * 1.2)

    # Percussion: kick (decaying 55 Hz sine) each beat, hat (HP noise
    # burst) on offbeats, slight stereo spread on the hat.
    kick = 0.5 * np.exp(-tn * 18) * np.sin(2 * np.pi * 55 * tn)
    th = np.mod(t + beat / 2, beat)
    noise = rng.standard_normal(n)
    noise = np.diff(noise, prepend=0.0)  # crude highpass
    hat = 0.12 * np.exp(-th * 40) * noise

    # Slow stereo motion on the chords.
    pan = 0.5 + 0.3 * np.sin(2 * np.pi * t / 16)
    L = (chords * pan + melody + 0.3 * counter + bass * 0.7
         + kick * 0.7 + hat * 0.8)
    R = (chords * (1 - pan) + 0.3 * melody + counter + bass * 0.7
         + kick * 0.7 + hat * 1.0)
    peak = max(np.abs(L).max(), np.abs(R).max())
    return (
        (L / peak * 0.85).astype(np.float32),
        (R / peak * 0.85).astype(np.float32),
    )


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.sum((ref - np.asarray(test, np.float64)) ** 2)
    return 10.0 * np.log10(np.sum(ref**2) / max(err, 1e-300))


def ensure_input():
    from upmix_tpu.io import read_wav, write_wav

    os.makedirs(WORKDIR, exist_ok=True)
    path = os.path.join(WORKDIR, "program.wav")
    n = int(SECONDS * SR)
    if not os.path.exists(path):
        L, R = synth_music(n, SR)
        write_wav(path, np.stack([L, R], axis=1), SR)
        print(f"wrote {path}: {SECONDS:.0f}s music program", flush=True)
    data, sr = read_wav(path)
    assert sr == SR
    return path, data[:, 0].astype(np.float32), data[:, 1].astype(np.float32)


def spot_snr(L, R, outs, scale, label):
    """Spot-SNR of scaled CLI outputs vs the float64 oracle on slices."""
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.oracle import oracle_multiband

    cfg = UpmixConfig.make([0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=float(SR))
    n = len(L)
    starts = [0, n // 4, n // 2, 3 * n // 4, n - SLICE]
    worst = np.inf
    t0 = time.perf_counter()
    ref = oracle_multiband(L, R, cfg)
    print(f"oracle ({n} samples) {time.perf_counter() - t0:.1f}s", flush=True)
    for s in starts:
        sl = slice(s, s + SLICE)
        for name, r, g in zip("C Ls Rs".split(), ref, outs):
            v = snr_db(np.asarray(r[sl]) * scale, g[sl])
            worst = min(worst, v)
            print(f"  {label} slice@{s:>9d} {name}: {v:6.1f} dB", flush=True)
    return worst


def phase_offline():
    from upmix_tpu.io import read_wav

    path, L, R = ensure_input()
    out_dir = os.path.join(WORKDIR, "out_offline")
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "upmix_tpu.cli", path, "--out-dir", out_dir,
         "--export-mode", "split", "--meter"],
        capture_output=True, text=True, cwd=REPO, timeout=5400,
    )
    wall = time.perf_counter() - t0
    print(r.stdout[-2000:])
    assert r.returncode == 0, r.stderr[-2000:]
    print(f"offline CLI wall {wall:.1f}s ({SECONDS / wall:.1f}x realtime "
          f"incl. compile + WAV I/O + tunnel upload)", flush=True)

    # split mode: Ls/-, C/C, -/Rs stereo files.
    files = sorted(os.listdir(out_dir))
    get = lambda tag: next(f for f in files if tag in f)
    c = read_wav(os.path.join(out_dir, get("_C_")))[0][:, 0]
    ls = read_wav(os.path.join(out_dir, get("_Ls_")))[0][:, 0]
    rs = read_wav(os.path.join(out_dir, get("_Rs_")))[0][:, 1]

    # Recover the shared scale factor from the CLI log.
    import re

    m = re.search(r"scale_factor = ([0-9.eE+-]+)", r.stdout + r.stderr)
    scale = float(m.group(1)) if m else 1.0
    print(f"scale_factor {scale}", flush=True)

    worst = spot_snr(L, R, (c, ls, rs), scale, "offline")
    print(f"offline soak worst slice SNR: {worst:.1f} dB", flush=True)
    assert worst > 60.0
    print("SOAK-OFFLINE-OK", flush=True)


def phase_serve():
    path, L, R = ensure_input()
    out_dir = os.path.join(WORKDIR, "out_serve")
    jobs = [
        {"cmd": "ping"},
        {"in": path, "out_dir": out_dir, "export_mode": "stereo_sum"},
        {"in": path, "out_dir": out_dir, "export_mode": "stereo_sum"},
        {"cmd": "stats"},
    ]
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "upmix_tpu.cli", "-", "--serve"],
        input="".join(json.dumps(j) + "\n" for j in jobs),
        capture_output=True, text=True, cwd=REPO, timeout=5400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.splitlines()]
    assert all(x.get("ok") for x in lines), lines
    w1, w2 = lines[1]["wall_s"], lines[2]["wall_s"]
    print(f"serve: job1 (cold) {w1:.1f}s, job2 (warm) {w2:.1f}s "
          f"({SECONDS / w2:.1f}x realtime warm incl. WAV I/O); "
          f"stats {lines[3]}", flush=True)
    print("SOAK-SERVE-OK", flush=True)


def phase_pipe():
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.oracle import oracle_stream_multiband

    path, L, R = ensure_input()
    lib = os.path.join(REPO, "native", "upmix_cli")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native"), "cli"],
                       check=True, capture_output=True)
    raw = np.empty(2 * len(L), np.float32)
    raw[0::2], raw[1::2] = L, R
    t0 = time.perf_counter()
    r = subprocess.run(
        [lib, "--sr", str(SR), "--edges", "0,30,120,480,1920,7680"],
        input=raw.tobytes(), capture_output=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-500:]
    out = np.frombuffer(r.stdout, np.float32)
    oL, oR = out[0::2], out[1::2]
    assert len(oL) == len(L) and np.isfinite(out).all()
    print(f"native pipe wall {wall:.1f}s ({SECONDS / wall:.1f}x realtime, "
          f"host core only)", flush=True)

    # Spot-SNR vs the streaming (Bela-scheduling) oracle.  The pipe's
    # align=True output is the raw stream shifted left by the
    # (warmup-1)*hw engine latency (tests/test_streaming_app.py::
    # _pipe_reference), so the oracle runs on latency-padded input and
    # the raw stream is read at [lat : lat + n].
    hw = 2048
    cfg = UpmixConfig.streaming(
        [0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0], sr=float(SR),
        hw_block_size=hw,
    )
    # Uniform readiness: every band comes online at 4 hw blocks (K=4 at
    # 75% overlap with block <= hw*4) — use the engine's own constant.
    from upmix_tpu.models.streaming import stream_warmup_blocks

    warmup = stream_warmup_blocks(cfg)
    n = len(L)
    lat = (warmup - 1) * hw
    pad = (-n) % hw + lat
    t0 = time.perf_counter()
    refL_raw, refR_raw = oracle_stream_multiband(
        np.pad(L, (0, pad)), np.pad(R, (0, pad)), cfg, hw
    )
    print(f"stream oracle {time.perf_counter() - t0:.1f}s", flush=True)
    refL, refR = refL_raw[lat : lat + n], refR_raw[lat : lat + n]
    warm = 4 * hw * 4  # generous: skip warmup region
    worst = np.inf
    for s in [warm, n // 2, n - SLICE]:
        sl = slice(s, s + SLICE)
        worst = min(worst, snr_db(refL[sl], oL[sl]), snr_db(refR[sl], oR[sl]))
        print(f"  pipe slice@{s:>9d}: L {snr_db(refL[sl], oL[sl]):6.1f} dB "
              f"R {snr_db(refR[sl], oR[sl]):6.1f} dB", flush=True)
    print(f"pipe soak worst slice SNR: {worst:.1f} dB", flush=True)
    assert worst > 60.0
    print("SOAK-PIPE-OK", flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "offline"
    {"offline": phase_offline, "serve": phase_serve, "pipe": phase_pipe}[phase]()
