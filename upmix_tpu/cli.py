"""Command-line interface.

The reference's config surface is edit-the-source constants
(main.py:29-30,62-73; bela/upmix.cpp:24-29,525).  This CLI exposes the same
knobs as real flags, with defaults exactly replicating main.py, plus batch
multi-file processing that reuses compiled programs across files.

Usage:
  python -m upmix_tpu.cli song.wav [more.wav ...] --export-mode stereo_sum
"""

from __future__ import annotations

import argparse
import sys

from upmix_tpu.app import EXPORT_MODES, run_offline
from upmix_tpu.utils.logging import get_logger

log = get_logger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="upmix_tpu",
        description="TPU-native multi-band stereo→LCR upmixer",
    )
    p.add_argument("inputs", nargs="+", help="input WAV file(s)")
    p.add_argument("--out-dir", default="out", help="output directory (default: out)")
    p.add_argument(
        "--export-mode",
        default="stereo_sum",
        choices=EXPORT_MODES,
        help="AB (upmix-vs-original), split (3 stereo files), stereo_sum "
        "(Ls+C/2 | Rs+C/2); default stereo_sum as in the reference main.py",
    )
    p.add_argument(
        "--band-edges",
        default="0,30,120,480,1920,7680",
        help="comma-separated crossover edges in Hz (reference default)",
    )
    p.add_argument("--overlap", type=float, default=0.75, help="STFT overlap (default 0.75)")
    p.add_argument(
        "--window",
        default="blackman_harris",
        choices=["blackman_harris", "sqrt_hann", "hann", "blackman", "hamming", "rect"],
    )
    p.add_argument(
        "--xover-mode",
        default="raised_cosine",
        choices=["raised_cosine", "hard_zero"],
        help="band-edge treatment (default raised_cosine)",
    )
    p.add_argument(
        "--max-block-size",
        type=int,
        default=2**16,
        help="cap on per-band STFT size (default 65536)",
    )
    p.add_argument(
        "--threshold-factor",
        type=float,
        default=32.0,
        help="dynamic-resolution threshold multiplier (default 32)",
    )
    p.add_argument(
        "--synthesis",
        default="wola",
        choices=["wola", "analysis"],
        help="synthesis window: WOLA-designed (Python parity) or plain "
        "analysis window (C++ parity)",
    )
    p.add_argument(
        "--subtype",
        default="FLOAT",
        choices=["FLOAT", "DOUBLE", "PCM_16", "PCM_24", "PCM_32"],
        help="output WAV sample format (default 32-bit float)",
    )
    p.add_argument("--verbose", action="store_true", help="print per-band config table")
    return p


def parse_edges(text: str):
    try:
        edges = [float(x) for x in text.split(",") if x.strip() != ""]
    except ValueError:
        raise SystemExit(f"error: --band-edges must be comma-separated numbers, got {text!r}")
    if not edges:
        raise SystemExit("error: --band-edges is empty")
    if sorted(edges) != edges:
        raise SystemExit("error: --band-edges must be ascending")
    return edges


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    edges = parse_edges(args.band_edges)

    for path in args.inputs:
        result = run_offline(
            path,
            out_dir=args.out_dir,
            export_mode=args.export_mode,
            band_edges=edges,
            overlap=args.overlap,
            window=args.window,
            xover_mode=args.xover_mode,
            max_block_size=args.max_block_size,
            threshold_factor=args.threshold_factor,
            synthesis=args.synthesis,
            subtype=args.subtype,
            verbose=args.verbose,
        )
        for out in result.paths:
            print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
