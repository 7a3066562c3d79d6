"""Functional smoke of the multi-process serving harness — the evidence
artifact behind BASELINE.md's de-GIL'd serving row (VERDICT r3 item 4).
Runs the real orchestrator (server subprocess + client subprocesses +
metrics wire query) on the CPU backend with tiny sessions; the on-chip
runs use the same code path with BENCH_CPU unset.
"""

import os
import subprocess
import sys

from helpers import cpu_child_env

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mp_serving_harness_smoke():
    env = cpu_child_env()
    env.update(
        BENCH_CPU="1",
        BENCH_CLIENTS="2",
        BENCH_SECONDS="2",
        BENCH_PORT="57463",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "scripts", "bench_serve_stream_mp.py"),
        ],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    out = proc.stdout
    assert "AGGREGATE" in out and "x realtime" in out
    # Attribution comes from the server's own histograms over the wire.
    assert "dispatch_seconds: p50" in out
    assert "cycle_seconds: p50" in out
