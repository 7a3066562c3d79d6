"""Serving-pool autotuner tests (upmix_tpu/tune.py): the sweep must
measure every feasible (batch, group) candidate with the interleaved
min-of-visits protocol, record infeasible ones with their error, and
pick the capacity-best feasible candidate.  Run tiny on the CPU
backend; the protocol is identical on hardware."""

import numpy as np
import pytest

from upmix_tpu.config import UpmixConfig
from upmix_tpu.tune import tune_pool

HW = 256
SR = 8000.0
EDGES = [0.0, 400.0, 1600.0]


def _cfg():
    return UpmixConfig.streaming(EDGES, sr=SR, hw_block_size=HW)


def test_tune_xla_sweep_picks_best():
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2, 4), groups=(2,), engine="xla",
        blocks=2, visits=2, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert len(ok) == 2  # one XLA candidate per batch (group ignored)
    best = report["best"]
    assert best is not None and best in report["results"]
    for r in ok:
        assert r["seconds_per_block"] > 0
        assert r["streams_per_chip"] == pytest.approx(
            r["batch"] * (HW / SR) / r["seconds_per_block"]
        )
        assert r["us_per_block_stream"] == pytest.approx(
            r["seconds_per_block"] / r["batch"] * 1e6
        )
    assert best["streams_per_chip"] == max(r["streams_per_chip"] for r in ok)
    assert report["protocol"]["estimator"].startswith("min-of-visits")
    assert report["protocol"]["transport_floor_seconds"] > 0


def test_tune_skips_indivisible_groups():
    report = tune_pool(
        _cfg(), HW, batch_sizes=(4,), groups=(3, 8), engine="pallas",
        blocks=1, visits=1, verbose=False,
    )
    # 4 % 3 != 0 and 4 % 8 != 0: nothing to measure.
    assert report["results"] == []
    assert report["best"] is None


def test_tune_records_failures_without_raising():
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2,), groups=(2,), engine="bogus",
        blocks=1, visits=1, verbose=False,
    )
    assert report["best"] is None
    (rec,) = report["results"]
    assert rec["ok"] is False
    assert "ValueError" in rec["error"]


def test_tune_pallas_candidate_on_cpu():
    # The pallas pool runs in interpret mode on CPU — slow but exact;
    # one tiny candidate proves the pallas arm of the sweep end-to-end
    # (group 8 is the smallest lane-eligible grid group).
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=1, visits=1, verbose=False,
    )
    best = report["best"]
    assert best is not None and best["engine"] == "pallas"
    assert best["group"] == 8 and best["batch"] == 8


def test_tune_cli_json(capsys):
    import json

    from upmix_tpu.tune import main

    rc = main([
        "--sr", str(SR), "--hw-block", str(HW),
        "--edges", "0,400,1600", "--batches", "2", "--groups", "2",
        "--engine", "xla", "--blocks", "1", "--visits", "1", "--json",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(line)
    assert report["best"]["batch"] == 2


def test_tune_xla_one_candidate_per_batch():
    # group is a pallas-only knob: --engine xla with 3 group values must
    # NOT time the same pool three times under G-labels.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2,), groups=(2, 4, 8), engine="xla",
        blocks=1, visits=1, verbose=False,
    )
    assert len(report["results"]) == 1
    (rec,) = report["results"]
    assert rec["ok"] and rec["group"] is None and "/G" not in rec["label"]


def test_tune_auto_dedupes_groupless_resolution():
    # engine='auto' on the CPU backend resolves to the XLA pool, which
    # ignores group — only the first group per batch is timed; the rest
    # are recorded as duplicates, not measured again.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2,), groups=(1, 2), engine="auto",
        blocks=1, visits=1, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    dup = [r for r in report["results"] if r["error"]
           and "duplicate" in r["error"]]
    assert len(ok) == 1 and len(dup) == 1


def test_tune_cli_json_exit_code_on_total_failure(capsys):
    import json

    from upmix_tpu.tune import main

    # batch 4 indivisible by group 3 -> no candidates at all; the
    # scripted (--json) path must exit nonzero like the human path.
    rc = main([
        "--sr", str(SR), "--hw-block", str(HW),
        "--edges", "0,400,1600", "--batches", "4", "--groups", "3",
        "--engine", "pallas", "--blocks", "1", "--visits", "1", "--json",
    ])
    assert rc == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["best"] is None


def test_tune_scan_protocol_xla():
    # scan protocol: one-dispatch chained steps per visit (chip-side
    # capacity); must resolve a best candidate and label the protocol.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2, 4), groups=(2,), engine="xla",
        blocks=4, visits=2, protocol="scan", unroll=2, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert len(ok) == 2
    assert report["best"] is not None
    assert report["protocol"]["name"] == "scan"
    assert report["protocol"]["unroll"] == 2
    for r in ok:
        assert r["seconds_per_block"] > 0


def test_tune_scan_protocol_pallas_interpret():
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=2, visits=1, protocol="scan", unroll=2, verbose=False,
    )
    best = report["best"]
    assert best is not None and best["engine"] == "pallas"
    assert best["group"] == 8


def test_tune_rejects_unknown_protocol():
    with pytest.raises(ValueError):
        tune_pool(_cfg(), HW, protocol="bogus")


def test_tune_hops_sweep_scan_pallas():
    # Temporal batching knob: hops=2 candidates run 2 blocks per kernel
    # launch (make_sustained_runner(hops=2)); both depths must measure
    # and the multi-hop one must carry the /T label.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=2, visits=1, protocol="scan", unroll=1, hops=(1, 2),
        verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert len(ok) == 2
    assert {r["hops"] for r in ok} == {1, 2}
    (t2,) = [r for r in ok if r["hops"] == 2]
    assert t2["label"].endswith("/T2")
    assert report["protocol"]["hops"] == [1, 2]
    assert report["best"] is not None


def test_tune_hops_dispatch_uses_push_blocks_multi():
    # dispatch protocol at hops=2: blocks are timed through
    # push_blocks_multi, 2 blocks per call; per-BLOCK normalization.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=2, visits=1, protocol="dispatch", hops=(2,),
        verbose=False,
    )
    (rec,) = report["results"]
    assert rec["ok"] and rec["hops"] == 2 and rec["label"].endswith("/T2")
    assert rec["seconds_per_block"] > 0


def test_tune_hops_infeasible_on_xla_resolution():
    # engine='auto' resolves to the XLA pool on CPU, which has no
    # multi-hop kernel: a hops>1 candidate is recorded infeasible, not
    # raised and not silently dropped.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2,), groups=(1,), engine="auto",
        blocks=2, visits=1, hops=(2,), verbose=False,
    )
    assert report["best"] is None
    (rec,) = report["results"]
    assert rec["ok"] is False and "multi-hop" in rec["error"]


def test_tune_hops_must_divide_blocks():
    # A depth that doesn't divide the visit length can't run whole
    # slabs; it is skipped like an indivisible group.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=3, visits=1, hops=(2,), verbose=False,
    )
    assert report["results"] == [] and report["best"] is None


def test_tune_lockstep_protocol_xla():
    # lockstep protocol: host inputs + full 3-output host fetch per
    # cycle (the stream server's dispatcher cost model,
    # serve_stream.py) — the transfers belong in the timed region.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(2, 4), groups=(2,), engine="xla",
        blocks=2, visits=2, protocol="lockstep", verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert len(ok) == 2
    assert report["protocol"]["name"] == "lockstep"
    assert report["best"] is not None
    for r in ok:
        assert r["seconds_per_block"] > 0


def test_tune_lockstep_hops_pallas_interpret():
    # The knob lockstep exists to resolve: hops=T candidates run whole
    # T-block cycles through push_blocks_multi with every output
    # fetched before the next cycle.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        blocks=2, visits=1, protocol="lockstep", hops=(1, 2),
        verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert {r["hops"] for r in ok} == {1, 2}
    (t2,) = [r for r in ok if r["hops"] == 2]
    assert t2["label"].endswith("/T2")


def test_tune_hops_window_layout_records_rejection():
    # The window layout re-shifts history per hop and rejects hops>1;
    # the tuner records that as a candidate failure.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(8,), groups=(8,), engine="pallas",
        layout="window", blocks=2, visits=1, protocol="scan",
        unroll=1, hops=(2,), verbose=False,
    )
    (rec,) = report["results"]
    assert rec["ok"] is False and "quarters" in rec["error"]


def test_tune_lockstep_pipeline_sweep_shares_pool():
    # pipeline=2 candidates time the SAME pool with the pipelined fetch
    # schedule (park cycle N's outputs, fetch after dispatching N+1) —
    # the build is shared, both depths are measured, labels carry /P2.
    report = tune_pool(
        _cfg(), HW, batch_sizes=(4,), groups=(2,), engine="xla",
        blocks=4, visits=2, protocol="lockstep", pipelines=(1, 2),
        verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert {r["pipeline"] for r in ok} == {1, 2}
    (p2,) = [r for r in ok if r["pipeline"] == 2]
    assert p2["label"].endswith("/P2")
    assert report["protocol"]["pipelines"] == [1, 2]
    for r in ok:
        assert r["seconds_per_block"] > 0


def test_tune_pipeline_rejected_off_lockstep():
    # pipelines is a lockstep-only knob: the scan/dispatch protocols
    # are already async-pipelined by jax dispatch, so a depth sweep
    # there would silently measure nothing.
    with pytest.raises(ValueError, match="lockstep"):
        tune_pool(_cfg(), HW, batch_sizes=(4,), engine="xla",
                  protocol="dispatch", pipelines=(1, 2), verbose=False)
    with pytest.raises(ValueError, match="1 or 2"):
        tune_pool(_cfg(), HW, batch_sizes=(4,), engine="xla",
                  protocol="lockstep", pipelines=(3,), verbose=False)


def test_tune_rejects_bad_hops_values():
    # hops=0 used to ZeroDivisionError in the divisibility check and a
    # negative depth timed an empty loop (a near-zero "winner").
    for bad in ((0,), (-2,), ()):
        with pytest.raises(ValueError, match="hops"):
            tune_pool(
                _cfg(), HW, batch_sizes=(8,), groups=(8,),
                engine="pallas", blocks=4, visits=1, hops=bad,
                verbose=False,
            )


def test_tune_offline_sweep():
    from upmix_tpu.tune import tune_offline

    report = tune_offline(
        sr=8000.0, band_edges=(0.0, 400.0, 1600.0), max_block_size=512,
        n_samples=4096, chunks=(2048, 4096, 0), kernel="mm", inner=2,
        visits=2, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    assert len(ok) == 3  # all feasible at this tiny geometry
    best = report["best"]
    assert best is not None and best in report["results"]
    for r in ok:
        assert r["seconds_per_application"] > 0
        assert r["realtime_factor"] == pytest.approx(
            (4096 / 8000.0) / r["seconds_per_application"]
        )
    assert best["realtime_factor"] == max(r["realtime_factor"] for r in ok)
    assert report["protocol"]["name"] == "offline"


def test_tune_offline_chunk_rounds_to_frame_grid():
    from upmix_tpu.tune import tune_offline

    # A chunk below the frame-grid unit is rounded up by the builder
    # (models/offline.py), not rejected: still a feasible candidate.
    report = tune_offline(
        sr=8000.0, band_edges=(0.0, 400.0, 1600.0), max_block_size=512,
        n_samples=4096, chunks=(7, 4096), kernel="mm", inner=1, visits=1,
        verbose=False,
    )
    assert all(r["ok"] for r in report["results"])
    assert report["protocol"]["chunk_active"]


def test_tune_offline_records_infeasible():
    from upmix_tpu.tune import tune_offline

    # Every candidate failing (unknown kernel) is recorded with its
    # error, not raised, and best is None.
    report = tune_offline(
        sr=8000.0, band_edges=(0.0, 400.0, 1600.0), max_block_size=512,
        n_samples=4096, chunks=(4096,), kernel="nope", inner=1, visits=1,
        verbose=False,
    )
    bad = [r for r in report["results"] if not r["ok"]]
    assert len(bad) == 1 and "error" in bad[0]
    assert report["best"] is None


def test_tune_offline_cli_json(capsys):
    from upmix_tpu.tune import main

    rc = main([
        "--offline", "--sr", "8000", "--edges", "0,400,1600",
        "--max-block-size", "512", "--samples", "4096",
        "--chunks", "4096", "--inner", "1", "--visits", "1", "--json",
    ])
    assert rc == 0
    import json

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["best"]["ok"]


def test_tune_offline_inactive_chunking_dedupes():
    # kernel=xla has no chunked scan: every candidate is the identical
    # whole-file program, so only one builds and the rest are recorded
    # as duplicates (review finding: ranking noise between copies of one
    # program is not a sweep).
    from upmix_tpu.tune import tune_offline

    report = tune_offline(
        sr=8000.0, band_edges=(0.0, 400.0, 1600.0), max_block_size=512,
        n_samples=4096, chunks=(2048, 4096), kernel="xla", inner=1,
        visits=1, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    dup = [r for r in report["results"]
           if r.get("error") and "identical program" in r["error"]]
    assert len(ok) == 1 and len(dup) == 1
    assert report["protocol"]["chunk_active"] is False


def test_tune_offline_clamped_chunks_deduped():
    # Chunks >= the input length all clamp to "whole input, one scan
    # step": only the first is distinct, later ones are duplicates.
    from upmix_tpu.tune import tune_offline

    report = tune_offline(
        sr=8000.0, band_edges=(0.0, 400.0, 1600.0), max_block_size=512,
        n_samples=4096, chunks=(2048, 4096, 8192), kernel="mm", inner=1,
        visits=1, verbose=False,
    )
    ok = [r for r in report["results"] if r["ok"]]
    dup = [r for r in report["results"]
           if r.get("error") and "duplicate" in r["error"]]
    assert len(ok) == 2  # 2048 (2-step scan) + 4096 (clamped whole)
    assert len(dup) == 1 and dup[0]["chunk"] == 8192
