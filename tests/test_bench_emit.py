"""Regression guard for VERDICT r06 directive 1: bench.py's FINAL stdout
line must be a compact, driver-parseable headline JSON (<4 kB), with the
bulky per-query runs + embedded sf1 ledger emitted on an EARLIER line.
Round 6's single giant line truncated the driver's bounded tail capture
and BENCH_r06.json recorded `parsed: null`."""

import io
import json

import bench


def _fake_inputs(n_queries):
    times = {f"q{i:03d}": 0.123 + i * 0.001 for i in range(n_queries)}
    runs = {k: [v, v + 0.01, v + 0.02] for k, v in times.items()}
    recalls = {
        "recall_at_10_nprobe4": 0.97,
        "recall_at_10_nprobe8": 0.99,
        "recall_at_10_pq_adc_r100": 0.95,
        "recall_at_10_ivfpq_flat_r50": 0.93,
        "recall_at_10_ivfpq_residual_r50": 0.96,
    }
    lsh = {"dedup_recall_at_j08": 0.992, "dedup_precision_at_j08": 0.615}
    # a realistically bulky sf1 ledger: ~40 per-query entries
    ledger = {
        "total_ratio": 2.87,
        "queries": {
            f"q{i:03d}": {"sf0.1_sec": 1.0, "sf1_sec": 2.9, "ratio": 2.9,
                          "verdict": "ok"}
            for i in range(40)
        },
    }
    return times, runs, recalls, lsh, ledger


def test_final_line_is_compact_parseable_headline():
    times, runs, recalls, lsh, ledger = _fake_inputs(40)
    buf = io.StringIO()
    headline = bench.emit_results(
        times=times, runs=runs, recalls=recalls, lsh_quality=lsh,
        sf1_ledger=ledger, r03_keys=list(times)[:22], sf="0.1",
        n_runs=3, out=buf,
    )
    lines = buf.getvalue().strip().splitlines()
    # final line parses alone, is the headline, and stays under 4 kB
    last = lines[-1]
    assert len(last) < 4096
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec"
    assert parsed["queries"] == times
    assert parsed["sf1_total_ratio"] == 2.87
    assert parsed["subtotal_r03_comparable"] > 0
    assert parsed == headline
    # bulk (runs arrays, full sf1 ledger) is on an earlier line, not the last
    assert "runs" not in parsed and "sf1" not in parsed
    detail = json.loads(lines[0])
    assert detail["detail"] == "bench_sidecar"
    assert detail["runs"] == runs
    assert detail["sf1"]["total_ratio"] == 2.87


def test_oversized_headline_fails_loudly():
    times, runs, recalls, lsh, ledger = _fake_inputs(1200)
    buf = io.StringIO()
    try:
        bench.emit_results(
            times=times, runs=runs, recalls=recalls, lsh_quality=lsh,
            sf1_ledger=ledger, r03_keys=[], sf="0.1", n_runs=3, out=buf,
        )
    except AssertionError as exc:
        assert "driver-parseable" in str(exc)
    else:
        raise AssertionError("expected the <4kB guard to trip")


def test_headline_carries_load_evidence_and_suspect_flags():
    """VERDICT r09 directive 6: the headline must carry 1-min load
    evidence and flag queries whose median exceeds their min-merged
    ledger minimum by >1.5x — a contaminated run self-identifies."""
    times, runs, recalls, lsh, ledger = _fake_inputs(10)
    times["q003"] = 1.51  # ledger sf0.1_sec is 1.0 -> > 1.5x
    times["q004"] = 1.49  # just inside the gate -> NOT flagged
    loads = {k: (0.3 + i * 0.01, 0.35 + i * 0.01)
             for i, k in enumerate(times)}
    buf = io.StringIO()
    headline = bench.emit_results(
        times=times, runs=runs, recalls=recalls, lsh_quality=lsh,
        sf1_ledger=ledger, r03_keys=[], sf="0.1", n_runs=3, out=buf,
        loads=loads,
    )
    assert headline["suspect_load"] == ["q003"]
    assert headline["load_1min"]["start"] == 0.3
    assert headline["load_1min"]["end"] == 0.35 + 9 * 0.01
    assert headline["load_1min"]["max"] >= 0.35
    # sidecar carries the full per-query load pairs
    detail = json.loads(buf.getvalue().strip().splitlines()[0])
    assert detail["query_loads"]["q000"] == [0.3, 0.35]
