#!/usr/bin/env python
"""Produce SF1_LEDGER.json — per-query scaling factors sf0.1 → sf1
(VERDICT r05 directive 3: turn "the plans hold at scale" into a
measurement).

Runs bench.py twice back-to-back on a quiet host — first at sf0.1
(median-of-3), then at the tools/gen_sf.py sf1 dataset (10× rows) —
and writes per-query seconds + the sf1/sf0.1 ratio.  The linear budget
is 10×; a query scaling materially worse than that gets a plan
investigation (the ledger marks ratios > the budget with "over").

Usage:  python tools/bench_scaling.py [sf1_dir] [out_json] [--merge-min]
        [--sf5 DIR]

``--sf5 DIR``: add a THIRD scale point (50× sf0.1 rows, 5× sf1 — from
tools/gen_sf.py) to every timed query (VERDICT r07 directive 4).  Each
query then carries an ``exp`` estimate — the log-log slope between the
sf1 and sf5 points, log(t5/t1)/log(5) — the number that distinguishes
fixed-overhead-dominated (exp ≈ 0), linear (exp ≈ 1), and superlinear
(exp > 1) behavior where a single ratio cannot.  The sf5 budget is
ratio ≤ 6 over sf1 (5× rows + shuffle overhead).

``--merge-min``: merge with the existing ledger by PER-QUERY MINIMUM of
the measured medians (totals and ratios recomputed from the merged
values).  Rationale: this host shows random CPU-steal windows that
inflate same-binary bench totals 35–55 s at sf0.1 (BASELINE.md bench
protocol); steal only ever ADDS time, so the min over repeated
median-of-3 refreshes converges on the unstolen value.  Every merged
number remains a real measured median from one pass; the ledger note
records that min-merge was used.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINEAR_BUDGET = 12.0  # 10x data + modest shuffle superlinearity
SF5_BUDGET = 6.0      # sf1 -> sf5 leg: 5x rows + shuffle overhead


def run_bench(sf_dir: str, runs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS=str(runs),
        SPARK_GRAFT_SF1_LEDGER="/nonexistent",  # don't self-embed
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def current_commit() -> str:
    """Min-merge guard key (ADVICE r07: a min taken across code
    versions can keep a stale fast measurement and mask a regression).

    Keyed on the MEASUREMENT-RELEVANT code objects — bench.py, the
    package tree, the query entry file — not the repo HEAD: a
    doc-only commit (BASELINE/SURVEY notes, the ledger itself) does
    not change what any query executes, and resetting every minimum
    on it would make repeated same-code refreshes pointless (round 9:
    a BASELINE note between two refreshes orphaned the whole ledger).
    Any change to the measured code still rotates the key."""
    try:
        import hashlib

        # the measurement HARNESS and the dataset GENERATOR are part of
        # the key too (ADVICE r09): a timing-protocol or generated-data
        # change would otherwise min-merge incomparable measurements
        # under the same key — the exact stale-minimum hazard this
        # guard exists to prevent
        objs = subprocess.run(
            ["git", "rev-parse", "HEAD:bench.py", "HEAD:paradump_spark",
             "HEAD:__spark_entry__.py", "HEAD:tools"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        h = "code-" + hashlib.sha256(objs.encode()).hexdigest()[:12]
        dirty = subprocess.run(
            # only dirt in the measured code flips the key; generated
            # artifacts (ledger, scratch datasets/logs) and docs don't
            ["git", "status", "--porcelain", "--",
             "bench.py", "paradump_spark", "__spark_entry__.py", "tools"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return h + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"


def load_avg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def wait_quiet(threshold: float = 0.7, max_wait: int = 1200) -> float:
    """Block until the 1-min load drops below ``threshold`` (or give up
    after ``max_wait`` s).  The first ledger run recorded a back-to-back
    sf1 pass inside the previous pass's writeback/steal window and
    flagged two perfectly linear queries as 40x 'over' — the quiet gate
    (BASELINE.md bench protocol) applies to EACH pass, not just the
    first."""
    import time

    waited = 0
    while load_avg() >= threshold and waited < max_wait:
        time.sleep(15)
        waited += 15
    return load_avg()


def main() -> None:
    argv = sys.argv[1:]
    sf5_dir = None
    if "--sf5" in argv:
        i = argv.index("--sf5")
        sf5_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--merge-min"]
    merge_min = "--merge-min" in argv
    sf1_dir = args[0] if len(args) > 0 else os.path.join(REPO, "scratch/sf1")
    out_path = args[1] if len(args) > 1 else os.path.join(REPO, "SF1_LEDGER.json")
    loads = {"sf0.1_start": round(wait_quiet(), 2)}
    print(f"load before: {loads['sf0.1_start']:.2f}")
    base = run_bench("/root/testdata/sf0.1", runs=3)
    print(f"sf0.1 total {base['value']}s; load now {load_avg():.2f}")
    loads["sf1_start"] = round(wait_quiet(), 2)
    big = run_bench(sf1_dir, runs=3)
    loads["sf1_end"] = round(load_avg(), 2)
    print(f"sf1 total {big['value']}s; load now {loads['sf1_end']:.2f}")
    huge = None
    if sf5_dir:
        loads["sf5_start"] = round(wait_quiet(), 2)
        huge = run_bench(sf5_dir, runs=3)
        loads["sf5_end"] = round(load_avg(), 2)
        print(f"sf5 total {huge['value']}s; load now {loads['sf5_end']:.2f}")

    import math

    scaling = {}
    for k, t01 in base["queries"].items():
        t1 = big["queries"].get(k)
        if t1 is None:
            continue
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        scaling[k] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": ratio,
            "verdict": (
                "over" if ratio is not None and ratio > LINEAR_BUDGET else "ok"
            ),
        }
        t5 = (huge or {}).get("queries", {}).get(k)
        if t5 is not None:
            scaling[k]["sf5_sec"] = t5
            if t1 > 0:
                r5 = t5 / t1
                scaling[k]["ratio_sf5_vs_sf1"] = round(r5, 2)
                # log-log slope over the sf1→sf5 leg (the fixed-overhead
                # floor has amortized by sf1, so this is the data-term
                # exponent): exp ≈ 0 overhead-bound, 1 linear, >1 super
                scaling[k]["exp"] = round(math.log(max(r5, 1e-9)) / math.log(5), 2)
                if r5 > SF5_BUDGET:
                    scaling[k]["verdict"] = "over-sf5"
    # carry forward sections other tools append (tools/recall_scaling.py)
    extra, prev = {}, None
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            extra = {
                k: v
                for k, v in prev.items()
                if k in ("recall_scaled_sf1", "recall_auto_budget_sf1",
                         "knn_scaled", "hamming_scaled", "hamming_crossover")
            }
        except Exception:
            extra, prev = {}, None

    commit = current_commit()
    for v in scaling.values():
        v["commit"] = commit
    merged = False
    if merge_min and prev and isinstance(prev.get("queries"), dict):
        for k, v in scaling.items():
            old = prev["queries"].get(k)
            # same-commit guard (ADVICE r07): a query whose code changed
            # since the old measurement must NOT inherit the old (possibly
            # faster) number — its entry resets to this pass's values
            if not old or old.get("commit") != commit:
                continue
            v["sf0.1_sec"] = min(v["sf0.1_sec"], old["sf0.1_sec"])
            v["sf1_sec"] = min(v["sf1_sec"], old["sf1_sec"])
            if "sf5_sec" in v and "sf5_sec" in old:
                v["sf5_sec"] = min(v["sf5_sec"], old["sf5_sec"])
            elif "sf5_sec" in old:  # sf5 pass skipped this refresh
                v["sf5_sec"] = old["sf5_sec"]
            v["ratio"] = (
                round(v["sf1_sec"] / v["sf0.1_sec"], 2)
                if v["sf0.1_sec"] > 0 else None
            )
            v["verdict"] = (
                "over"
                if v["ratio"] is not None and v["ratio"] > LINEAR_BUDGET
                else "ok"
            )
            if "sf5_sec" in v and v["sf1_sec"] > 0:
                r5 = v["sf5_sec"] / v["sf1_sec"]
                v["ratio_sf5_vs_sf1"] = round(r5, 2)
                v["exp"] = round(math.log(max(r5, 1e-9)) / math.log(5), 2)
                if r5 > SF5_BUDGET:
                    v["verdict"] = "over-sf5"
        merged = True

    note = (
        "sf1 = tools/gen_sf.py synthetic 10x of sf0.1 (same schemas/"
        "distribution shapes, not driver bytes); sf0.1 side is the "
        "driver dataset. ratio = sf1_sec / sf0.1_sec; linear budget "
        f"{LINEAR_BUDGET} (10x rows + shuffle overhead). both sides "
        "per-query median-of-3, each pass gated on 1-min load < 0.7."
    )
    if merged:
        note += (
            " values are per-query MINIMA over repeated refreshes "
            "(--merge-min): this host's random CPU-steal windows only "
            "ever ADD time, so the min of measured medians converges on "
            "the unstolen value; every number is a real single-pass "
            "median. minima only merge measurements from the SAME git "
            "commit (recorded per query); a query touched since its old "
            "measurement resets to the fresh pass."
        )
    if sf5_dir or any("sf5_sec" in v for v in scaling.values()):
        note += (
            f" sf5 = gen_sf.py at 50x sf0.1 rows (5x sf1); exp = "
            f"log(sf5_sec/sf1_sec)/log(5), the sf1->sf5 log-log slope "
            f"(0 = overhead-bound, 1 = linear); sf5 budget "
            f"{SF5_BUDGET} over sf1."
        )
    tot01 = round(sum(v["sf0.1_sec"] for v in scaling.values()), 3)
    tot1 = round(sum(v["sf1_sec"] for v in scaling.values()), 3)
    with5 = [v for v in scaling.values() if "sf5_sec" in v]
    ledger = {
        **extra,
        "note": note,
        "linear_budget": LINEAR_BUDGET,
        "sf5_budget": SF5_BUDGET,
        "load_gate": loads,
        # totals over the COMMON timed-query set (== bench value when not
        # merged, since every query appears in both passes)
        "sf0.1_total": tot01,
        "sf1_total": tot1,
        "total_ratio": round(tot1 / tot01, 2) if tot01 else None,
        "sf5_total": (
            round(sum(v["sf5_sec"] for v in with5), 3) if with5 else None
        ),
        "sf5_total_ratio_vs_sf1": (
            round(
                sum(v["sf5_sec"] for v in with5)
                / sum(v["sf1_sec"] for v in with5),
                2,
            )
            if with5 else None
        ),
        "n_over_budget": sum(
            1 for v in scaling.values() if v["verdict"].startswith("over")
        ),
        "queries": scaling,
        "ann_recall_sf1": big.get("ann_recall"),
    }
    with open(out_path, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(json.dumps({k: v for k, v in ledger.items() if k != "queries"}, indent=1))
    for k, v in sorted(scaling.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
        tail = ""
        if "sf5_sec" in v:
            tail = f" -> {v['sf5_sec']:.2f}s exp={v.get('exp')}"
        print(
            f"{k:28s} {v['sf0.1_sec']:>8.2f}s -> {v['sf1_sec']:>8.2f}s"
            f"  x{v['ratio']}  {v['verdict']}{tail}"
        )


if __name__ == "__main__":
    main()
