#!/usr/bin/env python
"""Scale evidence for the kNN-join / kNN-graph family (VERDICT r08
directive 5: the newest machinery had the least scale evidence).

Times the REAL operators (the declared HOF-dot scoring path, not a
stand-in) at growing corpus sizes with FIXED search budgets, so the
log-log slope isolates the corpus term:

* kNN-join leg — a 2,000-row query batch against the 100k
  (scratch/sf5_emb) and 500k (scratch/sf25_emb, tools/gen_sf.py
  --emb-only) corpora; num_cells=256, nprobe=4, k=10.  Scored-pair
  count is |Q| x nprobe x N/num_cells — linear in N by construction;
  the measurement checks the plan actually delivers that (no hidden
  quadratic, no skew collapse).
* kNN-graph leg — the SELF-join (every row a query) + connected
  components at 20k (scratch/sf1) and 100k; num_cells=256, nprobe=2,
  k=5, threshold 0.9.  Scored pairs are N x nprobe x N/num_cells —
  QUADRATIC at fixed cells; production scales num_cells with N (the
  faiss sqrt(N) guideline) to hold N x nprobe x sqrt(N)... this leg
  therefore ALSO times a sqrt-scaled-cells variant (cells 141 -> 316)
  whose per-cell occupancy stays constant, the configuration a 100 TB
  run would use.

Appends a "knn_scaled" section to SF1_LEDGER.json (bench_scaling.py
carries it forward across refreshes).  Each pass is gated on 1-min
load < 0.7; per-point times are the median of 3 warmed runs.

Usage:  python tools/knn_scaling.py [ledger_json]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from paradump_spark.operators import similarity as SIM  # noqa: E402
from paradump_spark.session import build_session  # noqa: E402


def wait_quiet(threshold: float = 0.7, max_wait: int = 1200) -> float:
    waited = 0.0
    while waited < max_wait:
        with open("/proc/loadavg") as fh:
            load = float(fh.read().split()[0])
        if load < threshold:
            return load
        time.sleep(15)
        waited += 15
    return load


def timed(fn, runs: int = 3) -> float:
    """Median of ``runs`` timed executions, after one warmup."""
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    ledger_path = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SF1_LEDGER.json")
    )
    spark = build_session(
        app_name="knn_scaling", master="local[32]", shuffle_partitions=32
    )
    sec: dict = {"params": {
        "join": {"queries": 2000, "k": 10, "num_cells": 256, "nprobe": 4},
        "graph": {"k": 5, "num_cells": 256, "nprobe": 2, "threshold": 0.9},
        "graph_sqrt_cells": {"k": 5, "nprobe": 2, "threshold": 0.9,
                             "cells": "round(sqrt(N))"},
        "runs": "median-of-3 after warmup, load-gated < 0.7",
    }}

    # ---- kNN-join: fixed 2k-query batch, corpus 100k -> 500k ----
    join_pts = {}
    for name, d in (("100k", "scratch/sf5_emb"), ("500k", "scratch/sf25_emb")):
        print(f"join leg {name}: load {wait_quiet():.2f}")
        emb = spark.read.parquet(os.path.join(REPO, d, "embeddings.parquet"))
        q = emb.where(F.col("vec_id") < 2000)

        def run():
            SIM.knn_join(
                q, emb, "vec_id", "embedding", k=10,
                num_cells=256, nprobe=4,
            ).agg(F.count(F.lit(1))).collect()

        join_pts[name] = timed(run)
        print(f"  {join_pts[name]}s")
    sec["join"] = {
        **join_pts,
        "corpus_ratio": 5.0,
        "time_ratio": round(join_pts["500k"] / join_pts["100k"], 2),
        "exp": round(
            math.log(max(join_pts["500k"] / join_pts["100k"], 1e-9))
            / math.log(5), 2,
        ),
    }

    # ---- kNN-graph self-join + CC: 20k -> 100k ----
    for key, cells in (("graph", lambda n: 256),
                       ("graph_sqrt_cells", lambda n: round(math.sqrt(n)))):
        pts = {}
        for name, d, n in (("20k", "scratch/sf1", 20_000),
                           ("100k", "scratch/sf5_emb", 100_000)):
            print(f"{key} leg {name} (cells={cells(n)}): load {wait_quiet():.2f}")
            emb = spark.read.parquet(os.path.join(REPO, d, "embeddings.parquet"))

            def run():
                SIM.knn_graph_clusters(
                    emb, "vec_id", "embedding", threshold=0.9, k=5,
                    num_cells=cells(n), nprobe=2,
                ).agg(F.count(F.lit(1))).collect()

            pts[name] = timed(run)
            print(f"  {pts[name]}s")
        sec[key] = {
            **pts,
            "corpus_ratio": 5.0,
            "time_ratio": round(pts["100k"] / pts["20k"], 2),
            "exp": round(
                math.log(max(pts["100k"] / pts["20k"], 1e-9)) / math.log(5), 2,
            ),
        }

    with open(ledger_path) as fh:
        ledger = json.load(fh)
    ledger["knn_scaled"] = sec
    with open(ledger_path, "w") as fh:
        json.dump(ledger, fh, indent=1)
        fh.write("\n")
    print(json.dumps(sec, indent=1))


if __name__ == "__main__":
    main()
