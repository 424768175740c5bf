#!/usr/bin/env python
"""Measure ANN recall at the AUTO-DERIVED search budgets (VERDICT r06
directive 4) and ledger it.

Round 6 wired the size-scaled budget rules into `suggest_index_params`
but the query paths kept fixed defaults, so a user querying a grown
index silently got the degraded fixed-budget recall (0.615–0.749 at
sf1).  Round 7 makes ``nprobe=None`` / ``rescore=None`` the defaults
(derived per-index via `similarity.derive_search_budget`); this tool
proves the defaults now deliver the scaled recall on the same sf1
corpus the degradation was measured on, appending the numbers to
SF1_LEDGER.json under "recall_auto_budget_sf1".

Usage:  python tools/recall_auto.py [sf1_dir] [ledger_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from paradump_spark.operators import pq as PQ  # noqa: E402
from paradump_spark.operators import similarity as SIM  # noqa: E402
from paradump_spark.session import build_session  # noqa: E402


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scratch/sf1")
    ledger_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "SF1_LEDGER.json")
    )
    spark = build_session(
        app_name="recall_auto",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(1024 * 1024)},
    )
    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    n = emb.count()
    q = emb.where(F.col("vec_id") < 100)
    exact = SIM.brute_force_topk(emb, q, "vec_id", "embedding", k=10)
    exact.cache().count()

    out: dict = {"n_vectors": n}

    # flat PQ at the auto rescore (max(10k, N/20))
    books = PQ.train_pq(emb, "vec_id", "embedding", m=8, ksub=256)
    codes = PQ.pq_encode(emb, "embedding", books)
    codes.cache().count()
    got = PQ.pq_adc_topk(codes, q, books, "vec_id", "embedding", k=10)
    out["pq_auto"] = round(
        SIM.ann_recall(got, exact).collect()[0]["mean_recall"], 4
    )
    codes.unpersist()
    print(f"pq auto rescore: {out['pq_auto']}")

    ivf_dir = tempfile.mkdtemp(prefix="recall_auto_")
    try:
        # the ledger's under-celled setup: 16 cells for 20k vectors —
        # exactly the grown-by-appends shape the auto budget must rescue
        ipath = os.path.join(ivf_dir, "ivfpq")
        PQ.ivf_pq_build_index(
            emb, ipath, "vec_id", "embedding", num_cells=16, m=8, ksub=256,
            residual=False,
        )
        got = PQ.ivf_pq_query_index(spark, ipath, q, "vec_id", "embedding", k=10)
        out["ivfpq_flat_auto"] = round(
            SIM.ann_recall(got, exact).collect()[0]["mean_recall"], 4
        )
        print(f"ivfpq flat auto: {out['ivfpq_flat_auto']}")

        # plain IVF at the auto nprobe
        ppath = os.path.join(ivf_dir, "ivf")
        SIM.ivf_build_index(emb, ppath, "vec_id", "embedding", num_cells=16)
        got = SIM.ivf_query_index(spark, ppath, q, "vec_id", "embedding", k=10)
        out["ivf_auto"] = round(
            SIM.ann_recall(got, exact).collect()[0]["mean_recall"], 4
        )
        print(f"ivf auto: {out['ivf_auto']}")
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
    exact.unpersist()

    with open(ledger_path) as fh:
        ledger = json.load(fh)
    ledger["recall_auto_budget_sf1"] = {
        "note": (
            "recall@10 at sf1 with nprobe/rescore OMITTED — the "
            "per-index auto-derived budgets (derive_search_budget) a "
            "user now gets by default; compare recall_scaled_sf1 "
            "(manual scaling) and ann_recall_sf1 (old fixed defaults)."
        ),
        **out,
    }
    with open(ledger_path, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(json.dumps(ledger["recall_auto_budget_sf1"], indent=1))


if __name__ == "__main__":
    main()
