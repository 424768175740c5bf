#!/usr/bin/env python
"""Scale evidence for the Hamming-band near-dup keyspace (VERDICT r09
directive 3 / the round-9 perf-weak flag): at ``max_hamming=4`` a
single-level band key is only 12-16 bits, so at ≥10⁶ DISTINCT
fingerprints each key holds ≥10² rows and the band equi-join's output
grows quadratically per key.  Round 10 added two-level
(occupancy-bounded) keys — this tool measures both policies on
synthetic distinct-fingerprint corpora:

* corpora — ``xxhash64(id)`` over ``spark.range(N)`` at N = 200k and
  1M: uniform 64-bit fingerprints, all distinct w.h.p., generated
  JVM-side (no decode — the keyspace is the object under test; real
  media pipelines reach this join only with their DISTINCT
  fingerprints, the exact-hash stage having absorbed identical balls).
* timed legs — ``hamming_band_pairs(...).count()`` single-level vs
  two-level (``sub_bands = max_hamming + 1``) at both scales; exp =
  log(t_1M / t_200k) / log(5).
* occupancy audit — per-key row counts from the operator's OWN key
  columns (:func:`hamming_band_key_cols`): max / p99 rows per key and
  the implied candidate-pair volume Σ c·(c−1)/2, the quantity that
  explodes on the single-level path.

Appends a ``hamming_scaled`` section to SF1_LEDGER.json.  Each pass is
gated on 1-min load < 0.7; per-point times are the median of 3 warmed
runs (the single-level 1M leg runs ONCE, unwarmed — it exists to
document the trap, not to be flattered).

Usage:  python tools/hamming_scaling.py [ledger_json] [--crossover]

``--crossover``: instead of the 200k/1M policy ledger, time BOTH
policies once at 2M and 4M distinct fingerprints — the bracket that
locates the wall-clock crossover ``HAMMING_WIDE_KEYS_MIN`` encodes —
and append ``hamming_crossover``.
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

from paradump_spark.operators import multimodal as MM  # noqa: E402
from paradump_spark.session import build_session  # noqa: E402

MAX_HAMMING = 4
SCALES = (("200k", 200_000), ("1m", 1_000_000))


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
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return round(statistics.median(ts), 3)


def corpus(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"), F.xxhash64("id").alias("phash")
        )
        .localCheckpoint(eager=True)
    )


def occupancy(df, sub_bands: int | None) -> dict:
    """Per-key row counts through the operator's own key columns."""
    bcols = MM.hamming_band_key_cols("phash", MAX_HAMMING, sub_bands)
    keyed = df.select(F.explode(F.array(*bcols)).alias("__band"))
    stats = (
        keyed.groupBy("__band")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("max_rows"),
            F.expr("percentile_approx(c, 0.99)").alias("p99_rows"),
            F.sum(
                (F.col("c") * (F.col("c") - F.lit(1)) / F.lit(2)).cast("long")
            ).alias("candidate_pairs"),
            F.count(F.lit(1)).alias("distinct_keys"),
        )
        .collect()[0]
    )
    return {
        "max_rows_per_key": int(stats["max_rows"]),
        "p99_rows_per_key": int(stats["p99_rows"]),
        "candidate_pairs": int(stats["candidate_pairs"]),
        "distinct_keys": int(stats["distinct_keys"]),
    }


def crossover(ledger_path: str) -> None:
    """Measure the single-vs-two-level WALL-CLOCK crossover directly
    (``--crossover``): one timed run of each policy at 2M and 4M
    distinct fingerprints — the bracket around the extrapolated
    2-4M crossover that :data:`multimodal.HAMMING_WIDE_KEYS_MIN`
    encodes.  Single runs, not medians: the single-level 4M leg
    materializes ~10⁹ candidate pairs and exists to locate the
    crossover, not to be flattered.  Appends ``hamming_crossover``."""
    spark = build_session(
        app_name="hamming_crossover", master="local[32]",
        shuffle_partitions=32,
    )
    sec: dict = {"params": {
        "max_hamming": MAX_HAMMING,
        "sub_bands": MAX_HAMMING + 1,
        "corpora": "xxhash64(range(N)) distinct fingerprints, N=2M/4M",
        "runs": "ONE warmed run per point, load-gated < 0.7 (crossover "
                "location, not throughput)",
    }}
    for name, n in (("2m", 2_000_000), ("4m", 4_000_000)):
        df = corpus(spark, n)
        for policy, sub in (("single_level", None), ("two_level", MAX_HAMMING + 1)):

            def run(df=df, sub=sub):
                MM.hamming_band_pairs(
                    df, "doc_id", "phash", MAX_HAMMING, sub_bands=sub
                ).agg(F.count(F.lit(1))).collect()

            print(f"{policy} {name}: load {wait_quiet():.2f}")
            run()  # warm the session/codegen path once per point
            t0 = time.monotonic()
            run()
            t = round(time.monotonic() - t0, 3)
            sec.setdefault(policy, {})[name] = t
            print(f"  {t}s")
        df.unpersist()
    sec["wall_clock_winner"] = {
        name: ("two_level"
               if sec["two_level"][name] < sec["single_level"][name]
               else "single_level")
        for name in ("2m", "4m")
    }
    with open(ledger_path) as fh:
        ledger = json.load(fh)
    ledger["hamming_crossover"] = sec
    with open(ledger_path, "w") as fh:
        json.dump(ledger, fh, indent=1)
        fh.write("\n")
    print(json.dumps(sec, indent=1))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--crossover"]
    ledger_path = argv[0] if argv else os.path.join(REPO, "SF1_LEDGER.json")
    if "--crossover" in sys.argv[1:]:
        crossover(ledger_path)
        return
    spark = build_session(
        app_name="hamming_scaling", master="local[32]", shuffle_partitions=32,
    )
    sec: dict = {"params": {
        "max_hamming": MAX_HAMMING,
        "sub_bands": MAX_HAMMING + 1,
        "corpora": "xxhash64(range(N)) distinct fingerprints, N=200k/1M",
        "runs": "median-of-3 after warmup, load-gated < 0.7 "
                "(single_level 1m: one unwarmed run — trap documentation)",
    }}

    frames = {}
    for name, n in SCALES:
        frames[name] = corpus(spark, n)

    for policy, sub in (("single_level", None), ("two_level", MAX_HAMMING + 1)):
        pts: dict = {}
        occ: dict = {}
        for name, n in SCALES:
            df = frames[name]
            occ[name] = occupancy(df, sub)
            print(f"{policy} {name}: occupancy {occ[name]}")

            def run(df=df, sub=sub):
                MM.hamming_band_pairs(
                    df, "doc_id", "phash", MAX_HAMMING, sub_bands=sub
                ).agg(F.count(F.lit(1))).collect()

            if policy == "single_level" and name == "1m":
                print(f"{policy} {name}: load {wait_quiet():.2f} (single run)")
                t0 = time.monotonic()
                run()
                pts[name] = round(time.monotonic() - t0, 3)
            else:
                print(f"{policy} {name}: load {wait_quiet():.2f}")
                pts[name] = timed(run)
            print(f"  {pts[name]}s")
        sec[policy] = {
            **pts,
            "occupancy": occ,
            "corpus_ratio": 5.0,
            "time_ratio": round(pts["1m"] / pts["200k"], 2),
            "exp": round(
                math.log(max(pts["1m"] / pts["200k"], 1e-9)) / math.log(5), 2
            ),
        }

    with open(ledger_path) as fh:
        ledger = json.load(fh)
    ledger["hamming_scaled"] = sec
    with open(ledger_path, "w") as fh:
        json.dump(ledger, fh, indent=1)
        fh.write("\n")
    print(json.dumps(sec, indent=1))


if __name__ == "__main__":
    main()
