"""Deterministic shard export — the training-data handoff sink.

A trainer consumes a corpus as N equal-ish shards whose membership must
be reproducible: re-running the export after adding sources must keep
every old document in the same shard (only shard CONTENT grows), any
engine must be able to compute "which shard is doc X in" from the id
alone, and each shard must arrive as ONE file so the data loader can
assign shard → worker without a listing dance.

The reference engine's analogue is the per-chunk dump-file fan-out
(`src/paradump/paradump.go` dump stage: one writer per chunk, `%p` part
templates in file names); here the unit is a content-hash shard rather
than a PK range chunk, because trainers key on reproducible membership,
not on source-DB clustering.

Scale shape: assignment is a pure projection (md5 bucket — same
convention as `operators.sampling.hash_bucket`, so the DuckDB oracle and
any downstream engine reproduce it in one SQL expression).  The write is
ONE hash shuffle on the shard id, then a Hive-partitioned write — shard
directories land in parallel, one file each because the shuffle made
partition == shard.  Shard skew is bounded by md5 uniformity
(±O(sqrt(rows/shards))), so no salting is needed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paradump_spark.operators.sampling import hash_bucket


def shard_id(col: Column, n_shards: int, seed: str = "") -> Column:
    """Stable shard in ``[0, n_shards)`` from the id's md5.

    DuckDB spelling (oracle / external reproduction):
    ``('0x' || substr(md5(seed || CAST(v AS VARCHAR)), 1, 15))::BIGINT
    % n_shards``.
    """
    return hash_bucket(col, seed=seed, denom=n_shards).alias("shard")


def shard_plan(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard statistics BEFORE writing: (shard, n_rows[, n_bytes]).

    One partially-aggregated job — the planning analogue of the chunk
    coverage check (`plans/split.py`): the trainer can size its data
    loaders, and ``sum(n_rows)`` must equal the corpus count (leakage /
    drop check).
    """
    keyed = df.withColumn("shard", shard_id(F.col(id_col), n_shards, seed))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("n_bytes"))
    return keyed.groupBy("shard").agg(*aggs).orderBy("shard")


def write_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    seed: str = "",
    fmt: str = "parquet",
    sort_col: str | None = None,
) -> str:
    """Export ``df`` as ``n_shards`` deterministic shards plus a
    ``_shards.json`` manifest.

    Layout: ``out_dir/shard=<i>/part-*.{parquet,jsonl}`` — exactly one
    data file per shard because the single hash shuffle keys partitions
    by the shard id itself.  ``sort_col`` orders rows inside each shard
    (``sortWithinPartitions`` — no extra shuffle) so shard files are
    byte-reproducible run-to-run.

    Manifest: per-shard row count + an order-insensitive content
    checksum (sum of row-md5s, same convention as
    `operators.checksum.table_checksum`) so :func:`verify_shards` — or
    any md5-capable engine — can prove a delivered shard set faithful
    without re-reading the source.
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")
    keyed = df.withColumn("shard", shard_id(F.col(id_col), n_shards, seed))
    keyed = keyed.repartition(n_shards, "shard")
    if sort_col is not None:
        keyed = keyed.sortWithinPartitions(sort_col)

    if fmt == "parquet":
        keyed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    else:
        cols = [c for c in keyed.columns if c != "shard"]
        (
            keyed.select(
                F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
                "shard",
            )
            .write.mode("overwrite")
            .partitionBy("shard")
            .text(out_dir)
        )

    stats = _shard_checksums(df, id_col, n_shards, seed)
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "format": fmt,
        "sort_col": sort_col,
        "shards": stats,
    }
    path = os.path.join(out_dir, "_shards.json")
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return path


def _shard_checksums(
    df: DataFrame, id_col: str, n_shards: int, seed: str
) -> dict[str, dict]:
    """(n_rows, hash_sum) per shard in ONE aggregated job.

    hash_sum = Σ first-15-hex-digits of md5(concat of all columns) —
    order-insensitive, overflow-safe in decimal(38,0), and computable by
    the restore-side engine without Spark.
    """
    cols = sorted(df.columns)
    row_repr = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    row_hash = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    agg = (
        df.withColumn("shard", shard_id(F.col(id_col), n_shards, seed))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_hash).alias("hash_sum"),
        )
        .collect()
    )
    return {
        str(r["shard"]): {"n_rows": int(r["n_rows"]), "hash_sum": str(r["hash_sum"])}
        for r in agg
    }


def verify_shards(spark, out_dir: str) -> dict[str, bool]:
    """Recompute each parquet shard's (n_rows, hash_sum) from the written
    files and compare to the manifest; True = faithful — a tampered,
    truncated, or mis-bucketed shard flips its entry to False.

    jsonl shards carry the same manifest but the parse-back schema is the
    caller's: read them with ``spark.read.json`` and checksum via
    `operators.checksum.table_checksum` against the manifest entries.
    """
    with open(os.path.join(out_dir, "_shards.json")) as fh:
        manifest = json.load(fh)
    if manifest["format"] != "parquet":
        raise ValueError(
            "verify_shards recomputes typed checksums and supports "
            "parquet shard sets; for jsonl read the shards back with "
            "spark.read.json and use operators.checksum.table_checksum"
        )
    back = spark.read.parquet(out_dir)
    cols = sorted(c for c in back.columns if c != "shard")
    row_repr = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
    )
    got = (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast(
                    "decimal(38,0)"
                )
            ).alias("hash_sum"),
        )
        .collect()
    )
    recomputed = {
        str(r["shard"]): (int(r["n_rows"]), str(r["hash_sum"])) for r in got
    }
    # Compare over the UNION of manifest and on-disk shard ids: a shard
    # directory whose id is absent from the manifest (planted data) is
    # just as unfaithful as a manifest shard that lost rows, so it must
    # surface as a False entry rather than being silently skipped.
    declared = {
        s: (m["n_rows"], m["hash_sum"]) for s, m in manifest["shards"].items()
    }
    return {
        s: recomputed.get(s) == declared.get(s)
        for s in set(declared) | set(recomputed)
    }


def append_to_shards(
    df_new: DataFrame,
    out_dir: str,
) -> str:
    """Append new rows to an existing shard set — the late-arriving-shard
    path: membership is content-hashed, so old documents never move and
    only shard CONTENT grows.

    Reads the manifest for the frozen (n_shards, seed, id_col, format),
    writes the new rows into the same ``shard=<i>`` layout in append
    mode, and updates the manifest EXACTLY without touching old data:
    both ``n_rows`` and the order-insensitive ``hash_sum`` are additive,
    so the delta aggregate over ``df_new`` alone suffices.
    ``verify_shards`` afterwards proves the merged set faithful.

    Caller contract (same as any append-only corpus): new ids must be
    new — this function does not scan history to check (at scale that
    is the dedup/signature-store layer's job, `operators.dedup`).

    Ordering: the manifest's frozen ``sort_col`` (recorded by
    :func:`write_shards`) is re-applied with ``sortWithinPartitions``,
    so every part FILE is internally ordered and byte-reproducible.
    Across files within a shard the order is append order — full-shard
    byte reproducibility is a property of the initial export only.
    """
    with open(os.path.join(out_dir, "_shards.json")) as fh:
        manifest = json.load(fh)
    n_shards = int(manifest["n_shards"])
    seed = manifest["seed"]
    id_col = manifest["id_col"]
    fmt = manifest["format"]
    sort_col = manifest.get("sort_col")

    keyed = df_new.withColumn(
        "shard", shard_id(F.col(id_col), n_shards, seed)
    ).repartition(n_shards, "shard")
    if sort_col is not None:
        keyed = keyed.sortWithinPartitions(sort_col)
    if fmt == "parquet":
        keyed.write.mode("append").partitionBy("shard").parquet(out_dir)
    else:
        cols = [c for c in keyed.columns if c != "shard"]
        (
            keyed.select(
                F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
                "shard",
            )
            .write.mode("append")
            .partitionBy("shard")
            .text(out_dir)
        )

    delta = _shard_checksums(df_new, id_col, n_shards, seed)
    from decimal import Decimal

    for s, d in delta.items():
        old = manifest["shards"].get(s, {"n_rows": 0, "hash_sum": "0"})
        manifest["shards"][s] = {
            "n_rows": old["n_rows"] + d["n_rows"],
            "hash_sum": str(Decimal(old["hash_sum"]) + Decimal(d["hash_sum"])),
        }
    path = os.path.join(out_dir, "_shards.json")
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return path
