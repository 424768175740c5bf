#!/usr/bin/env python
"""Synthesize a larger-SF copy of the driver testdata for local scaling
runs (VERDICT r05 directive 3: the sf1 ledger).

The driver's generator is not shipped, so this reproduces the OBSERVED
sf0.1 schemas (exact arrow physical types, including the int32 columns
and timestamp[us]) and distribution shapes (status/priority uniformity,
1..7 lines per order, 31-word document vocabulary with ~54 words/doc,
unit-norm 64-d label-clustered embeddings, exact-dup documents).  It is
NOT byte-compatible with driver data — it exists only so per-query
wall-clock can be compared across scales on like-shaped input.

Usage: python tools/gen_sf.py <out_dir> [scale]   # scale=10 → "sf1"
Writes one parquet per table; row counts = sf0.1 counts × scale.
Deterministic (numpy PCG64 seed 42).  Do NOT write under /root/testdata.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
FLAGS = ["A", "N", "R"]
LINESTATUS = ["O", "F"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
P_TYPES = ["ECONOMY", "PROMO", "LARGE", "STANDARD", "MEDIUM", "SMALL"]
P_ADJ = ["large", "hot", "blue", "small", "red", "green", "dark", "light"]
P_NOUN = ["ring", "bolt", "washer", "gear", "cog", "pin", "plate", "rod"]
LANGS = (["en"] * 4) + ["es", "zh", "fr", "de"]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

US = 1_000_000


def _ts(rng, n, start: str, end: str) -> np.ndarray:
    a = np.datetime64(start, "us").astype("int64")
    b = np.datetime64(end, "us").astype("int64")
    return rng.integers(a, b, n)


def _write(out_dir: str, name: str, cols: dict, schema: pa.Schema) -> None:
    t = pa.table({k: pa.array(v, type=schema.field(k).type) for k, v in cols.items()},
                 schema=schema)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {t.num_rows} rows")


def generate(out_dir: str, scale: float = 10.0, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    s = lambda base: int(base * scale)  # noqa: E731 — counts vs sf0.1

    _write(out_dir, "region",
           {"r_regionkey": np.arange(5),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
           pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    _write(out_dir, "nation",
           {"n_nationkey": np.arange(25),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": np.arange(25) % 5},
           pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                      ("n_regionkey", pa.int32())]))

    n_cust = s(15000)
    _write(out_dir, "customer",
           {"c_custkey": np.arange(n_cust),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust),
            "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
            "c_mktsegment": rng.choice(SEGMENTS, n_cust)},
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]))

    n_supp = s(1000)
    _write(out_dir, "supplier",
           {"s_suppkey": np.arange(n_supp),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp),
            "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)},
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    n_part = s(20000)
    _write(out_dir, "part",
           {"p_partkey": np.arange(n_part),
            "p_name": [f"{a} {b}" for a, b in zip(rng.choice(P_ADJ, n_part),
                                                  rng.choice(P_NOUN, n_part))],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
            "p_type": rng.choice(P_TYPES, n_part),
            "p_size": rng.integers(1, 51, n_part),
            "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2)},
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    n_ord = s(150000)
    ord_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ])
    _write(out_dir, "orders",
           {"o_orderkey": np.arange(n_ord),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": rng.choice(STATUSES, n_ord),
            "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
            "o_orderdate": _ts(rng, n_ord, "1995-01-01", "2001-08-01"),
            "o_orderpriority": rng.choice(PRIORITIES, n_ord)}, ord_schema)

    # lineitem: 1..7 lines per order, ~4 avg → ≈ 4×n_ord rows (sf0.1 has
    # exactly 4× — match the expectation, not the exact count)
    per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord), per)
    lnum = np.concatenate([np.arange(1, c + 1) for c in per]).astype("int32")
    n_li = len(lkey)
    _write(out_dir, "lineitem",
           {"l_orderkey": lkey,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": lnum,
            "l_quantity": np.round(rng.uniform(1, 50, n_li), 0),
            "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
            "l_discount": np.round(rng.uniform(0.0, 0.10, n_li), 2),
            "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
            "l_returnflag": rng.choice(FLAGS, n_li),
            "l_linestatus": rng.choice(LINESTATUS, n_li),
            "l_shipdate": _ts(rng, n_li, "1995-01-02", "2001-11-04")},
           pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()),
                      ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()),
                      ("l_linestatus", pa.string()),
                      ("l_shipdate", pa.timestamp("us"))]))

    n_ev = s(100000)
    n_users = s(1500)
    ts = np.sort(_ts(rng, n_ev, "2024-01-01", "2024-01-31"))
    _write(out_dir, "events",
           {"event_id": np.arange(n_ev),
            "ts": ts,
            "user_id": rng.integers(0, n_users, n_ev),
            "event_type": rng.choice(EVENT_TYPES, n_ev),
            "value": np.round(np.abs(rng.normal(50, 40, n_ev)), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]},
           pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()), ("event_type", pa.string()),
                      ("value", pa.float64()), ("props", pa.string())]))

    n_doc = s(5000)
    lens = rng.integers(8, 101, n_doc)
    texts = [" ".join(rng.choice(VOCAB, ln)) for ln in lens]
    # exact + near duplicates at sf0.1's observed rate (~0.2% exact) plus
    # a near-dup band so the dedup family has real work at every scale
    for i in rng.choice(n_doc, max(2, n_doc // 600), replace=False):
        texts[(i + 17) % n_doc] = texts[i]
    for i in rng.choice(n_doc, max(2, n_doc // 300), replace=False):
        texts[(i + 31) % n_doc] = texts[i] + " value"
    _write(out_dir, "documents",
           {"doc_id": np.arange(n_doc),
            "text": texts,
            "lang": rng.choice(LANGS, n_doc),
            "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype="int64")},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))

    n_vec = s(2000)
    labels = rng.integers(0, 10, n_vec)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings",
           {"vec_id": np.arange(n_vec),
            "embedding": [v.astype("float32") for v in vecs],
            "label": labels},
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]))


def generate_embeddings(out_dir: str, scale: float = 250.0, seed: int = 42) -> None:
    """Embeddings table only, at scales where generating the full star
    schema would be wasted work (VERDICT r08 directive 5: a 500k-vector
    point — scale 250 — for the kNN-join / kNN-graph scaling ledger).
    Same distribution as :func:`generate`'s embeddings block (10
    unit-norm label clusters, sigma 0.35) on an independent RNG stream,
    written in chunks so peak memory stays bounded."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_vec = int(2000 * scale)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    path = os.path.join(out_dir, "embeddings.parquet")
    with pq.ParquetWriter(path, schema) as w:
        for lo in range(0, n_vec, 100_000):
            hi = min(lo + 100_000, n_vec)
            labels = rng.integers(0, 10, hi - lo)
            vecs = centers[labels] + rng.normal(0, 0.35, (hi - lo, 64))
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            w.write_table(pa.table(
                {"vec_id": np.arange(lo, hi),
                 "embedding": pa.array(
                     list(vecs.astype("float32")), pa.list_(pa.float32())
                 ),
                 "label": pa.array(labels, pa.int32())},
                schema=schema))
    print(f"embeddings: {n_vec} rows -> {path}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    emb_only = "--emb-only" in argv
    argv = [a for a in argv if a != "--emb-only"]
    out = argv[0] if len(argv) > 0 else "/root/repo/scratch/sf1"
    scale = float(argv[1]) if len(argv) > 1 else (250.0 if emb_only else 10.0)
    assert not os.path.realpath(out).startswith("/root/testdata")
    if emb_only:
        generate_embeddings(out, scale)
    else:
        generate(out, scale)
