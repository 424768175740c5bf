"""Chunk planning — the Spark replacement of the reference's chunk browser
(S3, src/paradump/paradump.go:1624-1776) and composite-key range predicate
generator (P3, :1539-1594; P4 equality :1597-1621).

The reference walks the PK sequentially with ``ORDER BY pk LIMIT chunksize``
probes — O(table/chunksize) round-trips on ONE connection, the scalability
ceiling of the whole design.  Here split points come from ONE pass:

* numeric single-column PK      -> min/max + arithmetic strides, or
  ``approxQuantile`` for skewed keys;
* composite / string PK         -> ``approxQuantile`` on each struct-ranked
  sample, implemented as an aggregate over ``F.struct(*pk)`` percentiles.

Each chunk is a half-open interval ``[lo, hi)`` in PK-lexicographic order —
exactly the reference's contract (lower inclusive, upper exclusive,
src/paradump/paradump.go:1539-1594) — rendered either as

* a Spark ``Column`` (``F.struct(*pk) >= lo AND < hi`` — struct comparison
  is lexicographic in Spark SQL), for lake-file reads; or
* ANSI SQL text (the reference's expanded OR-of-ANDs form), for the JDBC
  ``predicates=[...]`` array where each element becomes one partition.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Chunk:
    """Half-open PK interval [begin, end); None bound = unbounded.

    Mirrors ref tablechunk (src/paradump/paradump.go:1493-1500); the
    parasync variant's leading/trailing unbounded chunks
    (src/parasync/parasync.go:1938-1949) are the None-bound cases.
    """

    chunk_id: int
    begin: tuple | None
    end: tuple | None

    @property
    def begin_equal_end(self) -> bool:
        return self.begin is not None and self.begin == self.end


def _lit(v: Any) -> str:
    """Render one bound value as SQL text (dump predicates carry literals,
    not placeholders, since Spark JDBC predicates are plain strings)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def composite_range_sql(
    pk: Sequence[str],
    lower: Sequence[Any] | None,
    upper: Sequence[Any] | None,
    quote: str = "",
) -> str:
    """Lexicographic tuple-range WHERE text, lower-inclusive / upper-exclusive.

    Reproduces the reference's expansion (src/paradump/paradump.go:1539-1594):
    for bound (b1,b2,b3) the lower predicate is
    ``(k1 > b1) OR (k1 = b1 AND k2 > b2) OR (k1 = b1 AND k2 = b2 AND k3 >= b3)``
    and the upper predicate is the same shape with strict ``<`` on the last
    column.  ANSI row-value syntax ``(k1,k2) >= (b1,b2)`` would be shorter but
    MySQL's optimizer historically mis-ranges it, and Spark JDBC predicates
    must be portable text — so we emit the expanded form, like the reference.
    """

    def one_side(bound: Sequence[Any], last_op: str, strict_op: str) -> str:
        terms = []
        for i in range(len(bound)):
            eqs = [f"{quote}{pk[j]}{quote} = {_lit(bound[j])}" for j in range(i)]
            op = last_op if i == len(bound) - 1 else strict_op
            eqs.append(f"{quote}{pk[i]}{quote} {op} {_lit(bound[i])}")
            terms.append("(" + " AND ".join(eqs) + ")")
        return "(" + " OR ".join(terms) + ")"

    parts = []
    if lower is not None:
        parts.append(one_side(list(lower), ">=", ">"))
    if upper is not None:
        parts.append(one_side(list(upper), "<", "<"))
    return " AND ".join(parts) if parts else "1 = 1"


def equality_sql(pk: Sequence[str], values: Sequence[Any], quote: str = "") -> str:
    """P4: ``(k1 = v1) AND (k2 = v2)`` for begin==end chunks
    (src/paradump/paradump.go:1597-1621)."""
    return " AND ".join(
        f"({quote}{k}{quote} = {_lit(v)})" for k, v in zip(pk, values)
    )


def range_filter(
    pk: Sequence[str], lower: Sequence[Any] | None, upper: Sequence[Any] | None
) -> Column:
    """The same half-open interval as a Spark Column predicate.

    ``F.struct(*pk)`` comparison is lexicographic in Spark SQL, so the whole
    70-line Go expansion collapses to two struct comparisons.
    """
    key = F.struct(*[F.col(c) for c in pk])
    conds = []
    if lower is not None:
        conds.append(key >= F.struct(*[F.lit(v) for v in lower]))
    if upper is not None:
        conds.append(key < F.struct(*[F.lit(v) for v in upper]))
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def plan_chunks(
    df: DataFrame,
    pk: Sequence[str],
    num_chunks: int,
    relative_error: float = 0.001,
) -> list[Chunk]:
    """Compute ``num_chunks`` half-open PK intervals in ONE distributed pass.

    Replaces the reference's sequential LIMIT-walk browser (S3).  Split
    points are percentiles of the PK; for a composite key we take
    percentiles of the leading column and refine with the full tuple at the
    observed boundary rows.  ``approx_percentile`` is a partial-aggregable
    sketch, so this is a single shuffle-free-ish aggregation scan that works
    identically on 6k rows or 100 TB.

    First/last chunks are unbounded (begin=None / end=None) so the union of
    all chunk predicates covers the table even for keys that arrive after
    planning — same contract as parasync's leading/trailing chunks
    (src/parasync/parasync.go:1938-1949).
    """
    if num_chunks <= 1:
        return [Chunk(0, None, None)]

    probs = [i / num_chunks for i in range(1, num_chunks)]
    if len(pk) == 1:
        qs = df.stat.approxQuantile(pk[0], probs, relative_error)
        bounds = [(q,) for q in qs]
    else:
        # Percentile the leading key column, then fetch one real full-tuple
        # row at each boundary so composite ties split deterministically.
        lead = pk[0]
        qs = df.stat.approxQuantile(lead, probs, relative_error)
        rows = (
            df.select(*pk)
            .where(F.col(lead).isin([q for q in qs]))
            .groupBy(lead)
            .agg(*[F.min(c).alias(c) for c in pk[1:]])
            .collect()
        )
        by_lead = {r[lead]: tuple(r[c] for c in pk) for r in rows}
        bounds = [by_lead.get(q, (q,) + (None,) * (len(pk) - 1)) for q in qs]

    # Dedup equal adjacent bounds (heavy-hitter keys collapse chunks).
    uniq: list[tuple] = []
    for b in bounds:
        if not uniq or b != uniq[-1]:
            uniq.append(b)

    chunks: list[Chunk] = []
    prev: tuple | None = None
    for i, b in enumerate(uniq):
        chunks.append(Chunk(i, prev, b))
        prev = b
    chunks.append(Chunk(len(uniq), prev, None))
    return chunks


def chunk_predicates_sql(
    chunks: Sequence[Chunk], pk: Sequence[str], quote: str = ""
) -> list[str]:
    """Render chunks as the JDBC ``predicates=[...]`` array: each string
    becomes exactly one Spark partition reading exactly one PK slice —
    this *is* the reference's chunk reader (S4), executed by executors."""
    out = []
    for c in chunks:
        if c.begin_equal_end:
            out.append(equality_sql(pk, c.begin, quote))
        else:
            out.append(composite_range_sql(pk, c.begin, c.end, quote))
    return out
