"""Chunk planning — the Spark replacement of the reference's chunk browser
(S3, src/paradump/paradump.go:1624-1776) and composite-key range predicate
generator (P3, :1539-1594; P4 equality :1597-1621).

The reference walks the PK sequentially with ``ORDER BY pk LIMIT chunksize``
probes — O(table/chunksize) round-trips on ONE connection, the scalability
ceiling of the whole design.  Here split points come from one bounded,
distributed sample pass:

* ``df.select(pk).sample(frac)`` (column-pruned: only PK columns are read)
  collects ≤ ``sample_rows`` keys to the driver, sorts them
  PK-lexicographically, and picks evenly spaced boundary tuples.  This is
  type-agnostic — numeric, string, date, and composite PKs all work — and
  the driver-side memory is bounded by ``sample_rows`` regardless of table
  size, so the plan step costs the same at 6k rows or 100 TB.

Rows with NULL in any PK column are excluded from planning: like the
reference, chunked scanning requires a NOT NULL key (fake-PK promotion only
considers all-NOT-NULL indexes, src/paradump/paradump.go:1200-1228).

Each chunk is a half-open interval ``[lo, hi)`` in PK-lexicographic order —
exactly the reference's contract (lower inclusive, upper exclusive,
src/paradump/paradump.go:1539-1594) — rendered either as

* a Spark ``Column`` (``F.struct(*pk) >= lo AND < hi`` — struct comparison
  is lexicographic in Spark SQL), with every bound literal cast to the
  matching column's DataType so BIGINT keys never compare against INT or
  DOUBLE literals; or
* ANSI SQL text (the reference's expanded OR-of-ANDs form), for the JDBC
  ``predicates=[...]`` array where each element becomes one partition.
  Integer bounds render as integers (no ``380.0`` float leakage that would
  defeat the source DB's PK index).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from dataclasses import dataclass
from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    not placeholders, since Spark JDBC predicates are plain strings).

    Typed rendering matters at scale: an integer bound rendered as
    ``380.0`` forces an implicit cast on the source DB and defeats the PK
    index — the exact scale-killer the predicate layer exists to avoid.
    """
    if v is None:
        raise ValueError(
            "NULL inside a chunk bound — PK columns must be NOT NULL for "
            "chunked scans (reference requires the same, paradump.go:1200-1228)"
        )
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return f"'{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"'{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    # Escape backslashes as well as quotes: both MySQL (default sql_mode)
    # and Spark SQL treat backslash as an escape inside string literals,
    # so a literal backslash in a string PK bound must render doubled or
    # the evaluated boundary differs from the planned one (silent row
    # loss/duplication across chunks).
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"'{s}'"


def composite_range_sql(
    pk: Sequence[str],
    lower: Sequence[Any] | None,
    upper: Sequence[Any] | None,
    quote: str = "",
    col_sql: dict[str, str] | None = None,
) -> str:
    """Lexicographic tuple-range WHERE text, lower-inclusive / upper-exclusive.

    Reproduces the reference's expansion (src/paradump/paradump.go:1539-1594):
    for bound (b1,b2,b3) the lower predicate is
    ``(k1 > b1) OR (k1 = b1 AND k2 > b2) OR (k1 = b1 AND k2 = b2 AND k3 >= b3)``
    and the upper predicate is the same shape with strict ``<`` on the last
    column.  ANSI row-value syntax ``(k1,k2) >= (b1,b2)`` would be shorter but
    MySQL's optimizer historically mis-ranges it, and Spark JDBC predicates
    must be portable text — so we emit the expanded form, like the reference.

    ``col_sql`` overrides a column's SQL identifier with an expression —
    the enum-in-PK case renders ``cast(`c` as unsigned integer)`` so the
    source DB compares enum *indexes*, not labels (ref :1560, :1998-2002).
    """
    col_sql = col_sql or {}

    def ident(i: int) -> str:
        return col_sql.get(pk[i], f"{quote}{pk[i]}{quote}")

    def one_side(bound: Sequence[Any], last_op: str, strict_op: str) -> str:
        terms = []
        for i in range(len(bound)):
            eqs = [f"{ident(j)} = {_lit(bound[j])}" for j in range(i)]
            op = last_op if i == len(bound) - 1 else strict_op
            eqs.append(f"{ident(i)} {op} {_lit(bound[i])}")
            terms.append("(" + " AND ".join(eqs) + ")")
        return "(" + " OR ".join(terms) + ")"

    parts = []
    if lower is not None:
        parts.append(one_side(list(lower), ">=", ">"))
    if upper is not None:
        parts.append(one_side(list(upper), "<", "<"))
    return " AND ".join(parts) if parts else "1 = 1"


def equality_sql(
    pk: Sequence[str],
    values: Sequence[Any],
    quote: str = "",
    col_sql: dict[str, str] | None = None,
) -> str:
    """P4: ``(k1 = v1) AND (k2 = v2)`` for begin==end chunks
    (src/paradump/paradump.go:1597-1621)."""
    col_sql = col_sql or {}
    return " AND ".join(
        f"({col_sql.get(k, f'{quote}{k}{quote}')} = {_lit(v)})"
        for k, v in zip(pk, values)
    )


def _bound_struct(
    pk: Sequence[str], bound: Sequence[Any], schema: T.StructType | None
) -> Column:
    """A struct literal whose fields are cast to the PK columns' types so
    struct comparison never hits DATATYPE_MISMATCH (BIGINT col vs INT lit)."""
    fields = []
    for c, v in zip(pk, bound):
        lit = F.lit(v)
        if schema is not None:
            lit = lit.cast(schema[c].dataType)
        fields.append(lit.alias(c))
    return F.struct(*fields)


def range_filter(
    pk: Sequence[str],
    lower: Sequence[Any] | None,
    upper: Sequence[Any] | None,
    schema: T.StructType | None = None,
) -> Column:
    """The same half-open interval as a Spark Column predicate.

    ``F.struct(*pk)`` comparison is lexicographic in Spark SQL, so the whole
    70-line Go expansion collapses to two struct comparisons.  Pass the
    DataFrame's ``schema`` so bound literals are cast to the column types.
    """
    key = F.struct(*[F.col(c).alias(c) for c in pk])
    conds = []
    if lower is not None:
        conds.append(key >= _bound_struct(pk, lower, schema))
    if upper is not None:
        conds.append(key < _bound_struct(pk, upper, schema))
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def chunk_filter(chunk: Chunk, pk: Sequence[str], schema: T.StructType | None = None) -> Column:
    """One chunk as a Spark Column predicate (equality or range)."""
    if chunk.begin_equal_end:
        key = F.struct(*[F.col(c).alias(c) for c in pk])
        return key == _bound_struct(pk, chunk.begin, schema)
    return range_filter(pk, chunk.begin, chunk.end, schema)


def plan_chunks(
    df: DataFrame,
    pk: Sequence[str],
    num_chunks: int,
    sample_rows: int | None = None,
    seed: int = 42,
) -> list[Chunk]:
    """Compute ≤ ``num_chunks`` half-open PK intervals from one sample pass.

    Replaces the reference's sequential LIMIT-walk browser (S3) with a
    distributed, column-pruned sample: ≤ ``sample_rows`` PK tuples reach
    the driver (bounded memory at any table size), are sorted
    lexicographically, and evenly spaced tuples become the boundaries.

    First/last chunks are unbounded (begin=None / end=None) so the union of
    all chunk predicates covers the table even for keys that arrive after
    planning — same contract as parasync's leading/trailing chunks
    (src/parasync/parasync.go:1938-1949).  Heavy-hitter keys collapse
    adjacent equal boundaries, so fewer than ``num_chunks`` chunks can come
    back — never more.
    """
    pk = list(pk)
    if num_chunks <= 1:
        return [Chunk(0, None, None)]
    if sample_rows is None:
        sample_rows = max(200 * num_chunks, 10_000)

    keys = df.select(*pk)
    for c in pk:
        keys = keys.where(F.col(c).isNotNull())
    total = keys.count()
    if total == 0:
        return [Chunk(0, None, None)]
    # Oversample slightly; sample() is Bernoulli so the realized count varies.
    frac = min(1.0, (sample_rows * 1.2) / total)
    sampled = keys.sample(withReplacement=False, fraction=frac, seed=seed).collect()
    if not sampled:
        sampled = keys.limit(sample_rows).collect()
    tuples = sorted(tuple(r[c] for c in pk) for r in sampled)

    n = len(tuples)
    bounds: list[tuple] = []
    for i in range(1, num_chunks):
        idx = (i * n) // num_chunks
        if idx <= 0 or idx >= n:
            continue
        b = tuples[idx]
        if not bounds or b != bounds[-1]:
            bounds.append(b)

    chunks: list[Chunk] = []
    prev: tuple | None = None
    for i, b in enumerate(bounds):
        chunks.append(Chunk(i, prev, b))
        prev = b
    chunks.append(Chunk(len(bounds), prev, None))
    return chunks


def chunk_predicates_sql(
    chunks: Sequence[Chunk],
    pk: Sequence[str],
    quote: str = "",
    col_sql: dict[str, str] | None = None,
) -> list[str]:
    """Render chunks as the JDBC ``predicates=[...]`` array: each string
    becomes exactly one Spark partition reading exactly one PK slice —
    this *is* the reference's chunk reader (S4), executed by executors."""
    out = []
    for c in chunks:
        if c.begin_equal_end:
            out.append(equality_sql(pk, c.begin, quote, col_sql))
        else:
            out.append(composite_range_sql(pk, c.begin, c.end, quote, col_sql))
    return out


def enum_index(col: Column | str, enum_values: Sequence[str]) -> Column:
    """P2: a MySQL-enum column as its 1-based index (0 = not-a-member,
    matching MySQL's invalid-enum sentinel).  Chunk planning over an enum
    PK must order by index, not label (ref :1560) — project this, plan on
    the projection, and pass ``col_sql={'c': \"cast(`c` as unsigned
    integer)\"}`` to the SQL renderers so the source DB compares the same
    ordering."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.array_position(F.array(*[F.lit(v) for v in enum_values]), c),
        F.lit(0),
    ).cast("int")


def enum_pk_col_sql(
    pk: Sequence[str], enum_cols: Sequence[str], quote: str = "`"
) -> dict[str, str]:
    """The ``col_sql`` map for enum PK members (ref cast :1998-2002)."""
    enum_set = set(enum_cols)
    return {
        c: f"cast({quote}{c}{quote} as unsigned integer)"
        for c in pk
        if c in enum_set
    }
