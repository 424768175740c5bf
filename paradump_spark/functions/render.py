"""Per-dialect value rendering — the Spark restatement of the reference's
escaper/renderer family (F1–F10):

* MySQL string escaper      — src/paradump/paradump.go:2062-2122
* MySQL binary literal      — :2124-2215, emitted as ``_binary X'..'`` (:3016-3019)
* PostgreSQL string escaper — :2262-2328 (E'...' strings, NUL dropped)
* PostgreSQL binary literal — :2874-2880 (``decode('…','hex')``)
* MSSQL string escaper      — :2332-2445 (N'...' literals, CHAR(n) splices)
* MSSQL binary literal      — :2891-2897 (``convert(varbinary(max),'…',2)``)
* CSV quoting               — :2217-2258, :3131-3146 (quote only when needed,
                              ``"``→``""``, NULL→``\\N`` for quoted kinds / empty else)
* float canonicalizer       — :2963-2983
* fractional-second trimmer — :3111-3130 (strip trailing zeros, keep ≥2 digits)
* NUL stripper for PG       — :2656-2657

The reference escapes cell-by-cell in Go; here each escaper is a chain of
literal ``replace`` expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path.  A pandas-UDF fallback exists only for the exact
Go float formatting (shortest positional decimal), which no built-in
reproduces outside the 1e-3..1e7 range.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paradump_spark.meta import ColumnMeta

# ---------------------------------------------------------------------------
# string escapers


def _chain_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    out = col
    for search, repl in pairs:
        out = F.replace(out, F.lit(search), F.lit(repl))
    return out


# ref table src/paradump/paradump.go:2062-2122 — backslash FIRST.
_MYSQL_PAIRS = [
    ("\\", "\\\\"),
    ("\x00", "\\0"),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\x1a", "\\Z"),
    ("'", "\\'"),
    ('"', '\\"'),
]


def mysql_escape(col: Column) -> Column:
    return _chain_replace(col, _MYSQL_PAIRS)


def pg_escape(col: Column) -> Column:
    """PostgreSQL E'...' body: NUL dropped entirely (ref kind 'Z', :2264),
    backslash and quote escaped, control chars as ``\\xNN`` (:2262-2328)."""
    out = F.replace(col, F.lit("\x00"), F.lit(""))  # F10, :2656-2657
    out = _chain_replace(out, [("\\", "\\\\"), ("'", "\\'")])
    ctrl = [(chr(i), f"\\x{i:02x}") for i in range(1, 32)
            if chr(i) not in ("\\", "'")]
    return _chain_replace(out, ctrl)


def mssql_escape(col: Column) -> Column:
    """MSSQL N'...' body: ``'`` doubled; control chars spliced out of the
    literal as ``'+CHAR(n)+N'`` (ref :2332-2445 CHAR-splices and switches
    to N'' segments for non-ASCII).  Every resumed segment keeps the N
    prefix — a bare ``'…'`` continuation would be a varchar literal and
    non-ASCII text after a control char would round-trip through the
    server codepage instead of staying nvarchar."""
    out = F.replace(col, F.lit("'"), F.lit("''"))
    ctrl = [(chr(i), f"'+CHAR({i})+N'") for i in range(1, 32)]
    return _chain_replace(out, ctrl)


_ESCAPERS = {"mysql": mysql_escape, "postgres": pg_escape, "mssql": mssql_escape}

_STRING_TEMPLATES = {"mysql": ("'", "'"), "postgres": ("E'", "'"), "mssql": ("N'", "'")}


def string_literal(col: Column, dialect: str = "mysql") -> Column:
    pre, post = _STRING_TEMPLATES[dialect]
    return F.concat(F.lit(pre), _ESCAPERS[dialect](col), F.lit(post))


def binary_literal(
    col: Column, dialect: str = "mysql", style: str | None = None
) -> Column:
    """Hex renderings: mysql ``_binary X'..'`` (:3016-3019), postgres
    ``decode('..','hex')`` (:3024-3027), mssql ``convert(varbinary(max),..)``
    (:3020-3023).

    ``style="hex"`` renders the bare MySQL ``0xAB12…`` literal instead —
    the form mysqldump emits with ``--hex-blob`` and the one the
    reference's committed ``init_account_metadatas`` fixture carries.
    A zero-length blob becomes ``''`` (bare ``0x`` is a syntax error)."""
    if style == "hex":
        return F.when(F.length(col) == 0, F.lit("''")).otherwise(
            F.concat(F.lit("0x"), F.upper(F.hex(col)))
        )
    h = F.lower(F.hex(col))
    if dialect == "mysql":
        return F.concat(F.lit("_binary X'"), h, F.lit("'"))
    if dialect == "postgres":
        return F.concat(F.lit("decode('"), h, F.lit("','hex')"))
    if dialect == "mssql":
        return F.concat(F.lit("convert(varbinary(max),'"), h, F.lit("',2)"))
    raise ValueError(dialect)


# ---------------------------------------------------------------------------
# F2 — MySQL raw-byte escaper with UTF-8 repair (mysqldump byte parity)

#: byte -> escape sequence, ref table src/paradump/paradump.go:2124-2141
_MYSQL_BYTE_ESCAPES = {
    0x00: b"\\0", 0x0A: b"\\n", 0x0D: b"\\r", 0x1A: b"\\Z",
    0x22: b'\\"', 0x27: b"\\'", 0x5C: b"\\\\",
}


def _utf8_seq_len(data: bytes, i: int) -> int:
    """Length of a VALID UTF-8 sequence starting at ``i``, else 0.

    Mirrors Go ``utf8.DecodeRuneInString`` validity (rejects overlongs,
    surrogates, > U+10FFFF, truncation) — Python's strict UTF-8 decoder
    enforces the same rules, so validity is delegated to it."""
    b = data[i]
    if 0xC2 <= b <= 0xDF:
        k = 2
    elif 0xE0 <= b <= 0xEF:
        k = 3
    elif 0xF0 <= b <= 0xF4:
        k = 4
    else:  # 0xC0/0xC1 and 0xF5-0xF7 are never valid leads
        return 0
    if i + k > len(data):
        return 0
    try:
        data[i:i + k].decode("utf-8")
        return k
    except UnicodeDecodeError:
        return 0


def mysql_escape_bytes(data: bytes | None) -> bytes | None:
    """The reference's binary/corrupt-text escaper (F2), byte-for-byte:
    mysqldump-parity literal body for arbitrary bytes (ref ``quoteBinary``,
    src/paradump/paradump.go:2148-2215).

    Behavior (spec lifted from the reference, not its code):

    * ``\\0 \\n \\r \\Z \\" \\' \\\\`` escapes for their seven bytes;
    * all other non-lead bytes (ASCII, stray continuations ``0x80-0xBF``,
      ``0xF8-0xFF``) pass through verbatim;
    * UTF-8 lead bytes ``0xC0-0xF7``: a valid sequence passes through
      whole; a CESU-8 surrogate triple (``0xED 0xA0-0xBF 0x80-0xBF``,
      MySQL's utf8mb3 surrogate smuggling) passes through unrepaired;
      any other invalid lead is repaired as ``\\`` + the raw byte and
      scanning resumes at the next byte.

    This is the byte-identical-to-mysqldump contract the reference's
    corrupt-latin1/blob fixtures (test ``sensor_tag``) diff against.
    """
    if data is None:
        return None
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        esc = _MYSQL_BYTE_ESCAPES.get(b)
        if esc is not None:
            out += esc
            i += 1
            continue
        if 0xC0 <= b <= 0xF7:
            k = _utf8_seq_len(data, i)
            if k:
                out += data[i:i + k]
                i += k
                continue
            if (
                b == 0xED
                and i + 2 < n
                and 0xA0 <= data[i + 1] <= 0xBF
                and 0x80 <= data[i + 2] <= 0xBF
            ):
                out += data[i:i + 3]
                i += 3
                continue
            out += b"\\" + bytes([b])
            i += 1
            continue
        out.append(b)
        i += 1
    return bytes(out)


def mysql_dump_literal_udf():
    """``'<escaped bytes>'`` literal for a BINARY column, dump-parity
    style (vs :func:`binary_literal`'s hex style, which loads the same
    DB state but is not byte-identical to mysqldump output).

    Arrow-batched pandas UDF binary→binary: the output may contain
    invalid-UTF-8 bytes by design, so it stays BinaryType end-to-end —
    write it through a bytes-capable sink, never cast to string.
    """
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them, which the pandas_udf signature inferrer rejects
    @pandas_udf(T.BinaryType())
    def _render(s):
        return s.map(
            lambda v: None if v is None
            else b"'" + mysql_escape_bytes(bytes(v)) + b"'"
        )

    return _render


# ---------------------------------------------------------------------------
# scalar canonicalizers


def float_canonical(col: Column) -> Column:
    """F8 within codegen: Spark's double→string is the shortest Java repr,
    which equals Go's ``Text('f',-1)`` for |x| ∈ [1e-3, 1e7); outside that
    range Java uses exponent notation — use :func:`float_canonical_udf`
    when byte parity matters there.  Integral doubles render ``5.0`` (Java)
    vs ``5`` (Go); normalized by stripping a trailing ``.0``."""
    s = col.cast("string")
    return F.when(
        s.endswith(".0"), F.substring(s, 1, F.length(s) - 2)
    ).otherwise(s)


def float_canonical_udf():
    """Exact Go-parity float formatting (shortest positional decimal, no
    exponent) as an Arrow-batched pandas UDF — ref :2963-2983."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _fmt(s):
        import numpy as np
        import pandas as pd

        def one(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            return np.format_float_positional(v, unique=True, trim="-")

        return pd.Series([one(v) for v in s])

    return _fmt


def trim_fractional_seconds(col: Column) -> Column:
    """F9: strip trailing zeros from ``.ffffff`` but keep ≥2 digits
    (ref :3111-3130).  Input: a formatted ``HH:mm:ss.SSSSSS`` string."""
    return F.regexp_replace(col, r"(\.\d{2,}?)0+$", "$1")


def timestamp_text(col: Column, dt_prec: int = 0) -> Column:
    """Temporal cell text: UTC wall-clock, optional trimmed fraction."""
    if dt_prec > 0:
        return trim_fractional_seconds(
            F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        )
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# cell -> SQL literal


def sql_literal(
    col: Column, meta: ColumnMeta | None = None, dialect: str = "mysql",
    spark_type: T.DataType | None = None, binary_style: str | None = None,
) -> Column:
    """One cell as SQL literal text for ``dialect``; NULL → ``NULL``.

    Driven by the column's Spark type (plus ColumnMeta for fractional-
    second precision), mirroring the reference's mustBeQuote/isKindBinary
    flag dispatch (src/paradump/paradump.go:2709-3056)."""
    dt = spark_type or (meta.spark_type if meta else T.StringType())
    if isinstance(dt, T.BinaryType):
        rendered = binary_literal(col, dialect, style=binary_style)
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        prec = meta.dt_prec if meta else 0
        rendered = F.concat(F.lit("'"), timestamp_text(col, prec), F.lit("'"))
    elif isinstance(dt, T.DateType):
        rendered = F.concat(F.lit("'"), F.date_format(col, "yyyy-MM-dd"), F.lit("'"))
    elif isinstance(dt, (T.FloatType, T.DoubleType)):
        rendered = float_canonical(col)
    elif isinstance(dt, T.BooleanType):
        rendered = F.when(col, F.lit("1")).otherwise(F.lit("0"))
    elif isinstance(dt, (T.StringType,)):
        rendered = string_literal(col, dialect)
    else:  # integral / decimal kinds
        rendered = col.cast("string")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(rendered)


def values_tuple(
    cols: list[Column],
    metas: list[ColumnMeta] | None = None,
    dialect: str = "mysql",
    types: list[T.DataType] | None = None,
    binary_style: str | None = None,
) -> Column:
    """``(v1,v2,…)`` — one row's VALUES tuple (ref slot template,
    src/paradump/paradump.go:2709-2725)."""
    metas = metas or [None] * len(cols)
    types = types or [None] * len(cols)
    cells = [
        sql_literal(c, m, dialect, t, binary_style=binary_style)
        for c, m, t in zip(cols, metas, types)
    ]
    return F.concat(F.lit("("), F.concat_ws(",", *cells), F.lit(")"))


# ---------------------------------------------------------------------------
# CSV (F7)


def csv_cell(col: Column, meta: ColumnMeta | None = None,
             spark_type: T.DataType | None = None) -> Column:
    """Exact reference CSV cell: quote only if the cell contains ``"``,
    ``,`` or a newline; ``"``→``""``; NULL → ``\\N`` for quoted kinds and
    empty string otherwise (ref :2217-2258, :3103-3150)."""
    dt = spark_type or (meta.spark_type if meta else T.StringType())
    quoted_kind = isinstance(
        dt, (T.StringType, T.BinaryType, T.DateType, T.TimestampType, T.TimestampNTZType)
    )
    if isinstance(dt, T.BinaryType):
        s = col.cast("string")  # raw bytes as UTF-8 text, like the reference
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        prec = meta.dt_prec if meta else 0
        s = timestamp_text(col, prec)
    elif isinstance(dt, T.DateType):
        s = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dt, (T.FloatType, T.DoubleType)):
        s = float_canonical(col)
    else:
        s = col.cast("string")
    if isinstance(dt, (T.StringType, T.BinaryType)):
        # only free-text kinds can contain the delimiter/quote/newline;
        # rendered numerics and temporals never do — skip the scans.
        needs_quote = (
            s.contains('"') | s.contains(",") | s.contains("\n") | s.contains("\r")
        )
        body = F.when(
            needs_quote,
            F.concat(F.lit('"'), F.replace(s, F.lit('"'), F.lit('""')), F.lit('"')),
        ).otherwise(s)
    else:
        body = s
    null_text = "\\N" if quoted_kind else ""
    return F.when(col.isNull(), F.lit(null_text)).otherwise(body)


def csv_line(cols: list[Column], metas: list[ColumnMeta] | None = None,
             types: list[T.DataType] | None = None) -> Column:
    metas = metas or [None] * len(cols)
    types = types or [None] * len(cols)
    cells = [csv_cell(c, m, t) for c, m, t in zip(cols, metas, types)]
    return F.concat_ws(",", *cells)
