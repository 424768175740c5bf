"""MSSQL renderer golden vectors from the reference's OWN fixtures.

No live SQL Server exists here, so correctness is proven the way the
reference's run_test.sh does after a copy — via the fixture tables'
self-describing oracle columns — plus a faithful T-SQL literal
evaluator:

* ticket_tag.label_hex_u16le is the byte sequence SQL Server must hold
  for each label (`run_test.sh:468-472` checks
  ``convert(varchar(max), CAST(label AS varbinary(256)), 2) =
  label_hex_u16le``).  We verify label.encode('utf-16-le') matches it,
  then render every label through OUR MSSQL escaper
  (`functions.render.string_literal`, ref paradump.go:2332-2445) and
  evaluate the literal with a T-SQL expression simulator — the result
  must round-trip to the original label, hence to the fixture's
  expected stored bytes.
* account_metadatas.metasha256 = sha256(metavalue)
  (`run_test.sh:474-478`); the varbinary render must decode back to
  bytes with that digest.

The torture rows cover ``'``-doubling, control-char CHAR splices, every
cp1252 problem codepoint, and non-BMP emoji (surrogate pairs in the
u16le oracle) — authored by the reference, not by us.
"""

import hashlib
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paradump_spark.functions.render import string_literal
from tests.test_golden_dumps import _parse_tuple, _read_dump, _split_tuples

_SEG = re.compile(
    r"N?'((?:[^']|'')*)'"   # quoted segment (w/ '' doubling)
    r"|N?CHAR\((\d+)\)"     # CHAR(n)/NCHAR(n) splice
)


def eval_tsql_literal(lit: str) -> str:
    """Evaluate an ``N'..' + CHAR(n) + N'..'`` concatenation the way SQL
    Server would (nvarchar semantics — no codepage loss)."""
    out, pos = [], 0
    for part in lit.split("+"):
        part = part.strip()
        m = _SEG.fullmatch(part)
        assert m, f"unparseable segment {part!r} in {lit!r}"
        if m.group(2) is not None:
            out.append(chr(int(m.group(2))))
        else:
            out.append(m.group(1).replace("''", "'"))
        pos += 1
    return "".join(out)


def _labels():
    rows = [_parse_tuple(t) for t in _split_tuples(_read_dump("ticket_tag"))]
    return [(r[2], r[6]) for r in rows if r[2] is not None]


def test_fixture_u16le_oracle_holds():
    """The fixture's own contract: stored nvarchar bytes (UTF-16LE) hex
    to label_hex_u16le — including surrogate pairs for non-BMP."""
    labels = _labels()
    assert len(labels) >= 50
    for label, hex_u16 in labels:
        assert label.encode("utf-16-le").hex().upper() == hex_u16.upper(), (
            label,
            hex_u16,
        )


def test_rendered_mssql_literals_round_trip(spark):
    """Our JVM-side MSSQL escaper over every reference-authored label:
    simulate SQL Server's evaluation of the literal; the stored value
    must equal the original label (hence the fixture's u16le bytes)."""
    labels = _labels()
    df = spark.createDataFrame([(l,) for l, _ in labels], "label string")
    rendered = df.select(
        string_literal(F.col("label"), "mssql").alias("lit")
    ).collect()
    for (label, _), r in zip(labels, rendered):
        assert eval_tsql_literal(r["lit"]) == label, (label, r["lit"])


def test_control_char_splice_keeps_nvarchar_segments(spark):
    """Segments resumed after a CHAR splice must carry the N prefix —
    a bare varchar continuation would push non-ASCII text through the
    server codepage."""
    df = spark.createDataFrame([("a\né\x01…",)], "s string")
    lit = df.select(string_literal(F.col("s"), "mssql").alias("l")).collect()[0]["l"]
    assert eval_tsql_literal(lit) == "a\né\x01…"
    for part in lit.split("+"):
        part = part.strip()
        if part.endswith("'") and not part.startswith("N'"):
            pytest.fail(f"non-nvarchar segment {part!r} in {lit!r}")


def test_account_metadatas_sha_and_varbinary_render(spark):
    """metasha256 = sha256(metavalue) on the parsed fixture, and our
    MSSQL varbinary render decodes back to the same bytes."""
    rows = [
        _parse_tuple(t)
        for t in _split_tuples(_read_dump("account_metadatas"))
    ]
    payloads = [(r[2], r[3]) for r in rows if r[2] is not None]
    assert payloads
    for blob, sha in payloads:
        assert hashlib.sha256(blob).hexdigest() == sha.lower()
    df = spark.createDataFrame(
        [(b,) for b, _ in payloads], T.StructType([T.StructField("b", T.BinaryType())])
    )
    from paradump_spark.functions.render import binary_literal

    rendered = df.select(binary_literal(F.col("b"), "mssql").alias("lit")).collect()
    pat = re.compile(r"convert\(varbinary\(max\),'([0-9a-f]*)',2\)")
    for (blob, _), r in zip(payloads, rendered):
        m = pat.fullmatch(r["lit"])
        assert m, r["lit"]
        assert bytes.fromhex(m.group(1)) == bytes(blob)
