"""Golden byte-diff against the reference tree's COMMITTED mysqldump
fixtures (`/root/reference/test/init_*.sql.zst`, loaded by
`test/run_db_4_test.sh:347-390`).

The reference proves its SQL renderer with `test/run_test.sh:267-313`:
paradump's insertsize-1 INSERT lines, sorted, must byte-diff clean
against `mysqldump --skip-extended-insert --compact`.  No live MySQL
exists in this sandbox, but the committed init dumps ARE
mysqldump-rendered bytes — so the same contract holds offline:

1. parse each dump's extended-INSERT tuples into typed rows (a small
   MySQL-literal reader: backslash escapes, NULL, ints, timestamps);
2. re-render through our K1 pipeline (`functions.render.values_tuple`
   via `sinks.files.rendered_tuples`, dialect="mysql");
3. sort both tuple sets and require BYTE equality.

This closes the loop on F1 (string escaper: the ticket_tag fixture
carries ``\\'``/``\\"``/``\\\\``, non-BMP emoji, and every troublesome
cp1252 codepoint), F8/F9 (no floats/fractions here, but integer and
timestamp text), and the tuple framing — on reference-AUTHORED data,
not data we generated ourselves.

`init_account_metadatas.sql.zst` renders varbinary as ``0x…`` literals
(mysqldump ``--hex-blob``); round 6 added ``binary_style="hex"`` to the
renderer so that fixture byte-diffs too — it is the ENUM-in-PK table
(FIXTURES.md: `metatype enum(...) PK(2)`), so its string rendering also
exercises P2's enum-as-string path on reference-authored data, and its
`metasha256 = sha256(metavalue)` oracle column self-validates the
parser's 0x decode.  The four `.MISSING_LARGE_BLOBS` tables have no
committed dumps at all.
"""

import datetime
import decimal
import glob
import os
import subprocess

import pytest
from pyspark.sql import types as T

from paradump_spark.sinks.files import rendered_tuples

REF_TEST_DIR = "/root/reference/test"

#: column type letters: u=unsigned bigint (decimal(20,0) — ids exceed
#: int64, FIXTURES.md), i=int64, n=int32, s=string, t=timestamp (naive)
GOLDEN_TABLES = {
    "client_info": "usntt",
    "text_notifications": "uttsss",
    "sensor_tag": "usss",
    "client_activity": "uuntns",
    "ticket_tag": "susssss",
}

_UNESCAPE = {
    "0": "\x00", "'": "'", '"': '"', "b": "\b", "n": "\n",
    "r": "\r", "t": "\t", "Z": "\x1a", "\\": "\\", "%": "\\%", "_": "\\_",
}


def _read_dump(table: str) -> str:
    path = os.path.join(REF_TEST_DIR, f"init_{table}.sql.zst")
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {path} not present")
    # prefer the independent zstd CLI decoder when present; this round's
    # container dropped it, and pyarrow's zstd codec reads the same
    # standard frames
    import shutil

    zbin = shutil.which("zstd") or shutil.which("zstdcat")
    if zbin:
        out = subprocess.run(
            [zbin, "-dc", path], capture_output=True, check=True
        )
        return out.stdout.decode("utf-8")
    import pyarrow as pa

    with pa.input_stream(path, compression="zstd") as fh:
        return fh.read().decode("utf-8")


def _split_tuples(sql_text: str) -> list[str]:
    """Every top-level ``(...)`` tuple from every INSERT line, verbatim."""
    tuples = []
    for line in sql_text.splitlines():
        if not line.startswith("INSERT"):
            continue
        i = line.index("VALUES") + len("VALUES")
        depth, start, in_str, esc = 0, -1, False, False
        for j in range(i, len(line)):
            ch = line[j]
            if esc:
                esc = False
                continue
            if in_str:
                if ch == "\\":
                    esc = True
                elif ch == "'":
                    in_str = False
                continue
            if ch == "'":
                in_str = True
            elif ch == "(":
                if depth == 0:
                    start = j
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    tuples.append(line[start : j + 1])
    return tuples


def _parse_tuple(t: str) -> list:
    """One ``( ... )`` tuple into Python values (str / int / float /
    None), using mysqldump's backslash-escape table."""
    vals, i, n = [], 1, len(t) - 1  # skip outer parens
    while i < n:
        if t[i] == ",":
            i += 1
            continue
        if t[i] == "'":
            buf, i = [], i + 1
            while t[i] != "'":
                if t[i] == "\\":
                    buf.append(_UNESCAPE[t[i + 1]])
                    i += 2
                else:
                    buf.append(t[i])
                    i += 1
            vals.append("".join(buf))
            i += 1
        else:
            j = i
            while j < n and t[j] != ",":
                j += 1
            tok = t[i:j]
            if tok == "NULL":
                vals.append(None)
            elif tok.startswith("0x"):
                vals.append(bytes.fromhex(tok[2:]))
            elif "." in tok or "e" in tok or "E" in tok:
                vals.append(float(tok))
            else:
                vals.append(int(tok))
            i = j
    return vals


_SPARK_TYPES = {
    "u": T.DecimalType(20, 0),
    "i": T.LongType(),
    "n": T.IntegerType(),
    "s": T.StringType(),
    "t": T.TimestampNTZType(),
    "b": T.BinaryType(),
}


def _typed_rows(tuples: list[str], sig: str) -> tuple[list, T.StructType]:
    schema = T.StructType(
        [T.StructField(f"c{k}", _SPARK_TYPES[c]) for k, c in enumerate(sig)]
    )
    rows = []
    for t in tuples:
        vals = _parse_tuple(t)
        assert len(vals) == len(sig), (len(vals), sig, t[:120])
        conv = []
        for v, c in zip(vals, sig):
            if v is None:
                conv.append(None)
            elif c == "t":
                conv.append(
                    datetime.datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
                )
            elif c == "u":
                conv.append(decimal.Decimal(v))
            elif c in ("i", "n"):
                conv.append(int(v))
            else:
                conv.append(v)
        rows.append(tuple(conv))
    return rows, schema


@pytest.mark.parametrize("table", sorted(GOLDEN_TABLES))
def test_rendered_tuples_match_reference_bytes(spark, table):
    """decode(reference dump) → our renderer → identical bytes."""
    golden = _split_tuples(_read_dump(table))
    assert golden, table
    rows, schema = _typed_rows(golden, GOLDEN_TABLES[table])
    df = spark.createDataFrame(rows, schema)
    ours = [r["v"] for r in rendered_tuples(df, dialect="mysql").collect()]
    assert sorted(ours) == sorted(golden)


def test_account_metadatas_hex_blob_golden(spark):
    """Round 6: the 6th fixture — ENUM-in-PK + varbinary payload rendered
    as mysqldump ``--hex-blob`` ``0x…`` literals (binary_style="hex")
    must byte-diff clean against the committed dump."""
    golden = _split_tuples(_read_dump("account_metadatas"))
    assert golden
    rows, schema = _typed_rows(golden, "usbs")
    df = spark.createDataFrame(rows, schema)
    ours = [
        r["v"]
        for r in rendered_tuples(df, dialect="mysql", binary_style="hex").collect()
    ]
    assert sorted(ours) == sorted(golden)


def test_account_metadatas_parser_self_check_sha256(spark):
    """The fixture's own oracle column (FIXTURES.md: metasha256 =
    sha256(metavalue)) proves the 0x parse decoded the exact bytes."""
    import hashlib

    golden = _split_tuples(_read_dump("account_metadatas"))
    checked = 0
    for t in golden:
        vals = _parse_tuple(t)
        blob, sha = vals[2], vals[3]
        if blob is None or sha is None:
            continue
        assert hashlib.sha256(blob).hexdigest() == sha.lower(), t[:80]
        checked += 1
    assert checked > 100


def test_parser_self_check_hex_column(spark):
    """Independent proof the parser decoded ticket_tag faithfully: the
    fixture's own oracle column label_hex_u8 = hex(label as utf8mb4)
    (FIXTURES.md; ref test/run_test.sh:785-794) must hold on the parsed
    values."""
    golden = _split_tuples(_read_dump("ticket_tag"))
    for t in golden:
        vals = _parse_tuple(t)
        label, hex_u8 = vals[2], vals[3]
        if label is None:
            continue
        assert label.encode("utf-8").hex().upper() == hex_u8.upper(), t[:120]


def test_insertsize_one_statement_lines(spark, tmp_path):
    """The reference's test-100 framing: insertsize=1 produces exactly
    one INSERT line per source row, each embedding the golden tuple."""
    from paradump_spark.sinks.files import write_sql_inserts

    golden = _split_tuples(_read_dump("client_info"))
    rows, schema = _typed_rows(golden, GOLDEN_TABLES["client_info"])
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "dump_client_info")
    write_sql_inserts(
        df, "client_info", out, dialect="mysql", insertsize=1, header=False
    )
    text = []
    for f in glob.glob(os.path.join(out, "part-*")):
        with open(f, encoding="utf-8") as fh:
            text.append(fh.read())
    body = "".join(text)
    stmts = [s for s in body.split(";\n") if s.strip()]
    assert len([s for s in body.splitlines() if s.startswith("INSERT")]) == len(
        golden
    )
    got_tuples = sorted(
        s.split("VALUES\n", 1)[1].rstrip(";\n") for s in stmts
    )
    assert got_tuples == sorted(golden)
