"""Top-level dump orchestration — the ``paradump`` entry semantics
(src/paradump/paradump.go:3477-3877) as one function call.

Mode map (ref ``-dumpmode``, :3493): ``sql`` → K1 insert files, ``csv`` →
K2 native CSV, ``csv_exact`` → K2 with the reference's exact cell rules,
``parquet`` → lake-native, ``nul`` → K4 noop (benchmark mode).

Scheduling: largest table first (O4, :1414) so the long pole starts
immediately; Spark pipelines the rest.  Exclusion filters are the P5
substring semantics.  Each table write is a distributed ``df.write`` —
the browser/reader/generator/writer goroutine pipeline collapses into
one Spark job per table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from paradump_spark.catalog import ParquetCatalog, _path_size
from paradump_spark.sinks.files import (
    write_csv,
    write_noop,
    write_parquet,
    write_sql_inserts,
)

DUMP_MODES = ("sql", "csv", "csv_exact", "parquet", "nul")


@dataclass
class DumpResult:
    table: str
    mode: str
    path: str | None
    rows: int | None = None


@dataclass
class DumpOptions:
    mode: str = "sql"
    insertsize: int = 500  # ref -insertsize default (:3490)
    dialect: str = "mysql"
    compression: str | None = None
    excludes: list[str] = field(default_factory=list)
    count_rows: bool = False  # extra pass per table when True


def dump_tables(
    catalog: ParquetCatalog,
    out_dir: str,
    tables: list[str] | None = None,
    options: DumpOptions | None = None,
) -> list[DumpResult]:
    """Dump every (non-excluded) table of ``catalog`` to ``out_dir``.

    Returns one DumpResult per table in scheduling order (largest first).
    """
    options = options or DumpOptions()
    if options.mode not in DUMP_MODES:
        raise ValueError(
            f"unknown dump mode {options.mode!r}; expected one of {DUMP_MODES}"
        )
    names = tables or catalog.list_tables(options.excludes or None)
    if tables and options.excludes:
        names = [n for n in names if not any(x in n for x in options.excludes)]
    # O4: largest first (_path_size walks directory-backed tables too)
    names = sorted(names, key=lambda n: _path_size(catalog.path(n)), reverse=True)
    results: list[DumpResult] = []
    for name in names:
        df = catalog.load(name)
        meta = catalog.meta(name)
        path: str | None = os.path.join(out_dir, name)
        if options.mode == "sql":
            write_sql_inserts(
                df,
                name,
                path,
                meta=meta,
                dialect=options.dialect,
                insertsize=options.insertsize,
                compression=options.compression,
            )
        elif options.mode == "csv":
            write_csv(df, path, meta=meta, compression=options.compression)
        elif options.mode == "csv_exact":
            write_csv(
                df, path, meta=meta, exact=True, compression=options.compression
            )
        elif options.mode == "parquet":
            write_parquet(df, path)
        elif options.mode == "nul":
            write_noop(df)
            path = None
        rows = df.count() if options.count_rows else None
        results.append(DumpResult(name, options.mode, path, rows))
    return results
