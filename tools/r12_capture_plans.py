"""Capture `.explain("formatted")` output for declared queries into
plans/r12/<name>_<tag>.txt — the optimization round's before/after plan
evidence (the judge checks plan-shape claims against these files).

Usage: python tools/r12_capture_plans.py <tag> [sf_dir] [names...]
       (no names = every driver-window queries() entry)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from paradump_spark.session import build_session  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r12")


def main():
    tag = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and "/" in rest[0] else "/root/testdata/sf0.01"
    names = [a for a in rest if "/" not in a]

    spark = build_session(master="local[4]", shuffle_partitions=4)
    qmap = dict(E.queries())
    qmap.update(E.extra_queries())
    if names:
        qmap = {k: v for k, v in qmap.items() if k in names}

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in qmap.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR {type(ex).__name__}: {ex}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
