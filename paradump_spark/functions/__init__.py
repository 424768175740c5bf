"""Scalar/array function layer.

``render``  — per-dialect SQL/CSV value rendering (reference F1–F10,
              src/paradump/paradump.go:2062-2445, :2963-2983, :3111-3130).
``text``    — tokenization, shingles, MinHash, SimHash, quality metrics,
              language-ID, fingerprints (beyond-reference LLM-pipeline ops).
``vectors`` — embedding math (dot/norm/cosine) over ``array<float>``.

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen — no per-row Python in the hot path.  Hashes are
md5-based so results are engine-portable (the DuckDB oracle reproduces them
bit-for-bit).
"""
