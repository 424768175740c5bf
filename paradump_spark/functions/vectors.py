"""Embedding math over ``array<float>`` columns — JVM-side expressions.

``F.zip_with`` + ``F.aggregate`` compile to codegen'd loops over the array —
no Python, no UDF, no shuffle.  All arithmetic is promoted to DOUBLE first so
results are reproducible across engines (the DuckDB oracle uses DOUBLE[] list
math); both engines fold left-to-right, so sums agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (promoted to double)."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(
            to_double_array(a), F.lit(0.0), lambda acc, v: acc + v * v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def sign_sketch(a: Column, planes: int = 16) -> Column:
    """Random-hyperplane (SimHash-for-vectors) sketch: ``planes`` sign bits.

    Plane p's component for dimension i is a deterministic pseudo-random
    ±1 derived from md5(p|i) — reproducible anywhere, no stored model.
    Bit p of the result = 1 iff Σ_i sign(p,i)·a[i] > 0.  Cosine-similar
    vectors agree on most bits, so equal prefixes/buckets give LSH
    candidates (used by the scalable near-dup path).
    """
    av = to_double_array(a)

    def signed(p: int):
        prefix = f"{p}|"
        # one pseudo-random bit per (plane, dim)
        return lambda x, i: F.when(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(prefix), i.cast("string"))), 1, 1),
                16,
                10,
            ).cast("int") % 2
            == 0,
            x,
        ).otherwise(-x)

    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(av, F.sequence(F.lit(0), F.size(av) - 1), signed(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
