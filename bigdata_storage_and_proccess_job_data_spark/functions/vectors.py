"""Vector expressions over array<float|double> embedding columns.

Native zip_with/aggregate folds (JVM-side, sequential order -- which
makes results bit-reproducible across engines computing the same fold).
For very wide vectors or heavy batch scoring, a Pandas-UDF path would be
the upgrade; at 64-dim the codegen fold wins by avoiding Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def lit_matrix(rows: "list[list[float]]") -> Column:
    """array<array<double>> literal built from ONE SQL string parsed
    JVM-side -- F.lit(nested_list) constructs the literal element by
    element over py4j (~136 ms for a 4x64 matrix, measured), which made
    plan CONSTRUCTION the dominant cost of every literal-parameterized
    vector op (LSH planes, IVF/k-means centroids, PQ codebooks); the
    parsed form is ~25x faster and value-identical (repr() round-trips
    a double exactly and Spark's literal parser is Double.parseDouble,
    both nearest-double). Finite values only."""
    import math

    for row in rows:
        for x in row:
            if not math.isfinite(x):
                raise ValueError("lit_matrix requires finite components")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in row) + ")"
            for row in rows
        )
        + ")"
    )


def lit_cube(tables: "list[list[list[float]]]") -> Column:
    """array<array<array<double>>> literal, parsed JVM-side like
    lit_matrix -- for table-of-planes / codebook parameters."""
    import math

    for rows in tables:
        for row in rows:
            for x in row:
                if not math.isfinite(x):
                    raise ValueError("lit_cube requires finite components")
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in row) + ")"
                for row in rows
            )
            + ")"
            for rows in tables
        )
        + ")"
    )
