"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k of a (small, broadcast) query set
  against the full corpus -- the correctness baseline. Work = |Q| x |C|,
  distributed over corpus partitions; ranking is a window top-k per
  query, so nothing ever collects to the driver.
- lsh_topk: random-hyperplane LSH variant -- the 100 TB path. Corpus is
  bucketed by sign-bit signature; each query probes only its own bucket
  (plus optional multi-probe neighbors), turning the cross product into
  a bucket equi-join.

Hyperplanes are generated deterministically from a seed (model
parameter, not data), so results are reproducible.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions import vectors
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import stable_round


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, join against every
    corpus row, rank per query. Ranking key is (rounded sim DESC,
    neighbor id ASC) so ties are deterministic across engines.

    Returns (query_id, neighbor_id, rank, sim). Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vectors.as_double(vec_col).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vectors.as_double(vec_col).alias("_cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(
                vectors.cosine(F.col("_qv"), F.col("_cv")), 4
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-normal hyperplanes (seeded Gaussian)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature (BIGINT bucket id) of a vector against the
    hyperplane set: bit p = (vec . plane_p) >= 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        coeffs = F.array(*[F.lit(x) for x in plane])
        d = vectors.dot(vec, coeffs)
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def _bucket_array(vec: Column, tables: list[list[list[float]]]) -> Column:
    """array<struct<table:int, bucket:bigint>> -- one LSH bucket per table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).cast("int").alias("table"),
                signature_expr(vec, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH:
    ``n_tables`` independent hash tables of ``n_planes`` sign bits each;
    a pair is a candidate if ANY table buckets them together
    (P(candidate) = 1-(1-(1-theta/pi)^p)^L -- multi-table is what makes
    moderate-cosine neighbors reachable). Candidates are deduped before
    scoring, then window-ranked like the exact path.

    The scale path for corpora where |Q| x |C| is infeasible: the bucket
    equi-join shuffles (table, bucket, id) keys instead of replicating
    the corpus per query.
    """
    tables = [
        hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vectors.as_double(vec_col).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vectors.as_double(vec_col).alias("_cv"),
    )
    qb = q.select(
        "query_id", "_qv", F.explode(_bucket_array(F.col("_qv"), tables)).alias("b")
    ).select("query_id", "_qv", "b.table", "b.bucket")
    cb = c.select(
        "neighbor_id",
        "_cv",
        F.explode(_bucket_array(F.col("_cv"), tables)).alias("b"),
    ).select("neighbor_id", "_cv", "b.table", "b.bucket")
    scored = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            stable_round(
                vectors.cosine(F.col("_qv"), F.col("_cv")), 4
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
        )
    )
