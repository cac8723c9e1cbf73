"""Frequent co-occurrence pair mining (market-basket analysis) with
apriori pruning.

The reference has no association mining (SURVEY.md §2.6); this is the
beyond-reference "what co-occurs" primitive -- items bought together,
tags co-assigned, tokens co-mentioned -- built on the apriori bound
(Agrawal & Srikant, VLDB 1994): a pair can never be more frequent than
its rarer item, so items below min_count are pruned BEFORE the pair
expansion. That single filter is the 100 TB lever: in a heavy-tailed
catalog it removes most distinct items, and the quadratic per-basket
self-join only ever runs over frequent items.

Plan shape: distinct (basket, item) -> item-count hash agg -> frequent
filter -> per-basket self-join (an equi-join on the basket key, never a
cartesian) -> pair-count hash agg. The one skew hazard is a mega-basket
(a basket with b frequent items emits b*(b-1)/2 pairs);
``max_basket_items`` caps it by DROPPING larger baskets -- an explicit
completeness-trading knob (capped output is a subset), default None
(exact). AQE's skew-join split handles moderate hot baskets without it.

Lift uses basket probabilities over ALL baskets in the input (including
baskets holding only infrequent items): lift = P(a,b) / (P(a) * P(b)) =
pair_count * n_baskets / (count_a * count_b). The basket total is a
one-row broadcast crossJoin, the established scalar pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    stable_round,
)


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket_items: int | None = None,
    digits: int = 4,
    with_lift: bool = True,
) -> DataFrame:
    """All unordered item pairs co-occurring in >= min_count baskets, as
    (item_a, item_b, pair_count, count_a, count_b, lift) with
    item_a < item_b. Presence counts: duplicate (basket, item) rows
    collapse first, NULL baskets/items drop. Exact unless
    ``max_basket_items`` is set (see module docstring).
    ``with_lift=False`` drops the lift column AND the one-row
    basket-count scalar broadcast that computes it -- consumers that
    only need counts (cooccurrence_similarity) get a plan with no
    BNLJ at all."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if max_basket_items is not None and max_basket_items < 2:
        raise ValueError("max_basket_items must be >= 2 (or None for exact)")
    bi = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .filter(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )
    item_counts = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    fb = bi.join(
        item_counts.filter(F.col("_c") >= min_count).select("_i"), "_i"
    )
    if max_basket_items is not None:
        small = (
            fb.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_basket_items)
            .select("_b")
        )
        fb = fb.join(small, "_b")
    a = fb.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = fb.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    with_counts = (
        pairs.join(
            item_counts.select(
                F.col("_i").alias("item_a"), F.col("_c").alias("count_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("_i").alias("item_b"), F.col("_c").alias("count_b")
            ),
            "item_b",
        )
    )
    if not with_lift:
        return with_counts.select(
            "item_a", "item_b", "pair_count", "count_a", "count_b"
        )
    n_baskets = bi.agg(
        F.count_distinct("_b").cast("double").alias("_n")
    )
    return (
        with_counts
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            stable_round(
                F.col("pair_count")
                * F.col("_n")
                / (F.col("count_a") * F.col("count_b")),
                digits,
            ).alias("lift"),
        )
    )


def cooccurrence_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    top_k: int | None = None,
    max_basket_items: int | None = None,
    digits: int = 4,
) -> DataFrame:
    """Item-item cosine similarity on binary basket vectors:
    sim(i, j) = co(i, j) / sqrt(n_i * n_j) -- the classic item-based
    collaborative-filtering precompute (Sarwar et al. 2001), built
    directly on frequent_pairs' apriori-pruned co-occurrence join so
    hot items never explode the pair space. Output is SYMMETRIC
    ((i, j) and (j, i) both emitted) so a per-item top-k is one
    row_number window; ``top_k`` keeps the k strongest neighbors per
    item (score desc, neighbor asc -- deterministic), which is the
    artifact a recommender serves from."""
    from pyspark.sql import Window

    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        stable_round,
    )

    pairs = frequent_pairs(
        df,
        basket_col,
        item_col,
        min_count=min_count,
        max_basket_items=max_basket_items,
        digits=digits,
        with_lift=False,  # cosine needs counts only; no scalar BNLJ
    )
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "pair_count",
        F.col("count_a").alias("n_item"),
        F.col("count_b").alias("n_neighbor"),
    ).union(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "pair_count",
            F.col("count_b").alias("n_item"),
            F.col("count_a").alias("n_neighbor"),
        )
    )
    scored = sym.withColumn(
        "cosine",
        stable_round(
            F.col("pair_count")
            / F.sqrt(
                F.col("n_item").cast("double") * F.col("n_neighbor")
            ),
            digits,
        ),
    )
    if top_k is None:
        return scored
    if top_k < 1:
        raise ValueError("top_k must be >= 1 (or None for all pairs)")
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
