"""Frequent co-occurrence pairs: hand-math pins, exact DuckDB parity on
customer baskets, the mega-basket knob's subset property, and the
scale-plan lint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    sql_round,
)
from bigdata_storage_and_proccess_job_data_spark.operators import baskets
from tests.parity import compare, duckdb_connect


def test_frequent_pairs_hand_math(spark):
    """4 baskets: (x,y) co-occurs 3x, (x,z) 1x (below min_count 2),
    duplicate (basket,item) rows collapse, NULLs drop. n=4 baskets,
    count_x=4, count_y=3 -> lift(x,y) = 3*4/(4*3) = 1.0."""
    rows = [
        (1, "x"), (1, "y"), (1, "y"),  # dup collapses
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "x"), (4, "z"),
        (None, "x"), (5, None),  # dropped; basket 5 has nothing left
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {
        (r.item_a, r.item_b): (r.pair_count, r.count_a, r.count_b, r.lift)
        for r in baskets.frequent_pairs(df, "b", "i", min_count=2).collect()
    }
    assert out == {("x", "y"): (3, 4, 3, pytest.approx(1.0, abs=1e-3))}
    with pytest.raises(ValueError, match="min_count"):
        baskets.frequent_pairs(df, "b", "i", min_count=0)
    with pytest.raises(ValueError, match="max_basket_items"):
        baskets.frequent_pairs(df, "b", "i", max_basket_items=1)


def _customer_baskets(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("o_custkey", "l_partkey")


def test_frequent_pairs_duckdb_parity(spark, oracle_sf_dir):
    """Exact cross-engine parity: parts co-purchased by the same
    customer, min_count 5 -- every pair, count, and lift."""
    out = baskets.frequent_pairs(
        _customer_baskets(spark, oracle_sf_dir),
        "o_custkey",
        "l_partkey",
        min_count=5,
    )
    sql = f"""
    WITH bi AS (
      SELECT DISTINCT o_custkey AS b, l_partkey AS i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), ic AS (
      SELECT i, count(*) AS c FROM bi GROUP BY i
    ), fb AS (
      SELECT b, bi.i FROM bi JOIN ic USING (i) WHERE c >= 5
    ), p AS (
      SELECT a.i AS item_a, b.i AS item_b, count(*) AS pair_count
      FROM fb a JOIN fb b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= 5
    ), n AS (SELECT count(DISTINCT b)::DOUBLE AS nb FROM bi)
    SELECT item_a, item_b, pair_count, ca.c AS count_a, cb.c AS count_b,
      {sql_round('pair_count * nb / (ca.c * cb.c)', 4)} AS lift
    FROM p JOIN ic ca ON item_a = ca.i JOIN ic cb ON item_b = cb.i, n
    """
    assert compare(out, duckdb_connect(oracle_sf_dir), sql) == []


def test_frequent_pairs_basket_cap_is_subset(spark, sf_dir):
    """max_basket_items trades completeness, never correctness: the
    capped output's pairs are a subset with counts <= the exact run's."""
    cb = _customer_baskets(spark, sf_dir)
    exact = {
        (r.item_a, r.item_b): r.pair_count
        for r in baskets.frequent_pairs(
            cb, "o_custkey", "l_partkey", min_count=5
        ).collect()
    }
    capped = {
        (r.item_a, r.item_b): r.pair_count
        for r in baskets.frequent_pairs(
            cb, "o_custkey", "l_partkey", min_count=5, max_basket_items=30
        ).collect()
    }
    assert set(capped) <= set(exact)
    assert all(capped[k] <= exact[k] for k in capped)


def test_frequent_pairs_plan_scalable(spark, sf_dir):
    """The pair expansion is an equi-join on the basket key: the ONLY
    nested-loop in the plan is the one-row broadcast crossJoin that
    attaches the lift scalar (the established exempt pattern, O(n x 1));
    no CartesianProduct, no Python row path anywhere."""
    from bigdata_storage_and_proccess_job_data_spark.plans.lint import (
        lint_plan,
        plan_string,
    )

    df = baskets.frequent_pairs(
        _customer_baskets(spark, sf_dir), "o_custkey", "l_partkey", 5
    )
    assert lint_plan(df, allow_bnlj=True) == []
    assert plan_string(df).count("BroadcastNestedLoopJoin") == 1


def test_cooccurrence_similarity_hand_math_and_topk(spark):
    """cosine = co / sqrt(n_i * n_j) on binary baskets; symmetric
    emission; deterministic per-item top-k."""
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "x"), (4, "z"),
        (5, "y"), (5, "z"),
        (6, "z"),
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {
        (r.item, r.neighbor): r.cosine
        for r in baskets.cooccurrence_similarity(
            df, "b", "i", min_count=1
        ).collect()
    }
    # n_x=4, n_y=4, n_z=3; co(x,y)=3, co(x,z)=1, co(y,z)=1
    assert out[("x", "y")] == pytest.approx(3 / 4, abs=2e-4)
    assert out[("y", "x")] == out[("x", "y")]
    assert out[("x", "z")] == pytest.approx(1 / (12 ** 0.5), abs=2e-4)

    top1 = {
        r.item: r.neighbor
        for r in baskets.cooccurrence_similarity(
            df, "b", "i", min_count=1, top_k=1
        ).collect()
    }
    assert top1 == {"x": "y", "y": "x", "z": "x"}
    # z's ties (x and y both 1/sqrt(12)) break toward the smaller name

    with pytest.raises(ValueError, match="top_k"):
        baskets.cooccurrence_similarity(df, "b", "i", top_k=0)


def test_cooccurrence_similarity_duckdb_parity(spark, oracle_sf_dir):
    """Symmetric item-item cosine over customer x part baskets matches
    DuckDB exactly (stable-rounded scores)."""
    out = baskets.cooccurrence_similarity(
        _customer_baskets(spark, oracle_sf_dir),
        "o_custkey",
        "l_partkey",
        min_count=5,
    ).select("item", "neighbor", "pair_count", "cosine")
    sql = f"""
    WITH bi AS (
      SELECT DISTINCT o_custkey AS b, l_partkey AS i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    ic AS (SELECT i, COUNT(*) AS c FROM bi GROUP BY i),
    fb AS (SELECT bi.b, bi.i FROM bi JOIN ic USING (i) WHERE ic.c >= 5),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_count
      FROM fb a JOIN fb b ON a.b = b.b AND a.i < b.i
      GROUP BY a.i, b.i HAVING COUNT(*) >= 5
    ),
    sym AS (
      SELECT item_a AS item, item_b AS neighbor, pair_count,
             ca.c AS n_item, cb.c AS n_neighbor
      FROM pairs JOIN ic ca ON ca.i = item_a JOIN ic cb ON cb.i = item_b
      UNION ALL
      SELECT item_b, item_a, pair_count, cb.c, ca.c
      FROM pairs JOIN ic ca ON ca.i = item_a JOIN ic cb ON cb.i = item_b
    )
    SELECT item, neighbor, pair_count,
           {sql_round('pair_count / sqrt(n_item::DOUBLE * n_neighbor)', 4)}
             AS cosine
    FROM sym
    """
    con = duckdb_connect(oracle_sf_dir)
    problems = compare(out, con, sql)
    assert problems == [], problems
