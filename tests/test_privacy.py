"""Privacy release operators: DP noisy counts (determinism, accuracy
scaling in epsilon, exact DuckDB replay through the md5_hash60 bridge)
and the k-anonymity audit (hand pins + DuckDB parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    sql_round,
    stable_round,
)
from bigdata_storage_and_proccess_job_data_spark.operators import privacy
from bigdata_storage_and_proccess_job_data_spark.plans.scale_queries import (
    _md5_hash60_sql,
)
from tests.parity import compare, duckdb_connect


def test_dp_noisy_counts_determinism_and_scaling(spark, oracle_sf_dir):
    orders = load_table(spark, oracle_sf_dir, "orders")
    a = privacy.dp_noisy_counts(
        orders, ["o_orderpriority"], epsilon=1.0, salt="s1"
    ).collect()
    b = privacy.dp_noisy_counts(
        orders.repartition(13), ["o_orderpriority"], epsilon=1.0, salt="s1"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # keyed PRF
    c = privacy.dp_noisy_counts(
        orders, ["o_orderpriority"], epsilon=1.0, salt="s2"
    ).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # salt matters

    true = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # big epsilon -> noise << 1; tiny epsilon -> visible noise
    tight = privacy.dp_noisy_counts(
        orders, ["o_orderpriority"], epsilon=1000.0, salt="s1"
    ).collect()
    for r in tight:
        assert abs(r.noisy_count - true[r.o_orderpriority]) < 0.05
    loose = privacy.dp_noisy_counts(
        orders, ["o_orderpriority"], epsilon=0.01, salt="s1",
        clamp_negative=False,
    ).collect()
    assert any(
        abs(r.noisy_count - true[r.o_orderpriority]) > 1 for r in loose
    )
    with pytest.raises(ValueError, match="epsilon"):
        privacy.dp_noisy_counts(orders, ["o_orderpriority"], 0.0, "s")


def test_dp_noisy_counts_duckdb_parity(spark, oracle_sf_dir):
    """The release replays bit-for-bit in DuckDB: same keyed uniform
    (md5_hash60 bridge), same inverse-CDF Laplace, same clamp."""
    orders = load_table(spark, oracle_sf_dir, "orders")
    got = privacy.dp_noisy_counts(
        orders, ["o_orderpriority"], epsilon=0.5, salt="audit"
    ).select(
        "o_orderpriority",
        stable_round(F.col("noisy_count"), 6).alias("noisy_count"),
    )
    h = _md5_hash60_sql("o_orderpriority::VARCHAR || ':audit'")
    sql = f"""
        WITH g AS (
          SELECT o_orderpriority, COUNT(*) AS n
          FROM orders GROUP BY 1
        ),
        u AS (
          SELECT o_orderpriority, n,
                 ({h})::DOUBLE / 1152921504606846976.0 - 0.5 AS c
          FROM g
        )
        SELECT o_orderpriority,
          {sql_round(
            "GREATEST(n::DOUBLE + (-2.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 0.0)",
            6)} AS noisy_count
        FROM u
    """
    assert compare(got, duckdb_connect(oracle_sf_dir), sql) == []


def test_k_anonymity_report_pins_and_parity(spark, oracle_sf_dir):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 2), ("c", None)],
        "q1 string, q2 int",
    )
    r = privacy.k_anonymity_report(df, ["q1", "q2"], k=3).first()
    assert r.n_groups == 3 and r.n_rows == 6
    assert r.n_violating_groups == 2  # (b,2)x2 and (c,NULL)x1
    assert r.n_rows_at_risk == 3
    assert r.anonymity_k == 1  # the NULL singleton
    with pytest.raises(ValueError, match="k must"):
        privacy.k_anonymity_report(df, ["q1"], k=1)

    customer = load_table(spark, oracle_sf_dir, "customer")
    got = privacy.k_anonymity_report(
        customer, ["c_nationkey", "c_mktsegment"], k=10
    )
    sql = """
        WITH g AS (
          SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
          FROM customer GROUP BY 1, 2
        )
        SELECT 10 AS k, COUNT(*) AS n_groups,
               COUNT(*) FILTER (n < 10) AS n_violating_groups,
               SUM(n) AS n_rows,
               COALESCE(SUM(n) FILTER (n < 10), 0) AS n_rows_at_risk,
               MIN(n) AS min_group_size, MIN(n) AS anonymity_k
        FROM g
    """
    assert compare(got, duckdb_connect(oracle_sf_dir), sql) == []


def test_pseudonymize_referential_integrity_and_parity(spark, oracle_sf_dir):
    """Tokenization: (1) deterministic and referentially intact -- the
    same customer key tokenizes identically in two frames, so their
    join survives pseudonymization with matching cardinality; (2) a
    rotated salt unlinks releases; (3) NULLs stay NULL, per-column
    domain separation (same value in different columns gets different
    tokens); (4) bit-exact DuckDB replay of the released frame."""
    from pyspark.sql import functions as F

    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.operators import privacy
    from tests.parity import compare, duckdb_connect

    cust = load_table(spark, oracle_sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    orders = load_table(spark, oracle_sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    pc = privacy.pseudonymize(
        cust, ["c_custkey", "c_name"], salt="rel1",
        prefix_map={"c_custkey": "usr_"},
    )
    # DIFFERENTLY-NAMED FK/PK sides (the review-found case): tokens
    # must still line up, so the released join keeps full cardinality
    po = privacy.pseudonymize(orders, ["o_custkey"], salt="rel1",
                              prefix_map={"o_custkey": "usr_"})
    joined = po.join(pc, po.o_custkey == pc.c_custkey)
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert joined.count() == plain.count()  # referential integrity
    # token never equals the raw value; rotation unlinks
    p2 = privacy.pseudonymize(cust, ["c_custkey"], salt="rel2")
    a = {r.c_custkey for r in pc.select("c_custkey").collect()}
    b = {r.c_custkey for r in p2.select("c_custkey").collect()}
    assert a.isdisjoint(b)

    tiny = spark.createDataFrame(
        [("x", "x"), (None, "y")], "u string, v string"
    )
    t = privacy.pseudonymize(tiny, ["u", "v"], salt="s").collect()
    assert t[1].u is None and t[1].v is not None
    assert t[0].u == t[0].v  # same value, same salt => same token
    td = privacy.pseudonymize(
        tiny, ["u", "v"], salt="s", domain_map={"u": "usr", "v": "dev"}
    ).collect()
    assert td[0].u != td[0].v  # explicit domains unlink on request

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        privacy.pseudonymize(tiny, [], "s")
    with _pytest.raises(ValueError, match="not in frame"):
        privacy.pseudonymize(tiny, ["zz"], "s")
    with _pytest.raises(ValueError, match="prefix"):
        privacy.pseudonymize(tiny, ["u"], "s", prefix_map={"u": "a;b"})
    with _pytest.raises(ValueError, match="domain"):
        privacy.pseudonymize(tiny, ["u"], "s", domain_map={"u": "a;b"})

    out = pc.select("c_custkey", "c_name", "c_mktsegment")
    sql = """
        SELECT 'usr_' || md5(c_custkey::VARCHAR || ':rel1') AS c_custkey,
               md5(c_name || ':rel1') AS c_name,
               c_mktsegment
        FROM customer
    """
    assert compare(out, duckdb_connect(oracle_sf_dir), sql) == []
