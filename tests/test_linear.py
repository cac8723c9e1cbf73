"""Linear models: exact one-pass ridge (planted-recovery + numpy
normal-equation replica + DuckDB-scored predictions) and logistic GD
(numpy trajectory replica, separable-data accuracy, l2 shrinkage)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
    sql_round,
    stable_round,
)
from bigdata_storage_and_proccess_job_data_spark.operators import linear
from tests.parity import compare, duckdb_connect


def _planted(spark, oracle_sf_dir):
    """Embeddings with a planted noiseless linear label:
    y = 3*v0 - 2*v1 + 0.25*v7 + 0.5."""
    emb = load_table(spark, oracle_sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        v.alias("v"),
        (
            3.0 * v[0] - 2.0 * v[1] + 0.25 * v[7] + 0.5
        ).alias("y"),
    )


def test_ridge_fit_recovers_planted_and_matches_numpy(spark, oracle_sf_dir):
    df = _planted(spark, oracle_sf_dir)
    m = linear.ridge_fit(df, "v", "y")
    w = np.asarray(m["weights"])
    expect = np.zeros(64)
    expect[0], expect[1], expect[7] = 3.0, -2.0, 0.25
    assert np.allclose(w, expect, atol=1e-8)
    assert m["intercept"] == pytest.approx(0.5, abs=1e-8)
    assert m["r2"] == pytest.approx(1.0, abs=1e-10)

    # numpy normal-equation replica with ridge penalty
    rows = df.select("v", "y").collect()
    X = np.array([r.v for r in rows])
    y = np.array([r.y for r in rows])
    X1 = np.hstack([X, np.ones((len(X), 1))])
    for l2 in (0.0, 5.0):
        got = linear.ridge_fit(df, "v", "y", l2=l2)
        reg = np.eye(65) * l2
        reg[-1, -1] = 0.0
        ref = np.linalg.solve(X1.T @ X1 + reg, X1.T @ y)
        assert np.allclose(got["weights"], ref[:-1], rtol=1e-8, atol=1e-10)
        assert got["intercept"] == pytest.approx(ref[-1], abs=1e-8)
    # penalty shrinks the planted weights
    shrunk = linear.ridge_fit(df, "v", "y", l2=50.0)
    assert abs(shrunk["weights"][0]) < 3.0
    assert np.linalg.norm(shrunk["weights"]) < np.linalg.norm(w)


def test_ridge_scores_duckdb_parity(spark, oracle_sf_dir):
    """score_expr rides the fitted model as one literal array; the
    sequential fold is bit-equal to DuckDB list_dot_product, so the
    scored frame value-compares exactly (the pca_apply precedent)."""
    df = _planted(spark, oracle_sf_dir)
    m = linear.ridge_fit(df, "v", "y")
    got = df.select(
        "vec_id",
        stable_round(linear.score_expr(m, "v"), 6).alias("pred"),
    )
    import json

    w_json = json.dumps(m["weights"], separators=(",", ":"))
    sql = f"""
        SELECT vec_id,
          {sql_round(
            "list_dot_product(embedding::DOUBLE[], "
            f"'{w_json}'::JSON::DOUBLE[]) + {m['intercept']!r}", 6)}
            AS pred
        FROM embeddings
    """
    assert compare(got, duckdb_connect(oracle_sf_dir), sql) == []


def test_logreg_separable_accuracy_and_replica(spark, oracle_sf_dir):
    emb = load_table(spark, oracle_sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    df = emb.select(
        v.alias("v"), (v[0] > 0).cast("double").alias("y")
    )
    m = linear.logreg_fit(df, "v", "y", iters=30, lr=2.0)
    losses = m["loss"]
    assert losses[0] == pytest.approx(np.log(2.0), abs=1e-12)
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    acc = df.select(
        F.avg(
            (
                (linear.prob_expr(m, "v") > 0.5).cast("double")
                == F.col("y")
            ).cast("double")
        ).alias("acc")
    ).first()["acc"]
    # v0>0 is linearly separable, but 30 fixed GD steps only get the
    # boundary close -- the pin is "clearly learned", not "converged"
    assert acc > 0.9

    # exact trajectory replica (no halving at this lr: loss strictly
    # drops, so both implementations take identical fixed steps)
    rows = df.collect()
    X = np.array([r.v for r in rows])
    y = np.array([r.y for r in rows])
    n = len(X)

    def gl(w, l2):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.append(X.T @ (p - y), (p - y).sum()) / n
        loss = float((np.logaddexp(0.0, z) - y * z).sum()) / n
        g[:-1] += l2 * w[:-1]
        loss += 0.5 * l2 * float(w[:-1] @ w[:-1])
        return g, loss

    for l2 in (0.0, 0.1):
        got = linear.logreg_fit(df, "v", "y", iters=8, lr=0.5, l2=l2)
        w = np.zeros(65)
        g, loss = gl(w, l2)
        for _ in range(8):
            w = w - 0.5 * g
            g, loss2 = gl(w, l2)
            if abs(loss - loss2) < 1e-8:
                break
            loss = loss2
        assert np.allclose(got["weights"], w[:-1], rtol=1e-6, atol=1e-9)
        assert got["intercept"] == pytest.approx(w[-1], abs=1e-9)
    # heavy l2 shrinks toward the intercept-only model
    heavy = linear.logreg_fit(df, "v", "y", iters=12, lr=0.5, l2=10.0)
    light = linear.logreg_fit(df, "v", "y", iters=12, lr=0.5, l2=0.0)
    assert np.linalg.norm(heavy["weights"]) < np.linalg.norm(
        light["weights"]
    )


def test_linear_guards(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], 1.0)], "v array<double>, y double"
    )
    with pytest.raises(ValueError, match="l2"):
        linear.ridge_fit(df, "v", "y", l2=-1.0)
    with pytest.raises(ValueError, match="lr"):
        linear.logreg_fit(df, "v", "y", lr=0.0)
    empty = df.filter(F.col("y").isNull())
    with pytest.raises(ValueError, match="no rows"):
        linear.ridge_fit(empty, "v", "y")


def test_quantile_fit_recovers_quantiles_and_replica(spark, oracle_sf_dir):
    """Pinball GD: (1) on data whose conditional distribution is a
    known two-point mixture, tau=0.9 pulls the fit toward the upper
    branch and tau=0.1 toward the lower; (2) exact numpy trajectory
    replica (same harness contract as logreg)."""
    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # y = 2*v0 + eps where eps is +1 (30%) / -1 (70%) by md5 coin:
    # the conditional 0.9-quantile is 2*v0 + 1, the 0.1-quantile 2*v0 - 1
    coin = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(10),
    )
    df = emb.select(
        v.alias("v"),
        (2.0 * v[0] + F.when(coin < 3, 1.0).otherwise(-1.0)).alias("y"),
    )
    hi = linear.quantile_fit(df, "v", "y", tau=0.9, iters=60, lr=2.0)
    lo = linear.quantile_fit(df, "v", "y", tau=0.1, iters=60, lr=2.0)
    # 60 subgradient passes pin the BAND, not the last decimal of the
    # slope: both fits see the positive v0 slope, the intercepts
    # bracket the +-1 mixture branches with clear separation
    assert hi["weights"][0] > 0.5 and lo["weights"][0] > 0.5
    assert hi["intercept"] > 0.4 and lo["intercept"] < -0.4
    assert hi["intercept"] - lo["intercept"] > 1.0
    # both losses decreased from the w=0 start
    assert hi["loss"][-1] < hi["loss"][0]
    assert lo["loss"][-1] < lo["loss"][0]

    rows = df.collect()
    X = np.array([r.v for r in rows])
    y = np.array([r.y for r in rows])
    n = len(X)
    tau, l2 = 0.65, 0.05

    def gl(w):
        r = y - (X @ w[:-1] + w[-1])
        s = tau - (r < 0).astype(float)
        g = np.append(X.T @ (-s), -s.sum()) / n
        loss = float((r * s).sum()) / n
        g[:-1] += l2 * w[:-1]
        loss += 0.5 * l2 * float(w[:-1] @ w[:-1])
        return g, loss

    got = linear.quantile_fit(
        df, "v", "y", tau=tau, iters=6, lr=0.25, l2=l2
    )
    w = np.zeros(65)
    g, loss = gl(w)
    step = 0.25
    for _ in range(6):
        while True:
            cand = w - step * g
            g2, loss2 = gl(cand)
            if loss2 <= loss or step < 1e-12:
                break
            step *= 0.5
        if abs(loss - loss2) < 1e-9:
            w, loss = cand, loss2
            break
        w, g, loss = cand, g2, loss2
        step = min(step * 2.0, 0.25)  # mirror the re-growth policy
    assert np.allclose(got["weights"], w[:-1], rtol=1e-6, atol=1e-9)
    assert got["intercept"] == pytest.approx(w[-1], abs=1e-9)
    with pytest.raises(ValueError, match="tau"):
        linear.quantile_fit(df, "v", "y", tau=1.5)


def test_ipw_ate_debiases_confounding_and_duckdb_parity(
    spark, oracle_sf_dir
):
    """IPW: planted confounding (v0 raises BOTH treatment propensity
    and outcome) biases the naive arm difference upward; weighting by
    the true propensity model recovers the planted effect. With the
    pinned literal model the whole operator replays exactly in DuckDB
    (scoring-parity precedent)."""
    import math

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    u = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
            16, 10,
        ).cast("long"),
        F.lit(1_000_000),
    ) / 1_000_000.0
    e_true = F.lit(1.0) / (F.lit(1.0) + F.exp(-12.0 * v[0]))
    tau = 2.0
    df = emb.select(
        "vec_id",
        v.alias("x"),
        (u < e_true).cast("double").alias("t"),
        v[0].alias("v0"),
    ).withColumn("y", 5.0 + tau * F.col("t") + 8.0 * F.col("v0"))
    naive = df.groupBy().agg(
        (
            F.avg(F.when(F.col("t") == 1.0, F.col("y")))
            - F.avg(F.when(F.col("t") == 0.0, F.col("y")))
        ).alias("d")
    ).first()["d"]
    assert naive > tau + 0.3  # confounding inflates the naive readout

    model = {"weights": [12.0] + [0.0] * 63, "intercept": 0.0}
    got = linear.ipw_ate(df, model, "t", "y", "x", clip=0.02).first()
    assert abs(got.ate - tau) < 0.15  # debiased
    assert got.ess_treat < got.n_treat  # weighting pays in ESS
    assert got.ess_control < got.n_control

    import json

    w_json = json.dumps(model["weights"], separators=(",", ":"))
    e_sql = (
        "1.0 / (1.0 + exp(-(list_dot_product(embedding::DOUBLE[], "
        f"'{w_json}'::JSON::DOUBLE[]) + 0.0)))"
    )
    sql = f"""
        WITH base AS (
          SELECT vec_id, embedding, embedding[1]::DOUBLE AS v0,
            CASE WHEN
              ({_md5_u_sql()}) < 1.0/(1.0+exp(-12.0*embedding[1]::DOUBLE))
            THEN 1.0 ELSE 0.0 END AS t
          FROM embeddings
        ),
        scored AS (
          SELECT t, 5.0 + 2.0 * t + 8.0 * v0 AS y,
                 LEAST(GREATEST(({e_sql}), 0.02), 0.98) AS e
          FROM base
        ),
        wtd AS (
          SELECT t, y, t / e + (1.0 - t) / (1.0 - e) AS w FROM scored
        )
        SELECT
          COUNT(*) FILTER (t = 1.0) AS n_treat,
          COUNT(*) FILTER (t = 0.0) AS n_control,
          {sql_round("SUM(w*y) FILTER (t=1.0) / SUM(w) FILTER (t=1.0)", 6)}
            AS mu_treat,
          {sql_round("SUM(w*y) FILTER (t=0.0) / SUM(w) FILTER (t=0.0)", 6)}
            AS mu_control,
          {sql_round(
            "SUM(w*y) FILTER (t=1.0) / SUM(w) FILTER (t=1.0) - "
            "SUM(w*y) FILTER (t=0.0) / SUM(w) FILTER (t=0.0)", 6)} AS ate,
          {sql_round(
            "POW(SUM(w) FILTER (t=1.0), 2) / SUM(w*w) FILTER (t=1.0)", 6)}
            AS ess_treat,
          {sql_round(
            "POW(SUM(w) FILTER (t=0.0), 2) / SUM(w*w) FILTER (t=0.0)", 6)}
            AS ess_control
        FROM wtd
    """
    assert compare(
        linear.ipw_ate(df, model, "t", "y", "x", clip=0.02),
        duckdb_connect(oracle_sf_dir),
        sql,
    ) == []


def _md5_u_sql():
    """DuckDB twin of the test's treatment coin: 60-bit md5 prefix of
    vec_id mod 1e6 over 1e6 (the md5_hash60 bridge)."""
    from bigdata_storage_and_proccess_job_data_spark.plans.scale_queries import (
        _md5_hash60_sql,
    )

    h = _md5_hash60_sql("vec_id::VARCHAR")
    return f"(({h}) % 1000000) / 1000000.0"


def test_aipw_double_robustness(spark, oracle_sf_dir):
    """AIPW's defining property, pinned from both directions: with the
    TRUE outcome models and a WRONG propensity the estimate stays on
    the planted effect, and with the TRUE propensity and WRONG outcome
    models it also stays -- while plain IPW with the same wrong
    propensity drifts. Plus DuckDB replay parity with pinned models."""
    import json

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    u = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
            16, 10,
        ).cast("long"),
        F.lit(1_000_000),
    ) / 1_000_000.0
    e_true = F.lit(1.0) / (F.lit(1.0) + F.exp(-12.0 * v[0]))
    tau = 2.0
    df = emb.select(
        "vec_id", v.alias("x"),
        (u < e_true).cast("double").alias("t"),
        v[0].alias("v0"),
    ).withColumn("y", 5.0 + tau * F.col("t") + 8.0 * F.col("v0"))
    prop_true = {"weights": [12.0] + [0.0] * 63, "intercept": 0.0}
    prop_wrong = {"weights": [0.0] * 64, "intercept": 0.0}  # e=0.5 flat
    m1_true = {"weights": [8.0] + [0.0] * 63, "intercept": 7.0}
    m0_true = {"weights": [8.0] + [0.0] * 63, "intercept": 5.0}
    m_wrong = {"weights": [0.0] * 64, "intercept": 0.0}

    # wrong propensity + true outcomes: still on target
    a1 = linear.aipw_ate(
        df, prop_wrong, m1_true, m0_true, "t", "y", "x"
    ).first()
    assert abs(a1.ate - tau) < 0.05
    # true propensity + wrong outcomes: unbiased but HIGH-VARIANCE
    # (zero outcome models leave uncentered residuals riding raw
    # Horvitz-Thompson weights) -- the honest pin is the estimator's
    # own standard error, which AIPW emits for exactly this reason
    a2 = linear.aipw_ate(
        df, prop_true, m_wrong, m_wrong, "t", "y", "x", clip=0.02
    ).first()
    assert abs(a2.ate - tau) < 3.0 * a2.se
    # plain IPW under the same wrong propensity drifts (the contrast)
    ipw_wrong = linear.ipw_ate(
        df, prop_wrong, "t", "y", "x"
    ).first()
    assert abs(ipw_wrong.ate - tau) > abs(a1.ate - tau)
    # noiseless true outcome models make psi = tau for EVERY unit --
    # zero variance is the correct readout, not a bug
    assert a1.se == 0.0 and a1.ate == pytest.approx(tau, abs=1e-6)
    assert a2.se > 0

    w_json = json.dumps(prop_true["weights"], separators=(",", ":"))
    e_sql = (
        "LEAST(GREATEST(1.0 / (1.0 + exp(-(list_dot_product("
        f"embedding::DOUBLE[], '{w_json}'::JSON::DOUBLE[])))), 0.02), "
        "0.98)"
    )
    m1_json = json.dumps(m1_true["weights"], separators=(",", ":"))
    sql = f"""
        WITH base AS (
          SELECT embedding, embedding[1]::DOUBLE AS v0,
            CASE WHEN
              ({_md5_u_sql()}) < 1.0/(1.0+exp(-12.0*embedding[1]::DOUBLE))
            THEN 1.0 ELSE 0.0 END AS t
          FROM embeddings
        ),
        scored AS (
          SELECT t, 5.0 + 2.0 * t + 8.0 * v0 AS y,
            ({e_sql}) AS e,
            list_dot_product(embedding::DOUBLE[],
              '{m1_json}'::JSON::DOUBLE[]) + 7.0 AS m1,
            list_dot_product(embedding::DOUBLE[],
              '{m1_json}'::JSON::DOUBLE[]) + 5.0 AS m0
          FROM base
        ),
        psi AS (
          SELECT m1 - m0 + t * (y - m1) / e
                 - (1.0 - t) * (y - m0) / (1.0 - e) AS p
          FROM scored
        )
        SELECT COUNT(*) AS n,
          {sql_round("AVG(p)", 6)} AS ate,
          {sql_round("sqrt(VAR_SAMP(p) / COUNT(*))", 6)} AS se
        FROM psi
    """
    got = linear.aipw_ate(
        df, prop_true, m1_true, m0_true, "t", "y", "x", clip=0.02
    )
    assert compare(got, duckdb_connect(oracle_sf_dir), sql) == []

