"""ALS matrix factorization: md5-deterministic init (bit-equal Python
twin), run-to-run reproducibility, exact numpy-ALS replica, planted
low-rank recovery, and unseen-entity NULL scoring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.operators import factorization


def _planted(spark, n_users=30, n_items=20, rank=3, salt="truth"):
    uf = factorization.init_factors_py(range(n_users), rank, salt + "_u")
    itf = factorization.init_factors_py(range(n_items), rank, salt + "_i")
    rows = [
        (u, i, float(np.dot(uf[u], itf[i])) * 10.0)
        for u in range(n_users)
        for i in range(n_items)
    ]
    return spark.createDataFrame(rows, "u long, i long, r double")


def test_init_factors_python_twin_bit_equal(spark):
    df = spark.createDataFrame([(i,) for i in range(7)], "x long")
    got = {
        r.id: list(r.factors)
        for r in factorization.init_factors(df, "x", 4, "s1").collect()
    }
    twin = factorization.init_factors_py(range(7), 4, "s1")
    assert set(got) == set(twin)
    for k in got:
        assert got[k] == twin[k]  # bit-equal, not approx
    scale = 1.0 / 2.0
    assert all(-scale / 2 <= v < scale / 2 for vs in got.values() for v in vs)


def test_als_deterministic_and_recovers_planted(spark):
    df = _planted(spark)
    m1 = factorization.als_fit(df, "u", "i", "r", rank=3, iters=8, reg=1e-6)
    err = factorization.rmse(df, m1, "u", "i", "r")
    # noiseless rank-3 matrix, rank-3 fit: near-exact reconstruction
    assert err < 1e-3
    m2 = factorization.als_fit(df, "u", "i", "r", rank=3, iters=8, reg=1e-6)
    f1 = sorted((r.id, tuple(r.factors)) for r in m1["user_factors"].collect())
    f2 = sorted((r.id, tuple(r.factors)) for r in m2["user_factors"].collect())
    assert f1 == f2  # bit-reproducible run to run


def test_als_numpy_replica(spark):
    """Exact trajectory replica: same md5 init, same sorted-group fold
    order, same closed-form solves."""
    n_u, n_i, rank, reg, iters = 12, 8, 2, 0.1, 3
    df = _planted(spark, n_u, n_i, rank=2, salt="rep")
    rows = df.collect()
    r_mat = {}
    for r in rows:
        r_mat[(r.u, r.i)] = r.r
    items = factorization.init_factors_py(range(n_i), rank, "als")
    items = {i: np.asarray(v) for i, v in items.items()}
    users = {}
    for _ in range(iters):
        for u in range(n_u):
            pairs = sorted(i for (uu, i) in r_mat if uu == u)
            y = np.stack([items[i] for i in pairs])
            rv = np.array([r_mat[(u, i)] for i in pairs])
            users[u] = np.linalg.solve(
                y.T @ y + reg * np.eye(rank), y.T @ rv
            )
        for i in range(n_i):
            pairs = sorted(u for (u, ii) in r_mat if ii == i)
            y = np.stack([users[u] for u in pairs])
            rv = np.array([r_mat[(u, i)] for u in pairs])
            items[i] = np.linalg.solve(
                y.T @ y + reg * np.eye(rank), y.T @ rv
            )
    m = factorization.als_fit(
        df, "u", "i", "r", rank=rank, iters=iters, reg=reg
    )
    got_u = {r.id: np.asarray(r.factors)
             for r in m["user_factors"].collect()}
    got_i = {r.id: np.asarray(r.factors)
             for r in m["item_factors"].collect()}
    for u in range(n_u):
        assert np.allclose(got_u[u], users[u], rtol=1e-9, atol=1e-12)
    for i in range(n_i):
        assert np.allclose(got_i[i], items[i], rtol=1e-9, atol=1e-12)


def test_als_predict_unseen_null_and_guards(spark):
    df = _planted(spark, 6, 4, rank=2)
    m = factorization.als_fit(df, "u", "i", "r", rank=2, iters=2)
    probe = spark.createDataFrame(
        [(0, 0), (0, 999), (999, 0)], "u long, i long"
    )
    got = {
        (r.u, r.i): r.pred
        for r in factorization.predict(probe, m, "u", "i").collect()
    }
    assert got[(0, 0)] is not None
    assert got[(0, 999)] is None and got[(999, 0)] is None
    with pytest.raises(ValueError, match="rank"):
        factorization.als_fit(df, "u", "i", "r", rank=0)
    with pytest.raises(ValueError, match="reg"):
        factorization.als_fit(df, "u", "i", "r", reg=-1.0)


def test_als_recommendations_score_well_on_planted_structure(spark):
    """Integration glue: ALS recs on noiseless planted low-rank
    ratings, evaluated with ranking_metrics -- each user's true top-5
    items should be mostly recovered (NDCG/recall well above chance),
    tying the factorization and retrieval-evaluation stacks together."""
    from pyspark.sql import Window

    from bigdata_storage_and_proccess_job_data_spark.operators import ranking

    df = _planted(spark, n_users=25, n_items=30, rank=3)
    m = factorization.als_fit(df, "u", "i", "r", rank=3, iters=8,
                              reg=1e-4)
    scored = factorization.predict(
        df.select("u", "i"), m, "u", "i"
    )
    truth = (
        df.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("u").orderBy(F.col("r").desc(), "i")
            ),
        )
        .filter(F.col("_rk") <= 5)
        .select("u", "i")
    )
    metrics = ranking.ranking_metrics(
        scored, truth, "u", "i", k=5, score_col="pred"
    )
    row = metrics.agg(
        F.avg("ndcg").alias("ndcg"), F.avg("recall_at_k").alias("rec")
    ).first()
    # chance recall@5 of 5 planted items among 30 is ~0.17; the
    # reconstruction is near-exact, so recovery should be near 1
    assert row.rec > 0.9 and row.ndcg > 0.9


def test_recommend_topk_excludes_seen_and_matches_predict_order(spark):
    """The recommendation last mile: (1) recommended items never
    include the user's seen interactions; (2) per-user order equals the
    predict() scores ranked descending over the unseen catalog (exact
    agreement with a numpy re-ranking from the model's own factors);
    (3) every user gets exactly k fresh items when the catalog allows;
    (4) validation."""
    import numpy as np

    df = _planted(spark, n_users=20, n_items=24, rank=3)
    m = factorization.als_fit(df, "u", "i", "r", rank=3, iters=6, reg=1e-4)
    seen = df.select("u", "i").filter(F.col("i") % 3 == 0)
    recs = factorization.recommend_topk(
        m, k=5, seen=seen, user_col="u", item_col="i"
    )
    rows = recs.collect()
    seen_set = {(r.u, r.i) for r in seen.collect()}
    assert all((r.u, r.i) not in seen_set for r in rows)
    per_user = {}
    for r in rows:
        per_user.setdefault(r.u, []).append((r.rank, r.i, r.score))
    assert all(len(v) == 5 for v in per_user.values())
    assert len(per_user) == 20

    uf = {r.id: r.factors for r in m["user_factors"].collect()}
    itf = {r.id: r.factors for r in m["item_factors"].collect()}
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        DELTA,
    )

    for u, got in per_user.items():
        scores = {
            i: float(
                np.floor(
                    np.dot(uf[u], f) * 10_000 + (0.5 + DELTA)
                ) / 10_000
            )
            for i, f in itf.items()
            if (u, i) not in seen_set
        }
        want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:5]
        assert [(i, s) for _, i, s in sorted(got)] == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        factorization.recommend_topk(m, k=0)
