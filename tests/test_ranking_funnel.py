"""Operator-level semantics for BM25 ranking (operators/ranking.py) and
ordered funnels (operators/funnel.py). Engine-vs-DuckDB value parity for
the registered queries is covered by test_oracle_parity.py."""

from __future__ import annotations

import datetime
import math

import pytest

from bigdata_storage_and_proccess_job_data_spark.operators import funnel, ranking


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 10, minute)


def test_funnel_counts_strict_order(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, _ts(1), "click"), (2, _ts(2), "view"),
        # u3 views only
        (3, _ts(0), "view"),
        # u4 purchases with no view: not even step 1
        (4, _ts(0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    out = {r.step: r.users for r in funnel.funnel_counts(
        df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_counts_equal_timestamp_not_counted(spark):
    # strictly-after semantics: same-instant click does not advance
    rows = [(1, _ts(0), "view"), (1, _ts(0), "click")]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    out = {r.step: r.users for r in funnel.funnel_counts(
        df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_funnel_counts_are_nonincreasing_on_events(spark, sf_dir):
    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        funnel.funnel_counts(ev, ["view", "click", "purchase"]).collect(),
        key=lambda r: r.step_index,
    )
    assert [r.step for r in rows] == ["view", "click", "purchase"]
    assert rows[0].users >= rows[1].users >= rows[2].users


def test_bm25_scores_known_corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark"),       # high tf for 'spark'
            (2, "spark flink beam"),        # one hit
            (3, "flink beam storm"),        # no hits
            (4, "rare rare spark"),         # 'rare' appears only here
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: (r.score, r.rank) for r in ranking.bm25_topk(
        df, ["spark", "rare"], k=10).collect()}
    # doc 3 has no query terms -> absent
    assert set(out) == {1, 2, 4}
    # doc 4 matches the rarer term (higher idf) -> outranks tf-heavy doc 1
    assert out[4][1] == 1
    # more tf for the same term beats less tf at equal length
    assert out[1][0] > out[2][0]
    # hand-check doc 2's score: tf=1, dl=3, avgdl=3, df(spark)=3, N=4
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 3 / 3.0))
    assert out[2][0] == pytest.approx(expect, abs=1e-4)


def test_bm25_validates_inputs(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="query_terms"):
        ranking.bm25_topk(df, [])


def _write_hybrid_fixture(tmp_path, embedded_ids):
    """Tiny documents/embeddings parquet pair where the BM25 top-1 doc
    has NO embedding row -- the shape that crashed the unguarded
    top-1-embedding lookup and silently dropped candidates under the
    inner-join rerank (code review, round 5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "spark window fast spark window fast",  # BM25 top-1
                    "spark window fast",
                    "spark window other words here",
                    "fast other",
                    "unrelated text entirely",  # never a candidate
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    vecs = {2: [1.0, 0.0, 0.0], 3: [0.5, 0.5, 0.0], 5: [0.0, 1.0, 0.0]}
    emb = pa.table(
        {
            "vec_id": pa.array(sorted(embedded_ids), pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in sorted(embedded_ids)],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))


def _hybrid_oracle_con(tmp_path):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
        )
    return con


def test_hybrid_search_survives_unembedded_top1(spark, tmp_path):
    """Top-1 BM25 doc (1) has no embedding: the pseudo-relevance vector
    falls back to the best-ranked embedded candidate (2), and the
    un-embedded candidates (1, 4) stay in the result with NULL cos_sim
    and a pure-BM25 hybrid score -- on both engines."""
    from bigdata_storage_and_proccess_job_data_spark.plans import all_queries
    from tests.parity import compare

    _write_hybrid_fixture(tmp_path, embedded_ids={2, 3})
    q = all_queries()["hybrid_search"]
    df = q.fn(spark, str(tmp_path))
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].cos_sim is None and rows[4].cos_sim is None
    # doc 1 holds the max BM25 score: hybrid = 0.5 * 1.0 + 0.5 * 0
    assert rows[1].hybrid_score == 0.5
    # doc 2 supplied the query vector: cosine with itself is 1.0
    assert rows[2].cos_sim == 1.0
    con = _hybrid_oracle_con(tmp_path)
    try:
        problems = compare(df, con, q.oracle)
    finally:
        con.close()
    assert not problems, problems


def test_hybrid_search_empty_when_no_embedded_candidate(spark, tmp_path):
    """No candidate has an embedding row (only non-candidate doc 5 is
    embedded): no pseudo-relevance vector exists, so the result is empty
    with the full output schema -- matching the oracle, whose qv CTE
    empties the chain."""
    from bigdata_storage_and_proccess_job_data_spark.plans import all_queries
    from tests.parity import compare

    _write_hybrid_fixture(tmp_path, embedded_ids={5})
    q = all_queries()["hybrid_search"]
    df = q.fn(spark, str(tmp_path))
    assert df.columns == [
        "doc_id", "bm25_score", "cos_sim", "hybrid_score", "rank",
    ]
    assert df.count() == 0
    con = _hybrid_oracle_con(tmp_path)
    try:
        problems = compare(df, con, q.oracle)
    finally:
        con.close()
    assert not problems, problems


def test_mmr_rerank_diversity_and_degenerate_lambda(spark):
    """MMR re-rank: (1) lam=1 reduces to plain top-k by (relevance desc,
    id asc); (2) at lam=0.5 two near-identical high-relevance twins do
    NOT both make a k=2 cut -- the diverse lower-relevance candidate
    displaces the second twin (the whole point of MMR for training-set
    retrieval); (3) the per-group candidate bound raises; (4) zero-norm
    vectors are dropped."""
    from pyspark.sql import functions as F

    # one query, 4 candidates: twins a/b (same direction, top scores),
    # c orthogonal (lower score), d zero-norm (must be dropped)
    rows = [
        (1, 10, 0.95, [1.0, 0.0, 0.0]),
        (1, 11, 0.94, [0.999, 0.01, 0.0]),
        (1, 12, 0.80, [0.0, 1.0, 0.0]),
        (1, 13, 0.99, [0.0, 0.0, 0.0]),
    ]
    cand = spark.createDataFrame(
        rows,
        "query_id LONG, neighbor_id LONG, sim DOUBLE, "
        "embedding ARRAY<DOUBLE>",
    )

    plain = ranking.mmr_rerank(cand, k=3, lam=1.0).collect()
    assert [(r.neighbor_id, r.mmr_rank) for r in sorted(plain, key=lambda r: r.mmr_rank)] == [
        (10, 1), (11, 2), (12, 3),
    ]  # zero-norm 13 dropped despite top raw score

    diverse = ranking.mmr_rerank(cand, k=2, lam=0.5).collect()
    picked = [r.neighbor_id for r in sorted(diverse, key=lambda r: r.mmr_rank)]
    assert picked == [10, 12], picked  # twin 11 displaced by orthogonal 12

    with pytest.raises(Exception, match="max_candidates"):
        ranking.mmr_rerank(cand, k=2, max_candidates=2).collect()

    with pytest.raises(ValueError, match="lam"):
        ranking.mmr_rerank(cand, lam=1.5)


def test_mmr_rerank_composes_with_knn_and_is_per_query(spark, oracle_sf_dir):
    """MMR consumes a real top-k: brute_force_topk candidates joined
    back to their vectors, diversified per query -- k rows per query,
    rank-1 is each query's relevance argmax, deterministic across
    runs."""
    from pyspark.sql import functions as F

    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.operators import similarity

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    topk = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") < 5), emb, k=10
    )
    cand = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    out = ranking.mmr_rerank(cand, k=4, lam=0.6).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5 and all(len(v) == 4 for v in by_q.values())
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.mmr_rank)
        best_rel = max(r.relevance for r in rs)
        assert rs[0].relevance == best_rel  # rank 1 = relevance argmax
    again = ranking.mmr_rerank(cand, k=4, lam=0.6).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_sessionize_hand_math_and_validation(spark):
    """Gap rule, per-user isolation, NULL drops, 1-based seq, unit
    parsing."""
    import datetime as dt

    import pytest

    from bigdata_storage_and_proccess_job_data_spark.operators import funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, at(0)), (1, at(10)), (1, at(50)),   # 40-min gap: new session
        (1, at(55)),
        (2, at(0)),                              # other user independent
        (None, at(0)), (3, None),                # dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = funnel.sessionize(df, gap="30 minutes")
    got = {
        (r.user_id, r.ts): (r.session_seq, r.session_id)
        for r in out.collect()
    }
    assert len(got) == 5
    assert got[(1, at(0))] == (1, "1#1")
    assert got[(1, at(10))] == (1, "1#1")
    assert got[(1, at(50))] == (2, "1#2")
    assert got[(1, at(55))] == (2, "1#2")
    assert got[(2, at(0))] == (1, "2#1")

    # exactly-at-gap stays in session (strict > starts a new one)
    df2 = spark.createDataFrame(
        [(1, at(0)), (1, at(30))], "user_id long, ts timestamp"
    )
    s2 = funnel.sessionize(df2, gap="30 minutes").collect()
    assert {r.session_seq for r in s2} == {1}

    stats = funnel.session_stats(funnel.sessionize(df)).collect()
    by_id = {r.session_id: r for r in stats}
    assert by_id["1#1"].n_events == 2
    assert by_id["1#1"].duration_s == 600.0

    with pytest.raises(ValueError):
        funnel.sessionize(df, gap="30 fortnights")
    with pytest.raises(ValueError):
        funnel.sessionize(df, gap=-5)


def test_sessionize_duckdb_parity(spark, sf_dir):
    """Full row-level session labels on the events table match DuckDB
    computing the same lag + running-sum formulation."""
    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.operators import funnel
    from tests.parity import compare, duckdb_connect

    events = load_table(spark, sf_dir, "events")
    out = funnel.sessionize(
        events, gap="45 minutes", tiebreak_cols=["event_id"]
    ).select("event_id", "session_seq", "session_id")
    con = duckdb_connect(sf_dir)
    problems = compare(
        out,
        con,
        """
        WITH base AS (
          SELECT event_id, user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        flagged AS (
          SELECT *, CASE WHEN prev_ts IS NULL
                           OR epoch(ts) - epoch(prev_ts) > 2700
                         THEN 1 ELSE 0 END AS is_new
          FROM base
        )
        SELECT event_id,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq,
               user_id::VARCHAR || '#' ||
                 (SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::VARCHAR
                 AS session_id
        FROM flagged
        """,
    )
    assert problems == [], problems


def test_attribute_conversions_models(spark):
    """First/last/linear credit assignment: window cut, equal-ts
    inclusion, deterministic tiebreak, the direct (no-touch) bucket,
    and per-conversion credit always summing to 1."""
    import datetime as dt

    import pytest

    from bigdata_storage_and_proccess_job_data_spark.operators import funnel

    t = dt.datetime(2024, 6, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # u1: three touches then a conversion; one touch outside window
        (1, 1, "view", t - dt.timedelta(days=9)),     # too old
        (2, 1, "view", t - 30 * m),
        (3, 1, "click", t - 10 * m),
        (4, 1, "view", t),                             # equal ts: counts
        (5, 1, "purchase", t),
        # u2: conversion with no touches at all -> direct bucket
        (6, 2, "purchase", t),
        # u3: a touch AFTER the conversion never counts
        (7, 3, "click", t + 5 * m),
        (8, 3, "purchase", t),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )

    lin = funnel.attribute_conversions(
        df, ["view", "click"], "purchase", model="linear"
    ).collect()
    per_conv = {}
    for r in lin:
        per_conv.setdefault(r.conversion_id, []).append(r)
    assert {r.touch_id for r in per_conv[5]} == {2, 3, 4}
    assert all(abs(r.credit - 1 / 3) < 1e-12 for r in per_conv[5])
    assert [r.touch_id for r in per_conv[6]] == [None]
    assert per_conv[6][0].credit == 1.0
    assert [r.touch_id for r in per_conv[8]] == [None]  # future touch
    for conv_rows in per_conv.values():
        assert abs(sum(r.credit for r in conv_rows) - 1.0) < 1e-12

    first = {
        r.conversion_id: r.touch_id
        for r in funnel.attribute_conversions(
            df, ["view", "click"], "purchase", model="first"
        ).collect()
    }
    last = {
        r.conversion_id: r.touch_id
        for r in funnel.attribute_conversions(
            df, ["view", "click"], "purchase", model="last"
        ).collect()
    }
    assert first[5] == 2 and last[5] == 4
    assert first[6] is None and last[6] is None

    with pytest.raises(ValueError, match="model"):
        funnel.attribute_conversions(df, ["view"], "purchase", model="x")


def test_attribute_conversions_duckdb_parity(spark, sf_dir):
    """Linear-model credits over the full events table match DuckDB
    computing the identical band join + equal split."""
    from pyspark.sql import functions as F

    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        sql_round,
        stable_round,
    )
    from bigdata_storage_and_proccess_job_data_spark.operators import funnel
    from tests.parity import compare, duckdb_connect

    events = load_table(spark, sf_dir, "events")
    out = funnel.attribute_conversions(
        events, ["view", "click"], "purchase",
        model="linear", window="2 days",
    ).select(
        "conversion_id",
        "touch_id",
        stable_round(F.col("credit"), 6).alias("credit"),
    )
    con = duckdb_connect(sf_dir)
    problems = compare(
        out,
        con,
        f"""
        WITH conv AS (
          SELECT user_id AS u, event_id AS conversion_id, ts AS cts
          FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
          SELECT user_id AS u, event_id AS touch_id, ts AS tts
          FROM events WHERE event_type IN ('view', 'click')
        ),
        j AS (
          SELECT conv.conversion_id, touch.touch_id
          FROM conv LEFT JOIN touch
            ON conv.u = touch.u
           AND touch.tts <= conv.cts
           AND epoch(touch.tts) >= epoch(conv.cts) - 172800
        ),
        n AS (
          SELECT conversion_id, COUNT(touch_id) AS n_t
          FROM j GROUP BY conversion_id
        )
        SELECT j.conversion_id, j.touch_id,
               {sql_round("CASE WHEN j.touch_id IS NULL THEN 1.0 ELSE 1.0 / n.n_t END", 6)} AS credit
        FROM j JOIN n USING (conversion_id)
        """,
    )
    assert problems == [], problems


def test_event_transitions_pins_and_parity(spark, oracle_sf_dir):
    """Markov transitions: (1) hand sequences pin counts and
    conditional probabilities; (2) terminal mode adds exit mass so
    each from-state's probs sum to 1 over events, and row totals equal
    event counts; (3) full DuckDB replay parity on events per
    event_type pair with a composed (ts, event_id) tiebreaker."""
    from pyspark.sql import functions as F

    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        sql_round,
    )
    from tests.parity import compare, duckdb_connect

    rows = [
        ("u1", 1, "x"), ("u1", 2, "y"), ("u1", 3, "x"),
        ("u2", 1, "y"), ("u2", 2, "y"),
        ("u3", 1, "x"),  # singleton: no transition without terminal
    ]
    df = spark.createDataFrame(rows, "u string, t long, s string")
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in funnel.event_transitions(df, "u", "t", "s").collect()
    }
    assert got == {
        ("x", "y"): (1, 1.0),
        ("y", "x"): (1, 0.5),
        ("y", "y"): (1, 0.5),
    }
    term = {
        (r.from_state, r.to_state): r.n
        for r in funnel.event_transitions(
            df, "u", "t", "s", terminal="_end"
        ).collect()
    }
    assert sum(term.values()) == len(rows)
    assert term[("x", "_end")] == 2 and term[("y", "_end")] == 1
    # per-source probabilities sum to 1 in terminal mode
    probs = funnel.event_transitions(
        df, "u", "t", "s", terminal="_end"
    ).groupBy("from_state").agg(F.sum("prob").alias("p")).collect()
    for r in probs:
        assert r.p == pytest.approx(1.0, abs=1e-5)

    events = load_table(spark, oracle_sf_dir, "events").withColumn(
        "_ord", F.struct("ts", "event_id")
    )
    got_r = funnel.event_transitions(
        events, "user_id", "_ord", "event_type", digits=6
    )
    sql = f"""
        WITH nxt AS (
          SELECT event_type AS from_state,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_state
          FROM events
          WHERE event_type IS NOT NULL
        ),
        pairs AS (
          SELECT from_state, to_state, COUNT(*) AS n
          FROM nxt WHERE to_state IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_state, to_state, n,
          {sql_round(
            "n::DOUBLE / SUM(n) OVER (PARTITION BY from_state)", 6)}
            AS prob
        FROM pairs
    """
    assert compare(got_r, duckdb_connect(oracle_sf_dir), sql) == []


def test_ranking_metrics_pins_and_parity(spark, oracle_sf_dir):
    """Retrieval eval: (1) hand-computable precision/recall/MRR/NDCG
    pins incl. the empty-truth NULL and unanswered-query zero
    conventions; (2) full DuckDB replay parity on a supplier->part
    recommendation task derived from lineitem."""
    import math

    from pyspark.sql import functions as F

    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        sql_round,
    )
    from tests.parity import compare, duckdb_connect

    recs = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3), ("q1", "c", 4),
         ("q2", "z", 1)],
        "q string, i string, rk long",
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q3", "m")],
        "q string, i string",
    )
    got = {
        r.q: r
        for r in ranking.ranking_metrics(
            recs, truth, "q", "i", k=3, rank_col="rk"
        ).collect()
    }
    r1 = got["q1"]
    assert (r1.n_rel, r1.hits) == (3, 2)
    assert r1.precision_at_k == pytest.approx(2 / 3, abs=1e-6)
    assert r1.recall_at_k == pytest.approx(2 / 3, abs=1e-6)
    assert r1.mrr == 1.0
    dcg = 1.0 + 1.0 / math.log2(4.0)
    idcg = 1.0 + 1.0 / math.log2(3.0) + 0.5
    assert r1.ndcg == pytest.approx(dcg / idcg, abs=1e-6)
    r2 = got["q2"]  # answered, nothing relevant exists
    assert r2.hits == 0 and r2.precision_at_k == 0.0
    assert r2.recall_at_k is None and r2.ndcg is None and r2.mrr == 0.0
    r3 = got["q3"]  # never answered: all-zero, not dropped
    assert (r3.hits, r3.mrr, r3.ndcg) == (0, 0.0, 0.0)
    assert r3.recall_at_k == 0.0

    li = load_table(spark, oracle_sf_dir, "lineitem")
    pairs = li.groupBy(
        (F.col("l_suppkey") % 20).alias("q"),
        (F.col("l_partkey") % 100).alias("i"),
    ).agg(
        F.sum("l_extendedprice").alias("score"),
        F.sum("l_quantity").alias("qty"),
    )
    got_r = ranking.ranking_metrics(
        pairs, pairs.filter(F.col("qty") > 400), "q", "i",
        k=5, score_col="score",
    )
    sql = f"""
        WITH pairs AS (
          SELECT l_suppkey % 20 AS q, l_partkey % 100 AS i,
                 SUM(l_extendedprice) AS score, SUM(l_quantity) AS qty
          FROM lineitem GROUP BY 1, 2
        ),
        ranked AS (
          SELECT q, i, ROW_NUMBER() OVER (
            PARTITION BY q ORDER BY score DESC, i
          ) AS rk
          FROM pairs
        ),
        r AS (SELECT * FROM ranked WHERE rk <= 5),
        t AS (SELECT DISTINCT q, i FROM pairs WHERE qty > 400),
        n_rel AS (SELECT q, COUNT(*) AS n_rel FROM t GROUP BY 1),
        hits AS (
          SELECT r.q, COUNT(*) AS hits, MIN(r.rk) AS frst,
                 SUM(1.0 / log2(r.rk + 1.0)) AS dcg
          FROM r JOIN t ON r.q = t.q AND r.i = t.i
          GROUP BY 1
        ),
        base AS (
          SELECT COALESCE(a.q, n.q) AS q,
                 COALESCE(n.n_rel, 0) AS n_rel,
                 COALESCE(h.hits, 0) AS hits, h.frst,
                 COALESCE(h.dcg, 0.0) AS dcg
          FROM (SELECT DISTINCT q FROM r) a
          FULL JOIN n_rel n USING (q)
          LEFT JOIN hits h ON COALESCE(a.q, n.q) = h.q
        )
        SELECT q, n_rel, hits,
          {sql_round("hits / 5.0", 6)} AS precision_at_k,
          {sql_round(
            "CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel END", 6)}
            AS recall_at_k,
          {sql_round("COALESCE(1.0 / frst, 0.0)", 6)} AS mrr,
          {sql_round(
            "CASE WHEN n_rel > 0 THEN dcg / list_sum(list_transform("
            "generate_series(1, LEAST(n_rel, 5)), "
            "x -> 1.0 / log2(x + 1.0))) END", 6)} AS ndcg
        FROM base
    """
    assert compare(got_r, duckdb_connect(oracle_sf_dir), sql) == []


def test_retention_matrix_hand_pins_and_parity(spark, oracle_sf_dir):
    """Cohort retention: (1) hand matrix on a four-user toy (cohort
    assignment by first activity, offset-0 retention 1.0, dropouts
    leave no row, NULL users/timestamps excluded); (2) full DuckDB
    replay parity on the events table at week grain; (3) month offsets
    are calendar differences (Jan 31 -> Feb 1 is one month)."""
    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        sql_round,
        stable_round,
    )
    from pyspark.sql import functions as F
    from tests.parity import compare, duckdb_connect

    d = datetime.datetime
    rows = [
        (1, d(2024, 1, 1)), (1, d(2024, 1, 9)),   # w0 cohort, back w1
        (2, d(2024, 1, 2)),                        # w0 cohort, gone
        (3, d(2024, 1, 8)), (3, d(2024, 1, 22)),  # w1 cohort, back w2
        (None, d(2024, 1, 1)), (4, None),          # excluded
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort.isoformat(), r.period_offset): (r.n_users, r.retention)
        for r in funnel.retention_matrix(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert got[("2024-01-08", 2)] == (1, 1.0)
    assert len(got) == 4  # no zero-filled rows

    mv = spark.createDataFrame(
        [(1, d(2024, 1, 31)), (1, d(2024, 2, 1)), (1, d(2024, 3, 1)),
         (2, d(2023, 12, 15)), (2, d(2024, 2, 20))],
        "user_id long, ts timestamp",
    )
    m = {
        (r.cohort.isoformat(), r.period_offset)
        for r in funnel.retention_matrix(mv, period="month").collect()
    }
    # calendar-month offsets: Jan 31 -> Feb 1 is 1, -> Mar 1 is 2; the
    # year boundary counts through December (Dec -> Feb = 2)
    assert m == {
        ("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 2),
        ("2023-12-01", 0), ("2023-12-01", 2),
    }

    with pytest.raises(ValueError, match="period"):
        funnel.retention_matrix(ev, period="quarter")

    events = load_table(spark, oracle_sf_dir, "events")
    out = funnel.retention_matrix(events, period="week").select(
        "cohort",
        "period_offset",
        "n_users",
        stable_round(F.col("retention"), 6).alias("retention"),
    )
    sql = f"""
        WITH active AS (
          SELECT DISTINCT user_id AS u,
                 date_trunc('week', ts)::DATE AS p
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        firsts AS (SELECT u, MIN(p) AS cohort FROM active GROUP BY u),
        cells AS (
          SELECT f.cohort,
                 CAST(date_diff('day', f.cohort, a.p) / 7 AS BIGINT)
                   AS period_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM active a JOIN firsts f USING (u)
          GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort, COUNT(*) AS sz FROM firsts GROUP BY cohort
        )
        SELECT c.cohort, c.period_offset, c.n_users,
               {sql_round('c.n_users * 1.0 / s.sz', 6)} AS retention
        FROM cells c JOIN sizes s USING (cohort)
    """
    errs = compare(out, duckdb_connect(oracle_sf_dir), sql)
    assert not errs, errs[:5]

    # the registered query rows DAY grain; the MONTH grain's calendar
    # arithmetic replays in DuckDB too (the fixture spans one month so
    # the matrix is small, but the values are bitwise-checked)
    out_m = funnel.retention_matrix(events, period="month").select(
        "cohort",
        "period_offset",
        "n_users",
        stable_round(F.col("retention"), 6).alias("retention"),
    )
    sql_m = f"""
        WITH active AS (
          SELECT DISTINCT user_id AS u,
                 date_trunc('month', ts)::DATE AS p
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        firsts AS (SELECT u, MIN(p) AS cohort FROM active GROUP BY u),
        cells AS (
          SELECT f.cohort,
                 CAST((year(a.p) - year(f.cohort)) * 12
                      + (month(a.p) - month(f.cohort)) AS BIGINT)
                   AS period_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM active a JOIN firsts f USING (u)
          GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort, COUNT(*) AS sz FROM firsts GROUP BY cohort
        )
        SELECT c.cohort, c.period_offset, c.n_users,
               {sql_round('c.n_users * 1.0 / s.sz', 6)} AS retention
        FROM cells c JOIN sizes s USING (cohort)
    """
    errs = compare(out_m, duckdb_connect(oracle_sf_dir), sql_m)
    assert not errs, errs[:5]


def test_rec_diversity_and_coverage_metrics(spark, sf_dir):
    """Coverage + ILD: (1) hand pins -- identical-vector lists score
    ILD ~0, orthogonal lists ~1, singleton lists NULL; coverage counts
    distinct in-catalog items only; (2) DuckDB replays both on real
    embeddings with recommendations derived from vec ids."""
    from bigdata_storage_and_proccess_job_data_spark.catalog import load_table
    from bigdata_storage_and_proccess_job_data_spark.functions.numeric import (
        sql_round,
        stable_round,
    )
    from pyspark.sql import functions as F
    from tests.parity import compare, duckdb_connect

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [1.0, 0.0]),       # identical pair
            (3, [0.0, 1.0]), (4, [1.0, 0.0]),       # orthogonal pair
            (5, [1.0, 1.0]),
        ],
        "item long, embedding array<double>",
    )
    recs = spark.createDataFrame(
        [("u1", 1), ("u1", 2), ("u2", 3), ("u2", 4), ("u3", 5),
         ("u4", 99)],  # 99: stale rec, not in catalog
        "user string, item long",
    )
    ild = {
        r.user: (r.k_items, r.ild)
        for r in ranking.intra_list_diversity(recs, vecs).collect()
    }
    assert ild["u1"][1] == _approx(0.0)
    assert ild["u2"][1] == _approx(1.0)
    assert ild["u3"] == (1, None)  # singleton: no pair
    # review: a user with NO embedded items still emits a row (NULL
    # ild), and k_items counts recommended items, not embedded ones
    assert ild["u4"] == (1, None)
    cov = ranking.catalog_coverage(recs, vecs, item_col="item").collect()[0]
    assert (cov.n_catalog, cov.n_recommended) == (5, 5)
    assert cov.coverage == _approx(1.0)

    emb = load_table(spark, sf_dir, "embeddings")
    myrecs = emb.select(
        (F.col("vec_id") % 20).alias("user"),
        F.col("vec_id").alias("item"),
    ).filter(F.col("vec_id") < 100)
    got = ranking.intra_list_diversity(
        myrecs, emb.select(F.col("vec_id").alias("item"), "embedding")
    ).select(
        "user", "k_items", stable_round(F.col("ild"), 6).alias("ild")
    )
    sql = f"""
        WITH recs AS (
          SELECT vec_id % 20 AS u, vec_id AS i,
                 embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < 100
        ),
        pairs AS (
          SELECT a.u,
                 1.0 - list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) AS d
          FROM recs a JOIN recs b ON a.u = b.u AND a.i < b.i
        ),
        n AS (SELECT u, COUNT(*)::BIGINT AS k_items FROM recs GROUP BY u),
        il AS (SELECT u, AVG(d) AS ild FROM pairs GROUP BY u)
        SELECT n.u AS user, n.k_items, {sql_round('il.ild', 6)} AS ild
        FROM n LEFT JOIN il ON n.u = il.u
    """
    assert compare(got, duckdb_connect(sf_dir), sql) == []


def _approx(x, tol=1e-9):
    import pytest

    return pytest.approx(x, abs=tol)
