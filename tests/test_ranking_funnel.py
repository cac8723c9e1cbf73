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
