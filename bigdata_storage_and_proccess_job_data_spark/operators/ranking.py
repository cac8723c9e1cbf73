"""BM25 full-text ranking over a document corpus.

The corpus suite covers dedup/quality/similarity; this adds the
retrieval primitive -- score every document against a (small) term
query with Okapi BM25 and return the top-k. At training-data scale the
same shape powers decontamination triage and "find documents about X"
corpus audits without an external search cluster.

Scale shape (all native expressions, no Python in the row path):
- tokenize once, explode ONLY tokens that are query terms (the filter
  sits directly on the generator output, so the explode never
  materializes non-query tokens downstream);
- tf = count per (doc, term): one narrow shuffle of (doc_id, term);
- df per term + the global doc count / average length are tiny
  aggregates; idf joins back via broadcast (|terms| rows);
- the per-doc length norm attaches the one-row (N, avgdl) frame with a
  broadcast -- O(n x 1), the impute_mean pattern;
- final score = sum over <= |terms| partials, ranked with a window
  top-k (no global sort of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions import text
from bigdata_storage_and_proccess_job_data_spark.functions.numeric import stable_round


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    materialize: bool = True,
) -> DataFrame:
    """Okapi BM25 top-k: (id, score, rank) for the ``k`` highest-scoring
    documents against ``query_terms`` (matched case-insensitively,
    whitespace tokenization -- the corpus suite's shared tokenizer).
    idf uses the +1 ("Lucene") form, ln(1 + (N - df + .5)/(df + .5)),
    so scores stay positive for terms in most documents. Score rounded
    via stable_round(4) for cross-engine determinism; ties rank by id.

    ``materialize=True`` (default) eagerly computes the <= k result
    rows and releases the internal cache before returning (the
    deterministic-release contract, ADVICE r4); ``materialize=False``
    returns the LAZY pipeline un-persisted -- the tokenize+explode
    lineage will run once per consumer, but the full operator plan
    stays inspectable (the plan-hygiene gate probes this form)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = text.tokens(F.lower(F.col(text_col)))
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").cast("long").alias("_dl"),
        "_toks",
    )
    # corpus scalars: N and average doc length (one tiny row, broadcast)
    scalars = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    # per-(doc, term) tf over query terms only. Persisted: both the
    # df-per-term aggregate and the final scoring join consume this
    # frame, and without the persist each consumer re-runs the corpus
    # tokenize+explode lineage (2 full scans instead of 1). It is the
    # small side -- one row per (matching doc, term) -- the same
    # precedent as neardup's persisted signature frame. Released
    # deterministically below (ADVICE r4): the final top-k is <= k rows
    # by contract, so it is materialized eagerly and the cache dropped
    # in the finally -- no storage survives the call.
    hits = (
        base.select(
            id_col,
            "_dl",
            F.explode(
                F.filter(
                    F.col("_toks"), lambda t: t.isin(terms)
                )
            ).alias("_term"),
        )
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    if materialize:
        hits = hits.persist()
    try:
        # per-term document frequency -> idf (broadcast: |terms| rows)
        df_by_term = hits.groupBy("_term").agg(
            F.count(F.lit(1)).cast("long").alias("_df")
        )
        scored = (
            hits.join(F.broadcast(df_by_term), "_term")
            .crossJoin(F.broadcast(scalars))
            .select(
                F.col(id_col),
                (
                    F.log(
                        F.lit(1.0)
                        + (F.col("_n_docs") - F.col("_df") + 0.5)
                        / (F.col("_df") + 0.5)
                    )
                    * (F.col("_tf") * (k1 + 1))
                    / (
                        F.col("_tf")
                        + k1
                        * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
                    )
                ).alias("_part"),
            )
            .groupBy(id_col)
            .agg(stable_round(F.sum("_part"), 4).alias("score"))
        )
        # TakeOrderedAndProject first (distributed partial top-k per
        # partition, k rows to the driver-side merge), THEN a row_number
        # window over only those k rows -- never a single-partition
        # window over the whole scored corpus
        topk = scored.orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        ).limit(k)
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        ranked = (
            topk.withColumn("rank", F.row_number().over(w))
            .select(id_col, "score", F.col("rank").cast("long").alias("rank"))
        )
        if not materialize:
            return ranked
        # materialize the <= k result rows (driver-sized by definition --
        # the same bounded-collect precedent as the Arrow query cap),
        # then release the cached hits frame before returning
        rows = ranked.collect()
        schema = ranked.schema
    finally:
        if materialize:
            hits.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema)
