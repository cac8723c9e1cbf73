"""Blocked fuzzy string matching: edit-distance joins without a
cartesian product.

The reference has no string-similarity operator (SURVEY.md §2.6); this
is the beyond-reference entity-resolution primitive (typo-tolerant key
matching, near-identical name linking) that Spark also lacks natively:
``levenshtein(a, b) <= d`` as a bare join predicate plans as
BroadcastNestedLoopJoin -- O(|L| x |R|) edit-distance calls, each
itself O(len^2).

Scale path = q-gram pigeonhole blocking, COMPLETE by construction:

1. Count filter (Gravano et al., VLDB 2001): strings within edit
   distance d share >= max(|a|,|b|) - q + 1 - d*q positional q-grams
   (each edit destroys at most q grams). Whenever the longer string has
   length >= q*(d+1) that bound is >= 1, so the pair MUST share at
   least one q-gram string -- an equi-join on exploded distinct q-grams
   finds it. (|a|-|b|| <= d then forces the shorter side >= q, so both
   sides produce grams.)
2. Short-string band: pairs where BOTH sides are shorter than q*(d+1)
   can share zero grams, so all short strings additionally join on a
   length band -- the right side replicates to length keys l-d..l+d,
   the left joins on its exact length. Still an equi-join; the short
   class is a constant-bounded length range, never a cross product.
3. Union, distinct (a pair can surface via many grams), then verify the
   exact predicate with the engine's levenshtein. Only (id, gram) pairs
   ever shuffle -- candidate verification re-joins the strings by id.

Hot-gram caveat at 100 TB: a gram appearing in f strings contributes
O(f^2) candidates (the "th"-in-English problem). ``max_gram_freq``
drops grams above a frequency ceiling -- an explicit RECALL-trading
knob (a dropped pair is only lost if it shares no other surviving
gram); the default None keeps the join exact/complete. And no blocking
scheme beats the OUTPUT when the data's true pair density is itself
quadratic: TPC-H p_name at sf0.1 (20k names drawn from ~100 color
words) holds 5.5M true pairs at d=2 -- measured ~53 s on local[32],
i.e. candidate- and output-bound, exactly the O(candidates) contract.

NULL strings never match (grams of NULL explode to nothing; the band
path filters them), mirroring SQL equi-join NULL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions import text


def _gram_side(df: DataFrame, id_col: str, str_col: str, q: int) -> DataFrame:
    """(id, len, gram) with distinct grams per string, NULLs dropped."""
    return df.select(
        F.col(id_col),
        F.length(str_col).alias("_len"),
        F.explode(
            F.array_distinct(text.char_qgrams(F.col(str_col), q))
        ).alias("_g"),
    )


def _short_side(
    df: DataFrame, id_col: str, str_col: str, short_cutoff: int
) -> DataFrame:
    return df.select(F.col(id_col), F.length(str_col).alias("_len")).filter(
        F.col("_len") < short_cutoff
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_col, right_col) <=
    max_dist, as (left_id, right_id, dist). Complete (no blocking
    recall loss) unless ``max_gram_freq`` is set -- see module
    docstring for the two-path candidate construction.

    ``left_id`` / ``right_id`` must differ (they name the output
    columns); rename one side first if they collide."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    if max_gram_freq is not None and max_gram_freq < 1:
        raise ValueError("max_gram_freq must be >= 1 (or None for exact)")
    if left_id == right_id:
        raise ValueError(
            "left_id and right_id name the output columns and must differ"
        )
    d = max_dist
    short_cutoff = q * (d + 1)

    lg = _gram_side(left, left_id, left_col, q)
    rg = _gram_side(right, right_id, right_col, q)
    if max_gram_freq is not None:
        # recall knob: drop grams hotter than the ceiling on EITHER side
        # (candidate volume for gram g is |L_g| x |R_g|).
        hot = (
            lg.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_f"))
            .unionByName(rg.groupBy("_g").agg(F.count(F.lit(1)).alias("_f")))
            .groupBy("_g")
            .agg(F.max("_f").alias("_f"))
            .filter(F.col("_f") > max_gram_freq)
            .select("_g")
        )
        lg = lg.join(hot, "_g", "left_anti")
        rg = rg.join(hot, "_g", "left_anti")
    cand_gram = (
        lg.join(rg.withColumnRenamed("_len", "_rlen"), "_g")
        .filter(F.abs(F.col("_len") - F.col("_rlen")) <= d)
        .select(left_id, right_id)
    )

    ls = _short_side(left, left_id, left_col, short_cutoff)
    rs = _short_side(right, right_id, right_col, short_cutoff).select(
        right_id,
        F.explode(
            F.sequence(
                F.greatest(F.col("_len") - d, F.lit(0)), F.col("_len") + d
            )
        ).alias("_len"),
    )
    cand_short = ls.join(rs, "_len").select(left_id, right_id)

    cand = cand_gram.unionByName(cand_short).distinct()
    return (
        cand.join(left.select(left_id, left_col), left_id)
        .join(right.select(right_id, right_col), right_id)
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(right_col)))
        .filter(F.col("dist") <= d)
        .select(left_id, right_id, "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_gram_freq: int | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Typo-tolerant entity resolution: rows whose strings sit within
    ``max_dist`` edits of each other -- directly or through a CHAIN of
    near-matches -- collapse into one entity. fuzzy_self_pairs supplies
    the match edges, neardup.connected_components the transitive
    closure (min-id label propagation, its documented lineage
    discipline), and every row gets (entity_id, canonical) where
    entity_id is the cluster's minimum id and canonical is that row's
    string -- a deterministic survivor rule. Singletons are their own
    entity. NULL strings resolve to themselves (they never match
    anything, by the fuzzy-join NULL contract).

    Returns (id_col, str_col, entity_id, canonical). Chain semantics
    are the honest ones for edit distance (A~B and B~C does not imply
    A~C within max_dist) -- callers wanting radius-bounded clusters
    should lower max_dist rather than post-filter."""
    from bigdata_storage_and_proccess_job_data_spark.operators import neardup

    pairs = fuzzy_self_pairs(
        df, id_col, str_col, max_dist=max_dist, q=q,
        max_gram_freq=max_gram_freq,
    )
    comp = neardup.connected_components(
        pairs, "id_a", "id_b", max_iters=max_iters
    ).select(F.col("id").alias(id_col), "component")
    rows = df.select(id_col, str_col).join(comp, id_col, "left")
    with_entity = rows.select(
        id_col,
        str_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("entity_id"),
    )
    canon = df.select(
        F.col(id_col).alias("entity_id"),
        F.col(str_col).alias("canonical"),
    )
    return with_entity.join(canon, "entity_id").select(
        id_col, str_col, "entity_id", "canonical"
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """All unordered within-table pairs with edit distance <= max_dist,
    as (id_a, id_b, dist) with id_a < id_b -- the entity-resolution /
    typo-cluster primitive (feed the pairs to neardup.connected_components
    for canonical-entity groups). Same completeness contract as
    fuzzy_join."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(str_col).alias("_sa"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(str_col).alias("_sb"))
    return fuzzy_join(
        a,
        b,
        "id_a",
        "_sa",
        "id_b",
        "_sb",
        max_dist=max_dist,
        q=q,
        max_gram_freq=max_gram_freq,
    ).filter(F.col("id_a") < F.col("id_b"))
