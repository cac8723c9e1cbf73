"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB corpora:
- signatures are computed per-row with native array expressions (no
  Python), so the scan stays in whole-stage codegen;
- candidate generation is a bucket equi-join on (band, band_hash) --
  never an all-pairs cross join; shuffle keys are fixed-width longs;
- exact verification (Jaccard) runs only on bucket-collision pairs.

Semantic anchor: the reference's exact dropDuplicates (P3,
spark_batch_v2.py:49) generalized to near-dup, per the north-star scope
(SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions import text


def minhash_signature(
    shingles: Column, num_hashes: int = 32, seed: int = 42
) -> Column:
    """MinHash signature as array<bigint>: for each of ``num_hashes``
    seeded hash functions, the min of xxhash64(shingle, seed+i) over the
    shingle set. Empty shingle set -> nulls (callers filter).

    One pass over the shingle array per hash function, all JVM-side.
    """
    def hasher(i: int):
        # closure factory: one-arg lambda (a two-arg lambda would be
        # interpreted by PySpark as (element, index))
        return lambda s: F.xxhash64(s, F.lit(seed + i))

    return F.array(
        *[
            F.array_min(F.transform(shingles, hasher(i)))
            for i in range(num_hashes)
        ]
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Split a minhash signature into ``bands`` bands of ``rows`` values;
    each band becomes (band_index, band_hash) where band_hash =
    xxhash64 over the band's joined values. Returns
    array<struct<band:int, band_hash:bigint>> for explode."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(signature, b * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    content_col: str,
    ngram: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) from banded minhash signatures.

    shingle -> signature -> band explode -> self-equi-join on
    (band, band_hash). The join is on a 12-byte key, so at 100 TB the
    shuffle moves only (key, id) pairs; document bodies never shuffle.
    """
    rows = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(
            text.word_ngrams(content_col, ngram), num_hashes, seed
        ).alias("_sig"),
    ).filter(F.size("_sig") > 0)
    banded = sigs.select(
        "_id", F.explode(lsh_bands(F.col("_sig"), bands, rows)).alias("b")
    ).select("_id", "b.band", "b.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    ngram: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing at least one
    shingle, via an inverted-index self-join (shingle -> ids), keeping
    pairs with jaccard >= threshold.

    Set sizes are precomputed per doc; the join carries only (shingle,
    id, set_size). |A ∩ B| = count of co-occurring distinct shingles;
    |A ∪ B| = |A| + |B| - |A ∩ B|.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(text.word_ngrams(content_col, ngram)).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    sized = toks.withColumn("_n", F.size("_sh"))
    inv = sized.select(
        "_id", "_n", F.explode("_sh").alias("shingle")
    )
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_inter", "jaccard"
    )


def simhash64(hashes: Column, n: Column) -> Column:
    """64-bit SimHash from a precomputed token-hash array (callers hash
    tokens once with xxhash64 in a prior projection so the 64 bit-folds
    below don't recompute the hashes). Per bit j: set the result bit when
    more than half the token hashes have bit j set (equivalent to the
    classic +1/-1 sum > 0). Returns BIGINT."""
    from functools import reduce

    def bit_set(j: int):
        # closure factory: a one-arg lambda, since PySpark treats two-arg
        # higher-order-function lambdas as (element, index)
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    bits = []
    for j in range(64):
        count_set = F.size(F.filter(hashes, bit_set(j)))
        bits.append(
            F.when(
                count_set * 2 > n, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
        )
    return reduce(lambda a, b: a.bitwiseOR(b), bits)


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    content_col: str,
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit simhash into ``bands``
    16-bit chunks (pigeonhole: hamming <= bands-1 guarantees a shared
    band; higher max_hamming trades recall), bucket-join on equal chunks,
    then filter by exact hamming distance via bit_count(xor)."""
    width = 64 // bands
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            text.tokens(F.lower(F.col(content_col))), lambda t: F.xxhash64(t)
        ).alias("_h"),
    ).withColumn("_n", F.size("_h"))
    sims = hashed.select(
        "_id", simhash64(F.col("_h"), F.col("_n")).alias("_sim")
    )
    banded = sims.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "_sim", "b.band", "b.chunk")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sim").alias("sim_a"),
            F.col("b._sim").alias("sim_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
