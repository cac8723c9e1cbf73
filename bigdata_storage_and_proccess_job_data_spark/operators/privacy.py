"""Privacy-preserving release: differentially-private noisy counts and
k-anonymity auditing.

Why this belongs in a training-data engine: corpus curation handles
sensitive rows (scrub_pii removes identifiers from TEXT), but releasing
AGGREGATES over sensitive data leaks too -- a count of 1 is an
identification. The standard releases are (a) Laplace-noised counts
(epsilon-DP for counting queries, Dwork et al. 2006) and (b) a
k-anonymity audit of the quasi-identifier combinations a release would
expose (Sweeney 2002). Both are single hash aggregates.

Determinism note (the repo's md5-coin discipline, stated honestly):
``dp_noisy_counts`` derives its Laplace noise from the inverse CDF of
an md5 uniform keyed by (group, salt) -- a keyed PRF, so the release
is reproducible and partition-independent, and the DP guarantee holds
against any adversary who does not know the salt (exactly the trust
model of every seeded-PRG DP implementation; a secret salt IS the
noise seed). Re-releasing with the SAME salt is one query, not two --
repeated releases with fresh salts compose their epsilons.

Scale shape: both operators are one groupBy().agg() over the group
keys plus pure expressions -- partial+final hash agg, no second pass,
no driver state; the k-anonymity report adds one tiny re-aggregation
over the already-aggregated group frame.

No reference analogue; extends the cleaning family
(functions/cleaning.py, operators/corpus.py:scrub_pii).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 60)


def _md5_uniform(cols: list[str], salt: str) -> Column:
    """Uniform [0, 1) keyed by the group values + salt (the bootstrap
    coin's shape; validated salt)."""
    from bigdata_storage_and_proccess_job_data_spark.operators.aggregates import (
        _safe_salt,
    )

    parts = ", ".join(f"cast(`{c}` as string)" for c in cols)
    return (
        F.expr(
            "conv(substring(md5(concat_ws(':', "
            f"{parts}, '{_safe_salt(salt)}')), 1, 15), 16, 10)"
        ).cast("double")
        / F.lit(_DENOM)
    )


def dp_noisy_counts(
    df: DataFrame,
    keys: list[str],
    epsilon: float,
    salt: str,
    sensitivity: float = 1.0,
    clamp_negative: bool = True,
) -> DataFrame:
    """epsilon-DP noisy group counts: count + Laplace(sensitivity /
    epsilon) noise via the exact inverse CDF of the keyed uniform --
    noise = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|). Pure expression,
    DuckDB replays it bit-for-bit (the parity test), and the true
    count never appears in the output. ``clamp_negative`` floors the
    release at 0 (post-processing, DP-safe). Groups the input does not
    contain are ABSENT -- for a fixed public domain, union the domain
    frame in first (absence itself leaks otherwise; documented, the
    caller owns the domain).

    Returns keys + (noisy_count: double)."""
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    if sensitivity <= 0:
        raise ValueError("sensitivity must be > 0")
    b = float(sensitivity) / float(epsilon)
    g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    u = _md5_uniform(keys, salt)
    c = u - F.lit(0.5)
    # |c| < 0.5 strictly: the 60-bit uniform cannot hit 0.5 exactly,
    # and ln(1 - 2|c|) >= ln(2^-59) is finite
    noise = (
        F.lit(-b)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )
    released = F.col("_n").cast("double") + noise
    if clamp_negative:
        released = F.greatest(released, F.lit(0.0))
    return g.select(*keys, released.alias("noisy_count"))


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit of a quasi-identifier combination: one row --
    (k, n_groups, n_violating_groups, n_rows, n_rows_at_risk,
    min_group_size, anonymity_k) where anonymity_k is the dataset's
    actual k (its smallest group) and rows_at_risk counts rows in
    groups smaller than ``k``. NULL quasi-values form groups like any
    value (NULL is an identifier too). Two hash aggs: groups, then a
    one-row fold OVER THE GROUP FRAME -- rows never aggregate twice."""
    if k < 2:
        raise ValueError("k must be >= 2")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return g.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("_n") < k, 1)).alias("n_violating_groups"),
        F.sum("_n").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
        ).alias("n_rows_at_risk"),
        F.min("_n").alias("min_group_size"),
        F.min("_n").alias("anonymity_k"),
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    prefix_map: "dict[str, str] | None" = None,
    domain_map: "dict[str, str] | None" = None,
) -> DataFrame:
    """Deterministic column pseudonymization: each named column is
    replaced by a salted md5 token (hex, optionally prefixed per column
    for readability, e.g. ``usr_3fa9...``). Same input + same salt =>
    same token EVERYWHERE -- including across DIFFERENTLY-NAMED FK/PK
    columns (o_custkey vs c_custkey), because the column name is
    deliberately NOT part of the hash (review finding: hashing the
    name silently unlinked every foreign key whose sides are named
    differently). Joins and group-bys therefore keep working across
    tables pseudonymized with the same salt; rotating the salt unlinks
    every release from the previous one (and from the raw values,
    absent the salt). NULLs stay NULL.

    ``domain_map``: column -> domain label for callers who WANT
    distinct token spaces (e.g. user ids vs device ids that share
    values but must not link); both sides of a joinable pair must use
    the same label. This is tokenization, not DP: frequency structure
    survives by design; pair with dp_noisy_counts /
    k_anonymity_report for distributional protection.

    Pure codegen'd expressions (one md5 per cell, zero shuffles, zero
    UDFs), bit-reproducible across engines via the md5 bridge, so the
    whole release replays exactly in DuckDB."""
    from bigdata_storage_and_proccess_job_data_spark.operators.aggregates import (
        _safe_salt,
    )

    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    ssalt = _safe_salt(salt)
    out = {}
    for c in cols:
        pfx = (prefix_map or {}).get(c, "")
        if pfx and not pfx.replace("_", "").isalnum():
            raise ValueError(f"suspicious prefix for {c!r}: {pfx!r}")
        dom = (domain_map or {}).get(c, "")
        if dom and not dom.replace("_", "").isalnum():
            raise ValueError(f"suspicious domain for {c!r}: {dom!r}")
        parts = ([F.lit(dom)] if dom else []) + [
            F.col(c).cast("string"),
            F.lit(ssalt),
        ]
        token = F.concat(F.lit(pfx), F.md5(F.concat_ws(":", *parts)))
        out[c] = F.when(F.col(c).isNotNull(), token)
    return df.withColumns(out)
