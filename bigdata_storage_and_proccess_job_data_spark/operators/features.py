"""Feature engineering with stored fit artifacts: standardization,
quantile binning, winsorization.

The reference stops at ad-hoc derived columns (spark_batch_v2.py's
withColumn chains, cited at functions/enrich.py); production feature
pipelines need the FIT/TRANSFORM split instead -- statistics computed
once on the training snapshot, persisted as a small frame, and applied
identically to any later batch (train/serve skew dies when the serving
path reuses the STORED artifact instead of refitting on its own data).
Every fit here returns a plain DataFrame artifact (write it to the lake
or a versioned table like any other frame); every apply is a broadcast-
sized join plus codegen'd expressions.

Scale shape: fits are ONE hash aggregation (exact interpolated
percentiles where quantiles are involved -- the median_metrics
precedent; swap in approx_percentile at extreme group counts);
artifacts are O(groups x features), not O(rows); applies never
shuffle the data side (broadcast join on the group key, or a one-row
cross join for ungrouped fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GLOBAL_KEY = "_fit_all"


def _with_key(df: DataFrame, keys: list[str] | None):
    """Normalize the grouped/global split: no keys -> a constant key
    column so both paths share one join-shaped implementation."""
    if keys:
        return df, list(keys)
    return df.withColumn(_GLOBAL_KEY, F.lit(1)), [_GLOBAL_KEY]


def standardize_fit(
    df: DataFrame, cols: list[str], keys: list[str] | None = None
) -> DataFrame:
    """Per-group mean/stddev artifact for ``cols``: one row per group,
    columns ``mean_<c>`` / ``std_<c>`` (sample stddev; NULL for
    singleton groups). Persist and feed to standardize_apply."""
    if not cols:
        raise ValueError("cols must be non-empty")
    d, ks = _with_key(df, keys)
    aggs = []
    for c in cols:
        aggs.append(F.avg(F.col(c)).alias(f"mean_{c}"))
        aggs.append(F.stddev_samp(F.col(c)).alias(f"std_{c}"))
    return d.groupBy(*ks).agg(*aggs)


def standardize_apply(
    df: DataFrame,
    fit: DataFrame,
    cols: list[str],
    keys: list[str] | None = None,
    suffix: str = "_z",
) -> DataFrame:
    """Z-score ``cols`` against a stored fit: (x - mean) / std, NULL
    where std is NULL/zero (constant training group) or the row's
    group never appeared in the fit -- unseen groups surface as NULLs,
    never as silently-unscaled values. Original columns retained."""
    d, ks = _with_key(df, keys)
    joined = d.join(F.broadcast(fit), ks, "left")
    out = joined
    for c in cols:
        std = F.col(f"std_{c}")
        out = out.withColumn(
            c + suffix,
            F.when(
                std.isNotNull() & (std != 0),
                (F.col(c) - F.col(f"mean_{c}")) / std,
            ),
        )
    drop = [f"mean_{c}" for c in cols] + [f"std_{c}" for c in cols]
    if keys is None:
        drop.append(_GLOBAL_KEY)
    return out.drop(*drop)


def quantile_bins_fit(
    df: DataFrame,
    col: str,
    n_bins: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Equal-population bin edges per group: an ``edges`` array of the
    n_bins-1 interior quantiles (exact interpolated percentiles) over
    non-null values. The stored discretizer artifact -- the same
    reference-quantile idea psi_bins uses internally, factored into a
    reusable fit."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    d, ks = _with_key(df, keys)
    qs = [i / n_bins for i in range(1, n_bins)]
    return (
        d.filter(F.col(col).isNotNull())
        .groupBy(*ks)
        .agg(
            F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs]))
            .alias("edges")
        )
    )


def quantile_bins_apply(
    df: DataFrame,
    fit: DataFrame,
    col: str,
    keys: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Bin index in [0, n_bins): the count of stored edges at or below
    the value (right-closed bins, the width_bucket convention). NULL
    values and unseen groups yield NULL. One broadcast join + one
    codegen'd array fold per row."""
    out_col = out_col or col + "_bin"
    d, ks = _with_key(df, keys)
    v = F.col(col)
    idx = F.size(F.filter(F.col("edges"), lambda e: v >= e))
    joined = d.join(F.broadcast(fit), ks, "left")
    out = joined.withColumn(
        out_col,
        F.when(v.isNotNull() & F.col("edges").isNotNull(), idx),
    ).drop("edges")
    if keys is None:
        out = out.drop(_GLOBAL_KEY)
    return out


def winsorize(
    df: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    keys: list[str] | None = None,
    suffix: str = "_w",
) -> DataFrame:
    """Clip ``cols`` to their per-group [lower, upper] exact quantiles
    -- the tail-taming step before means/regressions that
    robust_outliers only FLAGS. One fit agg + one broadcast join; NULLs
    pass through; original columns retained."""
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    d, ks = _with_key(df, keys)
    # both cut points from ONE percentile aggregate per column (array
    # of percentages shares the sort buffer; two sibling calls each
    # kept their own)
    fit = d.groupBy(*ks).agg(
        *[
            F.percentile(
                F.col(c), F.array(F.lit(lower), F.lit(upper))
            ).alias(f"_q_{c}")
            for c in cols
        ]
    )
    out = d.join(F.broadcast(fit), ks, "left")
    for c in cols:
        out = out.withColumn(
            c + suffix,
            F.least(
                F.greatest(F.col(c), F.col(f"_q_{c}")[0]),
                F.col(f"_q_{c}")[1],
            ),
        )
    drop = [f"_q_{c}" for c in cols]
    if keys is None:
        drop.append(_GLOBAL_KEY)
    return out.drop(*drop)
