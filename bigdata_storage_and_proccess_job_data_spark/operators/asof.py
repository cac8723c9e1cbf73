"""As-of (point-in-time) join: for each left row, the most recent right
row with right_ts <= left_ts per key.

Spark has no native ASOF join; the scalable formulation is the
union + last_value(ignorenulls) trick:

  union(left-tagged, right-tagged)
    -> window per key ordered by (ts, right-before-left on ties)
    -> last_value(right_cols, ignorenulls) over rows unbounded..current
    -> keep left rows

ONE shuffle+sort on the key -- never a range cross join (a theta-join
formulation explodes to |L|x|R| per key before filtering, which is
exactly what kills point-in-time joins at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_storage_and_proccess_job_data_spark.functions.eventtime import interval_expr


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join. Right rows are deduplicated to
    one per (key, ts) beforehand by callers if multiple candidates per
    instant need a deterministic winner.

    ``tolerance`` (an SQL INTERVAL literal body, e.g. "15 minutes")
    bounds how STALE the matched right row may be: a match older than
    left_ts - tolerance is nulled out, exactly pandas merge_asof's
    tolerance semantics -- the point-in-time-correctness knob for
    feature lookups where "the last known value" stops being meaningful
    after a while. Implemented as a post-fill predicate on the matched
    row's own timestamp, so the plan shape is unchanged: still ONE
    shuffle+sort, no range join.

    The fill is a SINGLE struct of (right_ts, *value_cols) per right row,
    carried with one last(ignorenulls) pass: every returned value comes
    from the same matched right row as the timestamp the tolerance check
    uses. A matched row whose value column is NULL yields NULL (pandas
    merge_asof semantics) rather than silently reaching back to an older
    row's value -- per-column reach-back would let a value escape the
    tolerance bound its own supplying row violates.

    Returns all left columns + ``<value_col><suffix>`` columns (null when
    no right row precedes the left row, or none within tolerance).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None)
        .cast(
            "struct<rts:"
            + right.schema[right_ts].dataType.simpleString()
            + ","
            + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in value_cols
            )
            + ">"
        )
        .alias("_snap"),
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(
            F.col(right_ts).alias("rts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_snap"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort BEFORE left rows at equal ts => inclusive backward
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("_snap", ignorenulls=True).over(w).alias("_m"),
    )
    if tolerance is None:
        fresh = F.col("_m").isNotNull()
    else:
        fresh = F.col("_m.rts") >= (F.col("_ts") - interval_expr(tolerance))
    return filled.filter(F.col("_is_right") == 0).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(fresh, F.col(f"_m.{c}"))
            .otherwise(F.lit(None))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
    extrapolate: str = "null",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Fill NULL gaps in a per-key time series by linear interpolation
    between the nearest non-null observations: at a gap row,
    prev + (next - prev) * (ts - prev_ts) / (next_ts - prev_ts), time-
    weighted on the actual timestamps (never row positions). The
    sensor-reading / metric-series repair step before rollups.

    Edges (before the first / after the last observation) follow
    ``extrapolate``: 'null' (default) leaves them NULL, 'nearest'
    carries the first/last observation outward. Non-null rows pass
    through untouched.

    Scale shape: ONE shuffle+sort per key drives BOTH direction
    windows (last ignorenulls backward, first ignorenulls forward over
    the same partitioning -- Spark reuses the sorted exchange), the
    asof_join discipline; no joins, no per-gap scans. Rows whose
    key has no observations at all stay NULL."""
    if extrapolate not in ("null", "nearest"):
        raise ValueError("extrapolate must be 'null' or 'nearest'")
    out_col = out_col or value_col + "_filled"
    v, t = F.col(value_col), F.col(ts_col)
    # duplicate timestamps make neighbor choice order-dependent; a
    # tiebreak (e.g. the row id) pins it deterministically
    order = [ts_col, *(tiebreak_cols or [])]
    base = Window.partitionBy(*key_cols).orderBy(*order)
    back = base.rowsBetween(Window.unboundedPreceding, 0)
    fwd = base.rowsBetween(0, Window.unboundedFollowing)
    obs = F.when(v.isNotNull(), F.struct(t.alias("ts"), v.alias("v")))
    prev = F.last(obs, ignorenulls=True).over(back)
    nxt = F.first(obs, ignorenulls=True).over(fwd)
    # timestamps subtract to an interval; cast both spans to double
    # seconds (works for numeric ts too via the double cast below)
    if dict(df.dtypes)[ts_col].startswith("timestamp"):
        span = lambda a, b: (  # noqa: E731
            a.cast("double") - b.cast("double")
        )
    else:
        span = lambda a, b: (a - b).cast("double")  # noqa: E731
    both = F.col("_p").isNotNull() & F.col("_n").isNotNull()
    interp = F.col("_p.v") + (
        (F.col("_n.v") - F.col("_p.v"))
        * span(t, F.col("_p.ts"))
        / span(F.col("_n.ts"), F.col("_p.ts"))
    )
    filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(
            both & (F.col("_n.ts") != F.col("_p.ts")), interp
        )
        .when(both, F.col("_p.v").cast("double"))
    )
    if extrapolate == "nearest":
        filled = filled.when(
            F.col("_p").isNotNull(), F.col("_p.v").cast("double")
        ).when(F.col("_n").isNotNull(), F.col("_n.v").cast("double"))
    return (
        df.withColumn("_p", prev)
        .withColumn("_n", nxt)
        .withColumn(out_col, filled)
        .drop("_p", "_n")
    )
