"""Ordered event-funnel analytics over an event stream.

The reference's event surface stops at windowed counts
(spark_streaming_v2.py:223-359); a funnel asks the sequential question
those can't: of the users who did step 1, how many went on to do step 2
AFTER it, then step 3 after that. This is the standard
conversion-analysis primitive (view -> click -> purchase).

Scale shape: one aggregation per step, all keyed by the same user
column -- step i+1 filters to its event type, joins the step-i
timestamps (same key, so the exchange is reusable and AQE plans the
later joins off already-shuffled data), keeps events strictly after the
user's step-i time, and takes the min. Event volume drops monotonically
per step (each stage only carries users still in the funnel), so the
expensive shuffle is the first one; everything later moves a shrinking
(user, ts) pair set, never event payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step, strictly
    ordered: step k counts only at timestamps strictly after the user's
    step k-1 time. Returns (user, t_<step0>, t_<step1>, ...) with nulls
    from the first incomplete step onward (left joins preserve every
    user who completed step 0)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    prev_t = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, prev_t), user_col)
            .filter(F.col(ts_col) > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev_t = f"t_{step}"
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached it in order -- counts are non-increasing by construction.
    Output: (step_index, step, users)."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    counts = times.agg(
        *[
            F.count(f"t_{s}").cast("long").alias(f"_c_{i}")
            for i, s in enumerate(steps)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_index"),
                F.lit(s).alias("step"),
                F.col(f"_c_{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.users"
    )
