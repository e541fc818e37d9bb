"""Gap-based sessionization of the events stream (classic stateful
relational op; the batch twin of what Structured Streaming would run with
``applyInPandasWithState`` — here expressed purely with window functions,
so it is codegen-able AND oracle-checkable).

    new_session = (ts - lag(ts) over (user order by ts)) > gap
    session_seq = cumulative sum of new_session per user
    → one row per (user, session): start, end, n_events, value cents

Scale notes: both windows shuffle once on user_id (well distributed);
the final groupBy reuses the same partitioning (no extra exchange under
AQE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Output: (user_id, session_id, start_ts string, n_events, cents).

    ``session_id = floor(min(epoch))`` — a CONTENT-STABLE identity (the
    whole-second epoch of the session's first event) instead of the round-2
    per-user ordinal: an ordinal forces any stateful twin to remember how
    many sessions a user ever had, so streaming state could never be
    dropped (round-2 review item 2).  Sessions of one user are >gap apart,
    so first-event epochs are unique per user.  Timestamps surface as
    tz-free formatted strings; money as exact cents (floor(x*100+0.5)) —
    float-free for the oracle compare."""
    w = Window.partitionBy(user).orderBy(F.col(ts).asc(), F.col("event_id").asc())
    # Fractional-seconds epoch (timestamp → double), exactly mirroring the
    # oracle's epoch(ts): gap math must see sub-second parts identically on
    # both sides (unix_timestamp truncates to whole seconds and can move a
    # boundary event across the gap threshold).
    epoch = F.col(ts).cast("timestamp").cast("double")
    gapped = events.withColumn(
        "__new",
        F.when(
            (epoch - F.lag(epoch).over(w)) > gap_seconds, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    # first event of each user: lag is null → coalesce to new session
    gapped = gapped.withColumn(
        "__new", F.when(F.lag(epoch).over(w).isNull(), 1).otherwise(F.col("__new"))
    )
    sess = gapped.withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("bigint")
    return (
        sess.groupBy(user, "session_seq")
        .agg(
            F.floor(F.min(epoch)).cast("bigint").alias("session_id"),
            F.date_format(F.min(ts), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("cents"),
        )
        .select(user, "session_id", "start_ts", "n_events", "cents")
    )


def sessionize_sql(gap_seconds: int = 1800) -> str:
    """DuckDB mirror (same window semantics)."""
    return f"""WITH e AS (
  SELECT user_id, event_id, ts, value, epoch(ts) AS ep FROM events
),
g AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL THEN 1
                 WHEN ep - lag(ep) OVER w > {gap_seconds} THEN 1 ELSE 0 END AS newf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT *, sum(newf) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM g
)
SELECT user_id, CAST(floor(min(ep)) AS BIGINT) AS session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM s GROUP BY user_id, session_seq"""
