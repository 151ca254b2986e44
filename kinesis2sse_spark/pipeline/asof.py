"""As-of lookup and replay — operator Q2/Q3/Q4 of the reference.

Reference semantics (timestamp2offset.go:58-80, service.go:253-282):
``NearestOffset(since)`` returns the offset of the smallest B-tree key
``(ts, offset) >= (since, 0)``; if none exists, the largest key
``< (since, 0)`` (the latest earlier event); if the log is empty, no
offset. Delivery then proceeds in OFFSET order from that offset — under
event-time disorder this is deliberately approximate (SURVEY.md §1.3):
a lower-offset record with ts >= since can be skipped. We reproduce
exactly that, including the disorder vectors of
timestamp2offset_test.go:10-92.

Spark-first design: no index structure is materialized. The lookup is a
single-pass conditional aggregation (two FILTERed aggregates in one
scan), and the replay joins the one-row resolved offset back via a
broadcast — at cluster scale this is one scan + one broadcast, no
shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nearest_offset(
    df: DataFrame,
    since: Column | str,
    ts_col: str = "ts",
    offset_col: str = "event_id",
) -> DataFrame:
    """One-row DataFrame with column ``off`` = resolved start offset
    (null when the log is empty).

    min_by over struct(ts, offset) is the lexicographic B-tree seek of
    timestamp2offset.go:60-68; max_by over the same struct is the
    "latest earlier event" fallback of timestamp2offset.go:70-76.
    """
    since_col = F.lit(since).cast("timestamp") if isinstance(since, str) else since
    return (
        df.select(
            F.col(ts_col).alias("__ts"),
            F.col(offset_col).alias("__off"),
            since_col.alias("__since"),
        )
        .agg(
            F.expr(
                "min_by(__off, struct(__ts, __off)) FILTER (WHERE __ts >= __since)"
            ).alias("cand"),
            F.expr(
                "max_by(__off, struct(__ts, __off)) FILTER (WHERE __ts < __since)"
            ).alias("fb"),
        )
        .select(F.coalesce("cand", "fb").alias("off"))
    )


def replay_since(
    df: DataFrame,
    since: Column | str,
    ts_col: str = "ts",
    offset_col: str = "event_id",
) -> DataFrame:
    """Replay in offset order from the as-of resolved offset (Q4,
    service.go:267-282). Returns all retained records with
    ``offset >= nearest_offset(since)``, offset-ordered.
    """
    resolved = nearest_offset(df, since, ts_col=ts_col, offset_col=offset_col)
    return (
        df.join(F.broadcast(resolved), F.col(offset_col) >= F.col("off"), "inner")
        .drop("off")
        .orderBy(offset_col)
    )


def tail_offset(df: DataFrame, offset_col: str = "event_id") -> DataFrame:
    """Q3 (service.go:253-258): with no ``since``, the cursor starts at the
    latest retained offset (inclusive), floor 0."""
    return df.agg(F.greatest(F.max(offset_col), F.lit(0)).alias("off"))
