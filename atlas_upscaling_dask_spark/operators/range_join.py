"""Bucketized interval (range) join — no native Spark equivalent.

``points ⋈ intervals ON start <= t < end`` with NO equi-key is a
BroadcastNestedLoopJoin in vanilla Spark — quadratic and
broadcast-bound.  The standard scalable rewrite (called out in public
Spark performance guides) is **bucketization**: quantize time into
fixed-width buckets, explode each interval to every bucket it overlaps,
equi-join points to intervals on the bucket id, then apply the exact
range predicate.  One shuffle on the bucket key; work is proportional
to true matches plus bucket-boundary slack, and AQE balances hot
buckets.

Times are numeric (epoch micros or any monotone unit) — callers convert
timestamps first, keeping the operator type-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval containing it (start ≤ t < end).

    ``bucket_width`` should be of the order of typical interval length:
    each interval then explodes to O(1) buckets while a point probes
    exactly one.  A point-interval pair can meet in only the point's own
    bucket, so no post-join dedup is needed.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_time) / bucket_width).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width).cast("long"),
                # end is exclusive: a zero-length slack at an exact bucket
                # boundary still lands in the right bucket via the filter
                F.floor((F.col(end) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    # the range predicate is part of the JOIN CONDITION, not a post-join
    # filter — a filter would silently drop the null-padded rows of any
    # outer join, collapsing how='left' back to inner
    cond = (
        (p["__bucket"] == i["__bucket"])
        & (p[point_time] >= i[start])
        & (p[point_time] < i[end])
    )
    return p.join(i, cond, how).drop(p["__bucket"]).drop(i["__bucket"])
