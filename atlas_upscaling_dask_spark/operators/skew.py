"""Skew-aware join: key salting for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime; explicit salting
remains the tool when one side must be *replicated* — e.g. a fact table
where 1% of keys carry 50% of rows joined to a dimension too large to
broadcast.  The hot side spreads each key over ``salt`` sub-keys; the
other side is replicated ``salt``× per key.  Join cardinality is
unchanged; the shuffle's largest partition shrinks by ~``salt``×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_on: str,
    other_on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted across ``salt`` sub-keys.

    ``skewed`` rows get a deterministic pseudo-random salt from their
    own content hash (stable across retries — no ``rand()``, which
    breaks task re-execution determinism); ``other`` rows are exploded
    ``salt``× so every (key, salt) bucket finds its match.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter", "cross"):
        # right/full outer would emit each unmatched `other` row once per
        # salt replica — cardinality would NOT be preserved
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(salt)).cast("int")
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = s.join(
        o,
        (s["__salt"] == o["__salt"]) & (s[skewed_on] == o[other_on]),
        how,
    )
    return joined.drop(s["__salt"]).drop(o["__salt"])
