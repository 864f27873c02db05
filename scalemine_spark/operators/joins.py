"""Custom join strategies Spark lacks natively (SURVEY §2 J3, J9).

Both are compositions of built-in DataFrame ops — no RDDs, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """J3 — skew-salted equi join, semantically identical to
    ``big.join(small, key, how)`` for inner/left joins.

    The big side gets a deterministic per-row salt (hash of all columns is
    overkill; a hash of the key plus a row-local component spreads a hot key
    across ``n_salts`` reducers). The small side is replicated n_salts times
    via ``explode(sequence(...))`` so every (key, salt) bucket finds its
    match. This is the manual analog of AQE skew-join splitting and of
    ScaleMine's cost-based task splitting (SC'16): one oversized unit of work
    becomes n smaller schedulable ones.

    At 10^12-edge scale the salt must NOT depend on the key alone (that would
    keep the hot key in one reducer): we use a uniform pseudo-random draw
    from the row's full tuple via xxhash64(*).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """J9 — as-of join: for each left row, the single most recent right row
    with ``right_ts <= left_ts`` (backward) per `on` key.

    Spark has no native as-of join; this is the window formulation: range
    join + row_number over (key, left row) ordered by right_ts desc. For
    large-large as-of joins, pre-bucketing by time would bound the fan-out;
    at fixture scale the plain conditional join is fine.
    """
    cond = (left[on] == right[on]) & (
        right[right_ts] <= left[left_ts]
        if direction == "backward"
        else right[right_ts] >= left[left_ts]
    )
    lcols = [left[c].alias(c) for c in left.columns]
    rcols = [right[c].alias(f"r_{c}") for c in right.columns if c != on]
    j = left.join(right, cond, "left").select(*lcols, *rcols)
    order = F.col(f"r_{right_ts}").desc_nulls_last() if direction == "backward" else F.col(f"r_{right_ts}").asc_nulls_last()
    w = Window.partitionBy(*[F.col(c) for c in left.columns]).orderBy(order)
    return j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
