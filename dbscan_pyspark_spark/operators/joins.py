"""Time-ordered join operators Spark lacks as built-ins: as-of join and
bounded range (interval) join.

The reference has no temporal joins at all (SURVEY.md §2.3 — its only
join shapes are cross+theta, broadcast argmin, and graph joins); these
are part of the north-star extension surface a training-data pipeline
needs over event streams.

Both are phrased so the heavy lifting is ONE hash shuffle on the join
keys — no sort-merge over unbounded ranges, no cross product:

- **as-of**: union the two sides, one window sort per key, carry the
  last-seen right row forward (``last(..., ignorenulls=True)``). This is
  the merge-scan formulation: cost O((|L|+|R|) log) per key partition,
  versus a naive range join's O(|L| x |R|).
- **range**: 1-D form of the grid ε-join (eps_join.py): bucket both
  sides by interval width, explode the *left* side to the two candidate
  buckets, equi-join on (key, bucket), exact predicate after. Candidate
  pairs are bounded by bucket co-residency, not |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: explicit salting for when AQE's
    skew-join splitting can't help (skew concentrated in ONE key value
    whose matching right rows still fit memory, or a build side just
    over the broadcast threshold).

    Left rows get a deterministic salt in ``[0, n_salts)`` (xxhash64 of
    the whole row — no RNG, so the plan is replayable); the right side
    is replicated ``n_salts`` times with every salt value. Joining on
    ``on + [salt]`` spreads each hot key over ``n_salts`` tasks at the
    cost of an ``n_salts``-fold right-side inflation — use when
    ``|right| * n_salts`` is still small relative to the skewed left.
    Result set is identical to ``left.join(right, on, how)`` for
    ``how`` in ('inner', 'left'): every left row matches exactly the
    right replica carrying its own salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports 'inner'/'left', got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(int(n_salts))
    ).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(int(n_salts))]))
    )
    return l.join(r, on + ["_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (backward; forward = smallest ``>=``) within
    the same ``on`` key group — SQL ``ASOF JOIN`` semantics (left outer:
    unmatched left rows keep NULLs).

    ``value_cols`` defaults to every right column not in ``on`` and not
    the timestamp; they come back suffixed. Ties on ``right_ts`` within
    a key are nondeterministic — pre-aggregate the right side to one row
    per (key, ts) if that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]

    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.struct(
            F.col(right_ts).alias(right_ts),
            *[F.col(c) for c in value_cols],
        ).alias("_rrow"),
        F.lit(False).alias("_is_left"),
    )
    rrow_type = r.schema["_rrow"].dataType

    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
        F.lit(True).alias("_is_left"),
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    both = l.unionByName(r.select(*l.columns))

    # Right rows sort before left rows at equal _t (False < True), so an
    # exact-timestamp right row is visible to its left row — the >=/<=
    # inclusive asof semantics.
    order = [F.col("_t"), F.col("_is_left")]
    if direction == "forward":
        order = [F.col("_t").desc(), F.col("_is_left")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in lcols]
    out_cols.append(F.col("_m")[right_ts].alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col("_m")[c].alias(f"{c}{suffix}") for c in value_cols)
    return matched.where(F.col("_is_left")).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = -300.0,
    upper_seconds: float = 0.0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All pairs with equal ``on`` keys and
    ``left_ts + lower <= right_ts < left_ts + upper``.

    Bucketed equi-join (the 1-D grid ε-join): both sides bucket their
    epoch by the window width W = upper - lower; a right timestamp in
    the half-open window spans at most two buckets, so the left side
    explodes into exactly those two candidate buckets. Equi-join on
    (keys..., bucket) then the exact interval predicate. All columns
    come back prefixed.
    """
    # Exact integer microsecond arithmetic throughout — a float epoch
    # would round at the window boundary and diverge from engines that
    # compare interval-shifted timestamps exactly.
    lower_us = int(round(lower_seconds * 1_000_000))
    upper_us = int(round(upper_seconds * 1_000_000))
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    # cast("timestamp") first: no-op for TIMESTAMP, and lifts
    # TIMESTAMP_NTZ (which unix_micros rejects) via the session zone —
    # offset cancels in every interval comparison below.
    le = F.unix_micros(F.col(left_ts).cast("timestamp"))
    re = F.unix_micros(F.col(right_ts).cast("timestamp"))

    def _bucket(x):  # exact floor-div in long arithmetic (no double floor)
        w = F.lit(width)
        return ((x - F.pmod(x, w)) / w).cast("long")

    lo_bucket = _bucket(le + F.lit(lower_us))
    hi_bucket = _bucket(le + F.lit(upper_us))
    l = left.select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        le.alias("_le"),
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))).alias("_bucket"),
    )
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        re.alias("_re"),
        _bucket(re).alias("_bucket"),
    )
    keys = [
        l[f"{left_prefix}{k}"] == r[f"{right_prefix}{k}"] for k in on
    ]
    cond = keys + [
        r["_re"] >= l["_le"] + F.lit(lower_us),
        r["_re"] < l["_le"] + F.lit(upper_us),
        l["_bucket"] == r["_bucket"],
    ]
    joined = l.join(r, cond)
    out = [c for c in joined.columns if c not in ("_le", "_re", "_bucket")]
    return joined.select(*out)
