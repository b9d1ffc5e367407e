"""Join strategy helpers for scale (SURVEY §4 R4/R15).

AQE's skew-join splitting handles most skew automatically; these helpers
cover the two cases the optimizer can't do for you:
- ``salted_join`` — pre-splitting a pathologically hot key across
  ``n_salts`` shuffle partitions (useful when one key holds >10% of the
  fact table and even AQE's split partitions overwhelm a single reducer
  chain);
- bucketed tables (see ``sources.catalog.save_table(bucket_by=...)``) —
  co-locating both sides of a recurring join so the shuffle happens once
  at write time instead of on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys split across ``n_salts``
    sub-keys and the small side replicated to every salt.

    The salt must vary PER ROW of the large side (not per key — a
    key-derived salt would send every row of the hot key to the same
    reducer, making the operator a no-op). It derives deterministically
    from a hash over ALL large-side columns, so retries re-hash to the
    same salt and results are exactly those of
    ``large.join(small, on, how)`` — only the shuffle distribution
    changes. Cost: small side x n_salts.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    large_s = large.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = large_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key: str, salt_threshold: float = 4.0) -> DataFrame:
    """One-row skew profile of a join key: (join_key, n_keys,
    total_rows, max_rows, p50_rows, p99_rows, skew_ratio,
    salt_recommended) — skew_ratio = hottest key's rows over the mean,
    flagged when it exceeds ``salt_threshold``. This is the per-key
    core of the ``join_key_skew_profile`` declared query, exposed as an
    operator so pipelines can run the pre-flight and ROUTE on it
    (:func:`skew_aware_join`).

    Scale: one count-aggregate (map-side partial combine shrinks the
    shuffle to |distinct keys|) + a bounded profile aggregate; swap the
    exact percentiles for ``percentile_approx`` at extreme key
    cardinality.
    """
    per = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    raw = F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1)))
    return per.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_rows"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_rows"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_rows"),
        raw.alias("raw_skew"),
    ).select(
        F.lit(key).alias("join_key"),
        "n_keys",
        "total_rows",
        "max_rows",
        "p50_rows",
        "p99_rows",
        F.round("raw_skew", 4).alias("skew_ratio"),
        F.when(F.col("raw_skew") > salt_threshold, 1)
        .otherwise(0)
        .alias("salt_recommended"),
    )


def skew_aware_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_threshold: float = 4.0,
    profile=None,
) -> DataFrame:
    """The closed pre-flight loop: profile the large side's join key
    (:func:`key_skew_profile`), then route — ``salt_recommended`` sends
    the join through :func:`salted_join`, otherwise it plans as a plain
    equi-join and AQE handles moderate skew. ``profile`` accepts an
    already-collected profile Row (pipelines that materialize the
    pre-flight once and reuse it across joins on the same key) to skip
    re-profiling.

    By :func:`salted_join`'s contract the routing changes only the
    shuffle distribution, never the result — pinned by
    tests/test_join_strategies.py, which routes a profiled hot key and
    asserts plan shape + equivalence.

    Scale: the profile pass is one aggregate over the fact table —
    worth one extra scan exactly when the join is big enough for a
    straggler to dominate; recurring pipelines cache the profile row.
    """
    row = profile if profile is not None else key_skew_profile(
        large, on, salt_threshold
    ).collect()[0]
    if row["salt_recommended"]:
        return salted_join(large, small, on, n_salts, how)
    return large.join(small, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    suffix: str = "_r",
    how: str = "left",
) -> DataFrame:
    """As-of (temporal) join: for each left row, the LATEST right row with
    ``right_ts <= left_ts`` in the same ``on`` group — the operator behind
    point-in-time feature lookups and last-touch attribution, which Spark
    has no built-in for (an inequality join would plan as a nested loop).

    Physical strategy (the scale-correct one): tag both sides, UNION,
    one window pass per ``on`` group ordered by (ts, side) carrying the
    last non-null right attributes forward, keep left rows. ONE shuffle
    on ``on`` — work is O(n log n) within each group, never O(n_l x n_r).
    At equal timestamps the right row sorts first, so the match is
    inclusive (mirrors DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

    Requirement: the right side must be unique per (on, right_ts) —
    pre-aggregate duplicates or the carried attributes are order-defined.
    ``how="inner"`` drops left rows with no prior right row.

    Columns out: all left columns + each non-key right column as
    ``<name><suffix>``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in rcols
        ],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *keys,
        *[F.col(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}{suffix}").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    return out


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join WITHOUT a nested-loop/cartesian plan: both
    sides key by fixed-width time chunks, equi-join on the chunk id, then
    refine with the exact BETWEEN predicate.

    Spark plans a raw ``p.ts BETWEEN i.start AND i.end`` join as
    BroadcastNestedLoopJoin — O(|points| x |intervals|) compares and a
    driver-sized broadcast. Chunking shuffles both sides on a bounded
    integer key instead: each interval replicates into
    ``len/chunk + 1`` chunk rows, each point into exactly one, and only
    same-chunk pairs are ever compared. Pick ``chunk_seconds`` near the
    median interval length (too small => interval fanout; too large =>
    chunk skew). Output: one row per (point, covering interval).
    """
    us = F.lit(int(chunk_seconds) * 1_000_000)
    p = points.withColumn("_chunk", F.floor(F.unix_micros(F.col(point_ts)) / us))
    i = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / us),
                F.floor(F.unix_micros(F.col(end_ts)) / us),
            )
        ),
    )
    return (
        p.join(i, "_chunk")
        .filter(F.col(point_ts).between(F.col(start_ts), F.col(end_ts)))
        .drop("_chunk")
    )
