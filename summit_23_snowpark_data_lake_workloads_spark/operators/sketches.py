"""Mergeable cardinality sketches for 100 TB distinct counting.

``COUNT(DISTINCT x)`` at scale shuffles every distinct value; a
sketch shuffles a CONSTANT k longs per group regardless of
cardinality, and — the operational point — sketches computed per
partition/day/shard MERGE without rescanning the data (element-wise
min), so a rolling "distinct users last 30 days" is 30 tiny merges,
not a 30-day rescan.

The sketch is the k-mins estimator (Flajolet–Martin / Cohen's
MinCount family — the structure HyperLogLog refines): k independent
hashes of each value, the per-group MIN of each. For n distinct
values hashed uniformly into [0, H), each min is ~H/(n+1), so
``n̂ = k*H / Σ mins − 1`` with relative standard error ~1/sqrt(k).
Why this shape:

- ONE wide min-aggregate — Spark computes it with full map-side
  partial aggregation (each partition sends k longs per group up the
  tree, never the values), the plan shape the MinHash signature
  aggregate (operators/dedup.py) was measured to win with at 500k
  docs;
- merge = element-wise ``least`` — associative/commutative/
  IDEMPOTENT, so re-processed shards merge harmlessly (at-least-once
  pipelines don't inflate the estimate, unlike naive partial counts);
- integer-deterministic: the DuckDB oracle replays every min and the
  estimate exactly.

Hashing: the i-th hash is ``md5(i ':' value)`` truncated to 60 bits
(H = 16^15) — UNIFORM over [0, H), which the estimator requires.
(MinHash's cheap affine remix of one md5 is NOT usable here: its
output range varies with the multiplier ``2i+3``, fine for ordering,
fatally non-uniform for cardinality — measured 6 orders of magnitude
off.) Cost is k md5s per row; at a production deployment swap in any
64-bit hash both your engines share (xxhash64 exists in Spark but not
DuckDB, hence md5 here — the cross-engine-replayability seam).

Sums of k 60-bit mins overflow a signed 64-bit long — both engines
sum as DECIMAL(38,0)/HUGEINT and divide with INTEGER division (the
cross-engine decimal-exact rule, tests/oracle_utils.py; float-path
division would flake at rounding boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash range: 15 hex chars = 60 bits
MINCOUNT_H = 16**15


def _seed_hash(value_col: str, i: int):
    """The i-th 60-bit hash — uniform over [0, H), identical in DuckDB
    as ``('0x' || substr(md5(i ':' value), 1, 15))::BIGINT``.

    NULL-propagating on purpose: ``F.concat`` (unlike ``concat_ws``,
    which SKIPS null args) yields NULL for a NULL value, so the hash is
    NULL and drops out of ``min`` — matching both COUNT(DISTINCT)'s
    NULL semantics and the oracle's ``md5('i:' || NULL) = NULL``. With
    ``concat_ws`` a NULL row would hash as ``md5('i')`` and inflate the
    estimate on the Spark side only."""
    salted = F.concat(F.lit(f"{i}:"), F.col(value_col))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def mincount_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group k-mins sketch: ``group_cols + [s0..s{k-1}]``.

    One wide aggregate — k min states per group flow through Spark's
    partial aggregation; the shuffle carries k longs per group, never
    the values. NULL values hash to NULL and drop out of min (SQL
    aggregate semantics), matching COUNT(DISTINCT)'s NULL handling;
    a group whose every value is NULL yields all-NULL mins, estimated
    as 0 downstream."""
    return df.groupBy(*group_cols).agg(
        *[F.min(_seed_hash(value_col, i)).alias(f"s{i}") for i in range(k)]
    )


def mincount_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Merge two sketch tables: full-outer join on the group, then
    element-wise ``least`` (NULL-tolerant — a group absent from one
    side keeps the other's mins). Associative + idempotent, so
    shard/day/partition sketches combine in any order and re-merging
    a shard is harmless."""
    bb = b.select(
        *[F.col(c).alias(f"_b_{c}") for c in group_cols],
        *[F.col(f"s{i}").alias(f"_b_s{i}") for i in range(k)],
    )
    cond = None
    for c in group_cols:
        eq = a[c].eqNullSafe(bb[f"_b_{c}"])
        cond = eq if cond is None else cond & eq
    return a.join(bb, cond, "full_outer").select(
        *[F.coalesce(a[c], bb[f"_b_{c}"]).alias(c) for c in group_cols],
        *[
            F.coalesce(
                F.least(F.col(f"s{i}"), F.col(f"_b_s{i}")),
                F.col(f"s{i}"),
                F.col(f"_b_s{i}"),
            ).alias(f"s{i}")
            for i in range(k)
        ],
    )


def mincount_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Estimate distinct counts from a sketch:
    ``group_cols + [est_distinct]``.

    ``n̂ = (k*H − Σ mins) div Σ mins`` — algebraically
    ``floor(k*H/Σ − 1)`` — in pure integer arithmetic on BOTH engines
    (DECIMAL(38,0) ``div`` here, HUGEINT ``//`` in the oracle).
    All-NULL sketches estimate 0; ``Σ = 0`` (possible only when every
    seed's min is 0) saturates to 0 rather than dividing by zero."""
    total = None
    for i in range(k):
        t = F.coalesce(F.col(f"s{i}").cast("decimal(38,0)"), F.lit(0))
        total = t if total is None else total + t
    kh = k * MINCOUNT_H  # python int: exact, fits decimal(38,0)
    with_tot = sketch.withColumn("_tot", total)
    est = F.when(F.col("_tot") <= 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            f"CAST((CAST('{kh}' AS DECIMAL(38,0)) - _tot) div _tot AS BIGINT)"
        )
    )
    return with_tot.select(*group_cols, est.alias("est_distinct"))


def mincount_oracle_sql(
    source_sql: str, group_cols: list[str], value_expr: str, k: int = 32
) -> str:
    """DuckDB CTE replaying sketch + estimate over ``source_sql``
    (any relation exposing ``group_cols`` and ``value_expr``) — the
    differential the gate runs. Mirrors :func:`mincount_sketch` +
    :func:`mincount_estimate` exactly."""
    g = ", ".join(group_cols)
    mins = ", ".join(
        f"min(('0x' || substr(md5('{i}:' || ({value_expr})), 1, 15))::BIGINT)"
        f" AS s{i}"
        for i in range(k)
    )
    tot = " + ".join(f"coalesce(s{i}::HUGEINT, 0)" for i in range(k))
    return f"""
    WITH src AS ({source_sql}),
    sk AS (SELECT {g}, {mins} FROM src GROUP BY {g}),
    tt AS (SELECT {g}, ({tot}) AS tot FROM sk)
    SELECT {g},
           CASE WHEN tot <= 0 THEN 0
                ELSE (({k}::HUGEINT * {MINCOUNT_H}::HUGEINT - tot)
                      // tot)::BIGINT
           END AS est_distinct
    FROM tt
    """


# ---------------------------------------------------------------------------
# Bottom-k (KMV) row-sample sketch -> mergeable quantiles
# ---------------------------------------------------------------------------
#
# The quantile twin of the k-mins cardinality sketch above: per group,
# keep the k rows whose 60-bit hash of a UNIQUE row key is smallest.
# A uniform hash over a unique key makes the retained set a uniform
# random-but-DETERMINISTIC sample of the group's rows, so the type-1
# sample quantile estimates the population quantile with the usual
# O(1/sqrt(k)) error — and the sketch MERGES: bottom-k of a union is
# the bottom-k of the concatenated bottom-ks (dedup + re-rank), so
# per-day/shard/partition sketches roll up without rescanning data.
#
# Scale shape: a naive per-group bottom-k is a per-group SORT of all
# rows. Instead we pre-filter with a deterministic hash threshold
# tau = H * 4k / cnt (integer arithmetic; inert when cnt <= 4k): the
# expected survivor count is 4k, so the window sort ranks ~4k rows per
# group instead of all of them, while P(a true bottom-k row is lost)
# <= exp(-Theta(k)) (Chernoff: losing one requires < k survivors at
# expectation 4k). Both engines replay the SAME tau, so the
# differential is exact even in the astronomically unlikely clip case.

#: oversample factor for the threshold pre-filter
BOTTOMK_OVERSAMPLE = 4


def _row_hash(key_col: str):
    """60-bit uniform row hash — ``('0x' || substr(md5('q:' || key),
    1, 15))::BIGINT`` in DuckDB.

    NULL-propagating (``F.concat``, not ``concat_ws``): a NULL key
    hashes to NULL, fails the ``_h <= tau`` pre-filter, and is excluded
    from the sample on BOTH engines (the oracle's ``'q:' || NULL`` is
    NULL and the comparison drops the row) — enforcing the "key_col
    must be unique per row" contract symmetrically instead of letting a
    NULL key slip into the Spark-side sample as ``md5('q')``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("q:"), F.col(key_col))), 1, 15),
        16,
        10,
    ).cast("bigint")


def bottomk_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k sample: ``group_cols + [_h, _v]`` (k rows per
    group). ``key_col`` must be unique per row (the sample is "rows",
    not "distinct values"); NULL values are excluded (quantiles are
    over non-null values, matching SQL aggregate semantics)."""
    from pyspark.sql import Window

    cap = BOTTOMK_OVERSAMPLE * k
    cnt = df.groupBy(*group_cols).agg(F.count(value_col).alias("_c"))
    h = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        _row_hash(key_col).alias("_h"),
        F.col(value_col).alias("_v"),
    )
    ht = MINCOUNT_H * cap  # python int, exact
    tau = F.when(
        F.col("_c") > cap,
        F.expr(f"CAST(CAST('{ht}' AS DECIMAL(38,0)) div _c AS BIGINT)"),
    ).otherwise(F.lit(MINCOUNT_H))
    filt = h.join(cnt, group_cols).where(F.col("_h") <= tau)
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    return (
        filt.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*group_cols, "_h", "_v")
    )


def bottomk_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge two sketch tables: union, dedup identical retained rows
    (idempotent under shard re-processing), re-rank, keep k."""
    from pyspark.sql import Window

    u = a.unionByName(b).dropDuplicates([*group_cols, "_h", "_v"])
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*group_cols, "_h", "_v")
    )


def bottomk_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[str, int, int]] = (("p50", 1, 2), ("p90", 9, 10)),
) -> DataFrame:
    """Type-1 sample quantiles from a sketch:
    ``group_cols + [q, est_value]`` — one row per (group, quantile).

    Ranks are PURE INTEGER: for quantile num/den over a sample of m
    rows, rank = max(1, ceil(num*m/den)) = (num*m + den - 1) div den —
    no float multiply, so Spark and DuckDB agree bit-for-bit (a float
    ``ceil(0.9 * m)`` would straddle representation error at exact
    multiples)."""
    from pyspark.sql import Window

    m = sketch.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_m"))
    w = Window.partitionBy(*group_cols).orderBy("_v", "_h")
    vr = sketch.withColumn("_vrn", F.row_number().over(w)).join(m, group_cols)
    qrows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(label).alias("q"),
                    F.lit(num).cast("bigint").alias("_qn"),
                    F.lit(den).cast("bigint").alias("_qd"),
                )
                for label, num, den in quantiles
            ]
        )
    ).alias("_q")
    return (
        vr.select(*group_cols, "_vrn", "_m", "_v", qrows)
        .select(*group_cols, "_vrn", "_m", "_v", "_q.q", "_q._qn", "_q._qd")
        .where(
            F.col("_vrn")
            == F.greatest(
                F.lit(1).cast("bigint"),
                F.expr("(_qn * _m + _qd - 1) div _qd"),
            )
        )
        .select(*group_cols, "q", F.col("_v").alias("est_value"))
    )


def bottomk_oracle_sql(
    source_sql: str,
    group_cols: list[str],
    key_expr: str,
    value_expr: str,
    k: int = 64,
    quantiles: list[tuple[str, int, int]] = (("p50", 1, 2), ("p90", 9, 10)),
) -> str:
    """DuckDB replay of sketch build + quantile extraction over
    ``source_sql`` (exposing ``group_cols``, ``key_expr``,
    ``value_expr``) — mirrors tau, ranking, and the integer rank
    formula exactly."""
    g = ", ".join(group_cols)
    cap = BOTTOMK_OVERSAMPLE * k
    ht = MINCOUNT_H * cap
    qsel = " UNION ALL ".join(
        f"SELECT '{label}' AS q, {num}::BIGINT AS qn, {den}::BIGINT AS qd"
        for label, num, den in quantiles
    )
    return f"""
    WITH src AS ({source_sql}),
    cnt AS (SELECT {g}, count({value_expr}) AS c FROM src GROUP BY {g}),
    h AS (
        SELECT {g}, ('0x' || substr(md5('q:' || ({key_expr})), 1, 15))::BIGINT AS hh,
               {value_expr} AS v
        FROM src WHERE {value_expr} IS NOT NULL
    ),
    filt AS (
        SELECT h.* FROM h JOIN cnt USING ({g})
        WHERE hh <= CASE WHEN c > {cap}
                    THEN ({ht}::HUGEINT // c::HUGEINT)::BIGINT
                    ELSE {MINCOUNT_H} END
    ),
    sk AS (
        SELECT * FROM (
            SELECT {g}, hh, v,
                   row_number() OVER (PARTITION BY {g} ORDER BY hh, v) AS rn
            FROM filt) WHERE rn <= {k}
    ),
    m AS (SELECT {g}, count(*) AS m FROM sk GROUP BY {g}),
    vr AS (
        SELECT {g}, hh, v,
               row_number() OVER (PARTITION BY {g} ORDER BY v, hh) AS vrn
        FROM sk
    ),
    qq AS ({qsel})
    SELECT {g}, qq.q, vr.v AS est_value
    FROM vr JOIN m USING ({g}) CROSS JOIN qq
    WHERE vr.vrn = greatest(1, (qq.qn * m.m + qq.qd - 1) // qq.qd)
    """


# ---------------------------------------------------------------------------
# Count-Min frequency sketch -> mergeable approximate counts
# ---------------------------------------------------------------------------
#
# The FREQUENCY member of the mergeable-sketch tier (k-mins answers
# COUNT(DISTINCT), bottom-k answers quantiles, this answers "how often
# does key X occur" when the key space is too large to GROUP BY): a
# d x w counter grid where row i adds each occurrence at column
# hash_i(key) % w; a point estimate is the MIN over the d rows' cells
# (Cormode & Muthukrishnan 2005). Guarantees: estimate >= true count
# always (one-sided), and <= true + (total/w) with probability
# 1 - (1/2)^d under pairwise-independent hashes.
#
# Why this shape at 100 TB:
# - the BUILD is one groupBy over (row, cell) — d small ints per input
#   row, full map-side combine, and the sketch's size (d*w counters) is
#   CONSTANT regardless of key cardinality;
# - MERGE = cell-wise + (associative/commutative), so per-day/shard
#   sketches roll up without rescanning — but NOT idempotent (counts
#   are additive): re-processing a shard double-counts, so CM sketches
#   belong BEHIND an exactly-once boundary (the lakehouse txn stamps),
#   unlike the k-mins/bottom-k sketches which shrug off at-least-once.
#   Documented, not hidden.
# - integer-exact and hash-replayable (same md5 scheme as the rest of
#   the module), so the DuckDB oracle rebuilds the grid bit-for-bit.


def cm_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Per-group Count-Min grid: ``group_cols + [row, cell, cnt]`` —
    only NON-ZERO cells are materialized (the grid is logically dense;
    merge/estimate treat missing cells as 0). NULL keys are excluded
    (a NULL contributes to no frequency class, matching COUNT(col))."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(d)])
    ).alias("row")
    keyed = df.where(F.col(key_col).isNotNull()).select(
        *group_cols, F.col(key_col).cast("string").alias("_k"), rows
    )
    cell = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("c"), F.col("row"), F.lit(":"), F.col("_k"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(w),
    )
    return (
        keyed.withColumn("cell", cell)
        .groupBy(*group_cols, "row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two CM sketches: cell-wise sum. Associative and
    commutative; NOT idempotent — counts are additive, so feed it
    exactly-once inputs (lakehouse txn boundaries), never at-least-once
    redeliveries."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Point estimates for ``probes`` (one row per (group, key)):
    ``group_cols + [key_col, est_count]`` = MIN over the d rows of the
    probed cells (missing cell -> 0; the estimate never undercounts).
    The probe side re-derives cells with the same hash, joins the
    sketch on (group, row, cell) — probe-sized work against a
    constant-size sketch, never a corpus scan."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row")
    pk = probes.select(
        *group_cols, F.col(key_col).cast("string").alias("_k"), rows
    )
    cell = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("c"), F.col("row"), F.lit(":"), F.col("_k"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(w),
    )
    probed = pk.withColumn("cell", cell).join(
        sketch, [*group_cols, "row", "cell"], "left"
    )
    return (
        probed.groupBy(*group_cols, "_k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(*group_cols, F.col("_k").alias(key_col), "est_count")
    )


def cm_oracle_sql(
    source_sql: str,
    probes_sql: str,
    group_cols: list[str],
    key_expr: str,
    d: int = 4,
    w: int = 64,
) -> str:
    """DuckDB replay of build + point estimates: ``source_sql`` exposes
    ``group_cols`` + ``key_expr`` (one row per occurrence),
    ``probes_sql`` exposes ``group_cols`` + the probe keys under the
    same expression name."""
    g = ", ".join(group_cols)
    rows = ", ".join(str(i) for i in range(d))
    return f"""
    WITH src AS ({source_sql}),
    pr AS ({probes_sql}),
    grid AS (
        SELECT {g}, r.row,
               ('0x' || substr(md5('c' || r.row || ':' || ({key_expr})), 1, 15))::BIGINT
                   % {w} AS cell,
               count(*) AS cnt
        FROM src CROSS JOIN (SELECT unnest([{rows}]) AS row) r
        WHERE ({key_expr}) IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    probe AS (
        SELECT {g}, ({key_expr})::VARCHAR AS k, r.row,
               ('0x' || substr(md5('c' || r.row || ':' || ({key_expr})), 1, 15))::BIGINT
                   % {w} AS cell
        FROM pr CROSS JOIN (SELECT unnest([{rows}]) AS row) r
    )
    SELECT p.{g.replace(', ', ', p.')}, p.k, min(coalesce(grid.cnt, 0))::BIGINT AS est_count
    FROM probe p LEFT JOIN grid
      ON {' AND '.join(f'grid.{c} = p.{c}' for c in group_cols)}
     AND grid.row = p.row AND grid.cell = p.cell
    GROUP BY p.{g.replace(', ', ', p.')}, p.k
    """
