"""Declarative data-quality constraint suites (the Deequ pattern).

A 100 TB ingest without automated validation ships silent corruption:
a null-ed join key, a duplicated primary key after a bad backfill, an
enum value from a new upstream release. This module compiles a
constraint suite into the MINIMUM number of passes Spark needs:

- every row-local constraint (completeness, range, set membership,
  regex, uniqueness) over one table folds into ONE wide aggregate —
  a single scan with full map-side partial aggregation, shuffling one
  row of counters total, regardless of table size;
- each referential-integrity constraint adds one join against its
  reference table — broadcast when the reference is dimension-sized,
  shuffle hash otherwise (Catalyst/AQE picks; we only declare it).

The report is one row per constraint:
``(check_name, target, metric, threshold, passed)`` where ``metric``
is a compliance ratio in [0, 1]. Determinism: every numerator and
denominator is an exact integer count; the ratio is one IEEE double
division of two exact integers followed by ``round(x, 6)``, which is
bit-identical across engines (no float summation anywhere) — so the
DuckDB oracle replays the whole report exactly.

Constraint semantics (documented because they differ subtly):
- ``not_null``: metric = non-null rows / all rows.
- ``unique``: metric = distinct non-null values / non-null rows
  (1.0 means a valid key; NULLs are completeness's job, not
  uniqueness's).
- ``in_range`` / ``in_set`` / ``matches``: metric = compliant
  non-null values / non-null values (NULL is neither compliant nor
  violating — pair with ``not_null`` to police presence).
- ``foreign_key``: metric = non-null values with a referenced row /
  non-null values (orphan ratio's complement).

A constraint ``passed`` iff ``num >= threshold * den`` on the EXACT
integer counters (default threshold 1.0 — exact compliance), never on
the rounded ratio: round-to-6dp would otherwise mask one violation in
ten million rows as a "pass". An empty table yields metric 1.0 and
``passed`` for every constraint (vacuously compliant), matching Deequ.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative check. ``kind`` drives compilation; ``params``
    are kind-specific (lo/hi, values, pattern, ref table/column)."""

    kind: str
    column: str
    threshold: float = 1.0
    params: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column}"


def not_null(column: str, threshold: float = 1.0) -> Constraint:
    return Constraint("not_null", column, threshold)


def unique(column: str, threshold: float = 1.0) -> Constraint:
    return Constraint("unique", column, threshold)


def in_range(column: str, lo, hi, threshold: float = 1.0) -> Constraint:
    return Constraint("in_range", column, threshold, {"lo": lo, "hi": hi})


def in_set(column: str, values: list, threshold: float = 1.0) -> Constraint:
    return Constraint("in_set", column, threshold, {"values": list(values)})


def matches(column: str, pattern: str, threshold: float = 1.0) -> Constraint:
    """``pattern`` is an RE2-ish regex accepted by BOTH Spark's
    ``rlike`` and DuckDB's ``regexp_matches`` — keep to the common
    subset (no lookaround) so the oracle replays it."""
    return Constraint("matches", column, threshold, {"pattern": pattern})


def foreign_key(
    column: str, ref_table: str, ref_column: str, threshold: float = 1.0
) -> Constraint:
    return Constraint(
        "foreign_key", column, threshold,
        {"ref_table": ref_table, "ref_column": ref_column},
    )


def _compliance(c: Constraint) -> Column:
    """Row-level compliance indicator for non-FK kinds (NULL-aware per
    the module-docstring semantics). Pure codegen expressions — no
    UDFs in the scan."""
    col = F.col(c.column)
    if c.kind == "in_range":
        return (col >= F.lit(c.params["lo"])) & (col <= F.lit(c.params["hi"]))
    if c.kind == "in_set":
        return col.isin(c.params["values"])
    if c.kind == "matches":
        return col.rlike(c.params["pattern"])
    raise ValueError(f"no row-local compliance for kind {c.kind!r}")


def check(
    df: DataFrame,
    constraints: list[Constraint],
    refs: dict[str, DataFrame] | None = None,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Compile ``constraints`` over ``df`` into a one-row-per-constraint
    report ``(check_name, target, metric, threshold, passed)``.

    All row-local constraints share ONE aggregate over ``df`` (single
    scan; the shuffle moves one counter row). Each ``foreign_key``
    constraint joins its non-null key values against
    ``refs[ref_table]`` — broadcast by default (reference tables are
    dimension-sized in every suite we ship; pass
    ``broadcast_refs=False`` for fact-to-fact integrity checks, where
    AQE picks a shuffle join).
    """
    if not constraints:
        raise ValueError("empty constraint suite")
    local = [c for c in constraints if c.kind != "foreign_key"]
    fks = [c for c in constraints if c.kind == "foreign_key"]

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(local):
        col = F.col(c.column)
        if c.kind == "not_null":
            aggs.append(F.count(col).alias(f"_num_{i}"))
        elif c.kind == "unique":
            aggs.append(F.count_distinct(col).alias(f"_num_{i}"))
            aggs.append(F.count(col).alias(f"_den_{i}"))
        else:
            aggs.append(
                F.sum(F.when(_compliance(c), 1).otherwise(0)).alias(f"_num_{i}")
            )
            aggs.append(F.count(col).alias(f"_den_{i}"))
    counters = df.agg(*aggs)

    def ratio(num: Column, den: Column) -> Column:
        # exact-int / exact-int -> one correctly-rounded IEEE division;
        # vacuous (empty denominator) compliance is 1.0
        return F.round(
            F.when(den == 0, F.lit(1.0)).otherwise(
                num.cast("double") / den.cast("double")
            ),
            6,
        )

    # ONE report row per local constraint via explode(array(struct..))
    # over the single counter row — the aggregate (and the table scan
    # under it) executes exactly once, not once per union branch.
    rows = []
    structs = []
    for i, c in enumerate(local):
        num = F.col(f"_num_{i}").cast("bigint")
        den = (
            F.col("_rows").cast("bigint")
            if c.kind == "not_null"
            else F.col(f"_den_{i}").cast("bigint")
        )
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("target"),
                ratio(num, den).alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
                num.alias("_num"),
                den.alias("_den"),
            )
        )
    if structs:
        rows.append(
            counters.select(F.explode(F.array(*structs)).alias("_r")).select(
                "_r.*"
            )
        )

    for c in fks:
        if refs is None or c.params["ref_table"] not in refs:
            raise KeyError(f"foreign_key needs refs[{c.params['ref_table']!r}]")
        ref = refs[c.params["ref_table"]].select(
            F.col(c.params["ref_column"]).alias("_ref_key")
        ).distinct()
        if broadcast_refs:
            ref = F.broadcast(ref)
        keys = df.select(F.col(c.column).alias("_key")).where(
            F.col("_key").isNotNull()
        )
        matched = keys.join(ref, keys["_key"] == ref["_ref_key"], "left").agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("_ref_key").alias("_m"),
        )
        name = f"foreign_key:{c.column}->{c.params['ref_table']}.{c.params['ref_column']}"
        rows.append(
            matched.select(
                F.lit(name).alias("check_name"),
                F.lit(c.column).alias("target"),
                ratio(F.col("_m").cast("bigint"), F.col("_n").cast("bigint")).alias(
                    "metric"
                ),
                F.lit(float(c.threshold)).alias("threshold"),
                F.col("_m").cast("bigint").alias("_num"),
                F.col("_n").cast("bigint").alias("_den"),
            )
        )

    report = rows[0]
    for r in rows[1:]:
        report = report.unionByName(r)
    # pass/fail from EXACT counters (one IEEE multiply + integer
    # compare — identical in DuckDB), never the rounded ratio
    return report.withColumn(
        "passed",
        (F.col("_den") == 0)
        | (
            F.col("_num").cast("double")
            >= F.col("threshold") * F.col("_den").cast("double")
        ),
    ).drop("_num", "_den")


def constraint_oracle_sql(
    table: str, constraints: list[Constraint]
) -> str:
    """DuckDB replay of :func:`check` over view ``table`` — a UNION ALL
    of one scalar SELECT per constraint, same rounding, same NULL
    semantics. The differential the gate runs."""
    parts = []
    for c in constraints:
        col = c.column
        if c.kind == "not_null":
            num, den = f"count({col})", "count(*)"
        elif c.kind == "unique":
            num, den = f"count(DISTINCT {col})", f"count({col})"
        elif c.kind == "in_range":
            lo, hi = c.params["lo"], c.params["hi"]
            num = (
                f"sum(CASE WHEN {col} >= {lo} AND {col} <= {hi}"
                f" THEN 1 ELSE 0 END)"
            )
            den = f"count({col})"
        elif c.kind == "in_set":
            # Escape embedded quotes ('' is the SQL standard) so a value
            # containing ' renders a valid literal instead of breaking
            # (or injecting into) the oracle query.
            vals = ", ".join(
                "'" + v.replace("'", "''") + "'" if isinstance(v, str) else str(v)
                for v in c.params["values"]
            )
            num = f"sum(CASE WHEN {col} IN ({vals}) THEN 1 ELSE 0 END)"
            den = f"count({col})"
        elif c.kind == "matches":
            pat = c.params["pattern"].replace("'", "''")
            num = (
                f"sum(CASE WHEN regexp_matches({col}, '{pat}')"
                f" THEN 1 ELSE 0 END)"
            )
            den = f"count({col})"
        elif c.kind == "foreign_key":
            rt, rc = c.params["ref_table"], c.params["ref_column"]
            name = f"foreign_key:{col}->{rt}.{rc}"
            parts.append(f"""
            SELECT '{name}' AS check_name, '{col}' AS target,
                   {float(c.threshold)} AS threshold,
                   sum(CASE WHEN r.{rc} IS NOT NULL THEN 1 ELSE 0 END) AS num,
                   count(*) AS den
            FROM (SELECT {col} FROM {table} WHERE {col} IS NOT NULL) t
            LEFT JOIN (SELECT DISTINCT {rc} FROM {rt}) r
              ON t.{col} = r.{rc}""")
            continue
        else:  # pragma: no cover - guarded by constructors
            raise ValueError(c.kind)
        parts.append(f"""
        SELECT '{c.name}' AS check_name, '{col}' AS target,
               {float(c.threshold)} AS threshold,
               coalesce({num}, 0) AS num, {den} AS den
        FROM {table}""")
    union = " UNION ALL ".join(parts)
    return f"""
    SELECT check_name, target,
           round(CASE WHEN den = 0 THEN 1.0
                 ELSE num::DOUBLE / den::DOUBLE END, 6) AS metric,
           threshold,
           (den = 0 OR num::DOUBLE >= threshold * den::DOUBLE) AS passed
    FROM ({union})
    """
