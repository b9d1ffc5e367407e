"""Opt-in core-scaling tier (r16, VERDICT item 5).

Every r15 scaling ratio was ~1 because sf0.1 queries run 0.2-7 s and
are dominated by fixed per-job scheduling/codegen overhead — core
scaling is unmeasurable at that SF. This tool gives the scaling block
something data-bound to measure: it replicates the TPC-H + events
tables K-fold (key-shifted copies, referential integrity preserved)
into ``SPARK_GRAFT_SCALE_DIR`` and times the relational headline
queries there at the current ``SPARK_GRAFT_CPUS``.

The text tier is deliberately NOT replicated here: copying documents
verbatim creates a degenerate all-duplicates corpus (every copy pairs
with every other in the similarity self-joins — quadratic, and not
what the operator sees in production); ``tools/scale_probe.py``
already generates a realistic 500k-doc corpus for that tier.

Usage:
    SPARK_GRAFT_SCALE_DIR=/tmp/scale64 python tools/scale_bench.py --gen 64
    SPARK_GRAFT_SCALE_DIR=/tmp/scale64 SPARK_GRAFT_CPUS=32 python tools/scale_bench.py
    SPARK_GRAFT_SCALE_DIR=/tmp/scale64 SPARK_GRAFT_CPUS=8  python tools/scale_bench.py

Prints one JSON line: {"metric": "scale_tier_wall", "cpus": N,
"factor": K, "queries": {name: sec}, ...}. This is a measurement tool,
NOT the driver bench — bench.py's contract is untouched. Nothing here
is read by any declared query: the replicated data is generated from
the sf inputs at tool runtime and used only for timing.

Key shifts: copy i adds i * 10^9 to every key column, so joins match
exactly within a copy and never across copies (all source keys are far
below 10^9 at any sf); nation/region are dimension-stable and kept
single-copy (nationkey/regionkey are NOT shifted — every customer copy
references the same 25 nations, exactly like a bigger TPC-H SF).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: replicated tables -> key columns shifted per copy
SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
#: dimension tables copied verbatim (single copy, unshifted keys)
VERBATIM = ["nation", "region"]

#: relational headline queries that read only the tables above
QUERIES_TIER = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "events_hourly_rollup",
    "events_sessionize",
]

STEP = 10**9  # per-copy key shift; all sf keys are far below this


def generate(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import (
        read_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    for t in VERBATIM:
        read_table(spark, sf_dir, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t, keys in SHIFTS.items():
        base = read_table(spark, sf_dir, t)
        copies = None
        for i in range(factor):
            c = base
            for k in keys:
                dt = dict(base.dtypes)[k]
                c = c.withColumn(k, (F.col(k) + F.lit(i * STEP)).cast(dt))
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
        print(f"generated {t} x{factor}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=0, metavar="K",
                    help="generate K-fold replicated data, then exit")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    out_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from summit_23_snowpark_data_lake_workloads_spark.cache import (
        release_caches,
    )
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import (
        QUERIES,
    )
    from summit_23_snowpark_data_lake_workloads_spark.session import get_spark

    spark = get_spark("summit23_scale_bench")
    if args.gen:
        generate(spark, sf_dir, out_dir, args.gen)
        with open(os.path.join(out_dir, "FACTOR"), "w") as fh:
            fh.write(str(args.gen))
        spark.stop()
        return

    factor = None
    try:
        with open(os.path.join(out_dir, "FACTOR")) as fh:
            factor = int(fh.read().strip())
    except OSError:
        pass

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    for name in QUERIES_TIER:
        spark.sparkContext.setJobDescription(f"scale_bench: {name}")
        samples = []
        try:
            for _ in range(args.runs):
                t0 = time.perf_counter()
                materialize(QUERIES[name](spark, out_dir))
                samples.append(time.perf_counter() - t0)
            per_query[name] = round(sorted(samples)[len(samples) // 2], 3)
        finally:
            release_caches()
            spark.catalog.clearCache()
    print(json.dumps({
        "metric": "scale_tier_wall",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "factor": factor,
        "queries": per_query,
        # read at print time — reflects load DURING the run (mostly our
        # own executors), not the pre-run box state
        "load_avg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
