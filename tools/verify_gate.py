"""Replicate the grading driver's DuckDB differential gate locally.

Usage:
    python tools/verify_gate.py                 # the driver's exact window:
                                                # first 50 of queries()
    python tools/verify_gate.py --all           # every declared query
    python tools/verify_gate.py name1 name2     # just these queries
    python tools/verify_gate.py --offset 50     # the OTHER half of the window

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — the gate scale).

Exit 0 iff every selected query matches its oracle (rows-only check for
queries with no oracle, same as the driver).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: gate window)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as m
    from oracle_utils import assert_matches_oracle, duck_connection

    from summit_23_snowpark_data_lake_workloads_spark.cache import release_caches
    from summit_23_snowpark_data_lake_workloads_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = m.queries()
    oracles = m.oracle_sql()
    if args.names:
        names = args.names
    elif args.all:
        names = list(qs)
    else:
        names = list(qs)[args.offset : args.offset + args.window]

    spark = get_spark("summit23_verify_gate")
    con = duck_connection(sf_dir)
    n_fail = 0
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, con, oracles[name])
                status = "ok"
            else:
                assert df.count() >= 0
                status = "rows-only"
        except Exception as exc:  # report every failure, not just the first
            status = f"FAIL {type(exc).__name__}: {exc}"
            n_fail += 1
        finally:
            release_caches()
            spark.catalog.clearCache()
        print(
            f"[{i + 1}/{len(names)}] {name}: {status}"
            f" ({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(f"{len(names) - n_fail}/{len(names)} green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
