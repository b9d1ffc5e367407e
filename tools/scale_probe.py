"""Re-runnable scale probe: the degenerate-corpus harness behind the
round-7 scale fixes (wide min-aggregate MinHash signatures, fanout +
codegen bigrams, hot-shingle guard, LSH mega-bucket star guard).

The sf* testdata is too clean to exercise those guards — every df is
tiny and no cluster is degenerate. This probe generates a corpus with
the pathologies real web crawls have, at a size where the quadratic
backdoors actually detonate (the r7 numbers: char-LM bigrams 560s->70s,
MinHash OOM->180s, incremental dedup unbounded->completes at 500k
docs), then runs the three scale-critical stages end-to-end with wall
ceilings:

- **zipfian body text** — token frequencies follow a power law, so
  shingle dfs have the long tail the guards budget for;
- **a boilerplate mega-cluster** (default 5% of the corpus sharing one
  80-token template) — its shared shingles have df = cluster size
  (25k at 500k docs), far past HOT_SHINGLE_DF_CAP, and its band
  signatures collide into one mega-bucket, far past max_bucket;
- **an arriving batch** (source='src19') so the incremental path runs
  its real batch-vs-corpus geometry.

Usage:
    python tools/scale_probe.py                  # 500k docs, all stages
    python tools/scale_probe.py --n-docs 20000   # small smoke
    python tools/scale_probe.py --stages charlm,minhash
Env: SPARK_GRAFT_CPUS (local[N], default 32).

Prints one JSON line: {"n_docs": ..., "stages": {name: sec}, "ok": bool}.
Deterministic: same seed -> same corpus -> same candidate counts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: per-stage wall ceilings (seconds) at the default 500k docs on
#: local[32] — a re-introduced quadratic backdoor (minutes-to-never)
#: fails loudly while box noise passes. Measured r8 on this synthetic
#: corpus: charlm 18s, minhash 537s (contended box), incremental 284s;
#: the r7 testdata-shaped measurements were 70s/180s/"completes".
CEILINGS_500K = {
    "charlm": 300.0,
    # same count-table contract as charlm (2 scans + 1 fused broadcast
    # after the r14 replan) plus the broadcast target-flag join; the
    # probe corpus tags ~1/7 of docs src0, a far FATTER target set than
    # the bench data — the broadcast side is (n_docs/7) ids, the stress
    # the replan's "target set is broadcastable" claim must survive
    "dsir": 300.0,
    "minhash": 900.0,
    "incremental": 600.0,
    # stride-1 64-char windows over ~600-char docs = ~270M fingerprint
    # rows at 500k docs, one shuffle + the boilerplate cluster's 25k-doc
    # repeated-window hit join (r12 measurement below)
    "substring": 900.0,
    # open-format interop: lakehouse table build (the one data write),
    # Delta log export + a sync'd append + zero-copy import + read-back
    # — everything past the initial create must be O(files) metadata
    # and hard links, so the ceiling is dominated by the corpus write
    "delta": 300.0,
}


def generate_corpus(spark, n_docs: int, out_dir: str, seed: int = 7,
                    boilerplate_frac: float = 0.05,
                    batch_frac: float = 0.02) -> None:
    """Write ``documents.parquet`` (driver-testdata schema) under
    ``out_dir``: zipfian 100-token bodies, a single boilerplate
    template cluster of ``boilerplate_frac`` x n_docs near-identical
    docs, and ``batch_frac`` of docs tagged source='src19' (the
    incremental query's arriving batch). Generation is mapInPandas
    with a per-partition-seeded RNG — distributed and deterministic."""
    import numpy as np
    import pandas as pd

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    vocab = np.array([f"tok{i}" for i in range(50_000)])
    template = " ".join(f"boiler{i}" for i in range(80))

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(seed * 1_000_003 + int(ids[0]) % 997)
            texts = []
            for doc_id in ids:
                if doc_id % int(1 / boilerplate_frac) == 0:
                    # boilerplate cluster: shared template + tiny tail
                    tail = vocab[rng.zipf(1.3, 20) % len(vocab)]
                    texts.append(template + " " + " ".join(tail))
                else:
                    toks = vocab[rng.zipf(1.3, 100) % len(vocab)]
                    texts.append(" ".join(toks))
            out = pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": "en",
                    "source": [
                        "src19" if i % int(1 / batch_frac) == 1 else f"src{i % 7}"
                        for i in ids
                    ],
                }
            )
            out["n_chars"] = out["text"].str.len()
            yield out

    (
        spark.range(n_docs).repartition(n_parts)
        .withColumnRenamed("id", "id")
        .mapInPandas(gen, "doc_id long, text string, lang string, "
                          "source string, n_chars long")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument(
        "--stages", default="charlm,dsir,minhash,incremental,substring,delta"
    )
    ap.add_argument("--keep", action="store_true", help="keep the corpus dir")
    args = ap.parse_args()

    from summit_23_snowpark_data_lake_workloads_spark.cache import release_caches
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import QUERIES
    from summit_23_snowpark_data_lake_workloads_spark.session import get_spark

    spark = get_spark("summit23_scale_probe")
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    scale = args.n_docs / 500_000.0
    timings: dict[str, float] = {}
    ok = True
    try:
        t0 = time.perf_counter()
        generate_corpus(spark, args.n_docs, tmp)
        timings["datagen"] = round(time.perf_counter() - t0, 1)

        def run(name, thunk):
            nonlocal ok
            t = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            took = round(time.perf_counter() - t, 1)
            timings[name] = took
            release_caches()
            spark.catalog.clearCache()
            # sublinear stages: scale the 500k ceiling by corpus ratio,
            # floored at 60s so tiny smokes don't flap
            ceiling = max(60.0, CEILINGS_500K[name] * max(scale, 0.1))
            if took > ceiling:
                ok = False
                print(f"# CEILING BREACH {name}: {took}s > {ceiling}s",
                      file=sys.stderr)

        stages = args.stages.split(",")
        docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
        if "charlm" in stages:
            run("charlm", lambda: QUERIES["charlm_doc_quality"](spark, tmp))
        if "dsir" in stages:
            run("dsir",
                lambda: QUERIES["dsir_importance_weights"](spark, tmp))
        if "minhash" in stages:
            # the mega-bucket star guard is opt-in (lossy past the cap);
            # at 500k the boilerplate bucket is ~25k members = a 0.3G
            # single-array join allocation without it
            run("minhash", lambda: minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.5, max_bucket=1024))
        if "incremental" in stages:
            run("incremental",
                lambda: QUERIES["dedup_incremental_newbatch"](spark, tmp))
        if "substring" in stages:
            # the boilerplate cluster makes ~25k docs share every window
            # of an ~500-char span: the repeated-fp hit join and the
            # per-doc island merge both get their worst realistic case
            # (r12 measured: 214.9s at 500k docs, 67.9s at 100k)
            run("substring",
                lambda: QUERIES["dedup_substring_repeats"](spark, tmp))
        if "delta" in stages:
            def delta_interop():
                from summit_23_snowpark_data_lake_workloads_spark.sources.delta_export import (
                    export_delta,
                    import_delta,
                    sync_delta,
                )
                from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
                    SnapshotTable,
                )

                t = SnapshotTable(spark, os.path.join(tmp, "lh_t"))
                # 64 files: enough for the per-file metadata loops
                # (stats, links, add actions) to dominate over constant
                # overhead without the create write drowning the signal
                t.create(docs.repartition(64))
                e = os.path.join(tmp, "lh_delta")
                export_delta(t, e)
                t.append(docs.limit(1000))
                sync_delta(t, e)
                import_delta(spark, e, os.path.join(tmp, "lh_imp"))
                t2 = SnapshotTable(spark, os.path.join(tmp, "lh_imp"))
                return t2.read().groupBy().count()

            run("delta", delta_interop)
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"n_docs": args.n_docs, "stages": timings, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
