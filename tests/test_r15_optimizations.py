"""Pins for the r15 optimization replans (OPTIMIZATION_r15.md).

Each optimization changed an operator's *internals* while keeping its
output byte-identical; these tests pin the equivalence against the
pre-r15 formulation so a future refactor cannot silently drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.cache import (
    CACHE_LEVEL,
    registered_persist,
    release_caches,
)
from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
    minhash_signatures,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import (
        read_table,
    )

    return read_table(spark, SF, "documents")


def test_cache_level_is_serialized(spark):
    """registered_persist must use the serialized level: the deserialized
    columnar cache measured 5-10x slower to build / ~6x to read on the
    Spark 4.1 runtime (OPTIMIZATION_r15.md §1)."""
    assert not CACHE_LEVEL.deserialized
    assert CACHE_LEVEL.useMemory and CACHE_LEVEL.useDisk
    df = registered_persist(spark.range(10))
    try:
        lvl = df.storageLevel
        assert not lvl.deserialized
        assert lvl.useMemory and lvl.useDisk
    finally:
        release_caches()


def test_band_signature_conditional_agg_matches_collect_list(spark):
    """The r15 conditional-aggregate band signature is byte-identical to
    the pre-r15 collect_list+array_sort+transform formulation — for the
    operator (minhash_lsh_pairs) and the index twin (_band_signatures),
    which share the construction."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.minhash_index import (
        _band_signatures,
    )

    num_hashes, bands = 12, 4
    rpb = num_hashes // bands
    sig = minhash_signatures(_docs(spark), "doc_id", "text", num_hashes, 3)
    new = _band_signatures(sig, num_hashes, bands)
    old = (
        sig.withColumn("band", (F.col("seed") / rpb).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("sig")
        )
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    # and the executed plan is the codegen shape: no object aggregate
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" not in plan


def test_doc_chunk_windows_shuffle_free_matches_explode_form(spark):
    """The r15 sequence+slice chunking is row-identical to the pre-r15
    posexplode + (doc_id, chunk_id) shuffle + collect_list reassembly,
    and its physical plan contains no Exchange at all."""
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import (
        QUERIES,
    )

    new = QUERIES["doc_chunk_windows"](spark, SF)
    docs = _docs(spark)
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    old = (
        tok.withColumn("chunk_id", F.floor(F.col("pos") / 64))
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, w))), s -> s.w)"
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_df_from_tf_matches_distinct_form(spark):
    """tfidf_weights' document frequency (counted over the tf table)
    equals the pre-r15 second-distinct-pass formulation exactly."""
    docs = _docs(spark)
    tok = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
    )
    old = (
        tok.select("id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    new = (
        tok.groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
