"""Product quantization (PQ) over embedding columns — the compression
tier of a production vector index (FAISS IVF-PQ style): each vector is
split into ``m`` subspaces and every subvector is replaced by the id of
its nearest codeword, shrinking 64 float64s to ``m`` small ints. Search
then runs over CODES via asymmetric distance computation (ADC): the
query precomputes its distance to every codeword once and candidate
distances are ``m`` table lookups — no full-vector arithmetic per
candidate.

Codebooks here are DETERMINISTIC seed codewords (sub-slices of the
``k`` lowest-id vectors), the same replayability trick as the IVF seed
centroids: the DuckDB oracle reproduces codes, distances, and rankings
exactly. A trained variant would swap per-subspace k-means codebooks in
(see ``kmeans_centroids``); every downstream plan is unchanged.

All relational, no UDFs: one posexplode of the vectors, a broadcast
join against the (m x k x dim/m)-row codeword table, and window argmins
over distances built with decimal-exact summation (bit-identical in
Spark and the DuckDB oracle), min-id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _flat(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, pos, val) long form, ``val`` widened to DOUBLE so all
    arithmetic runs in double precision (the storage type is float32;
    without the cast Spark would subtract/multiply in float while the
    DuckDB oracle computes in double, and d2 would diverge at the 8th
    decimal)."""
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


def pq_subspace_distances(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Squared L2 distance of every vector's subvectors to every
    codeword: (vec_id, sub, code_id, d2). The codeword side is the
    ``k`` lowest-id vectors' sub-slices, broadcast (m*k*dim/m rows of
    doubles — KBs)."""
    sub = (F.col("pos") / (dim // m)).cast("int")
    flat = _flat(emb, id_col, vec_col).withColumn("sub", sub)
    cb = F.broadcast(
        flat.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("code_id"),
            "pos",
            F.col("val").alias("cval"),
        )
    )
    # decimal-exact summation (the _money_sum trick): each squared diff
    # (an IEEE-deterministic double, identical in both engines) is CAST
    # to decimal — exact conversion, no float-path round() — and summed
    # exactly, so d2 is the IDENTICAL double in Spark and DuckDB and
    # every downstream argmin/sum derives from bit-equal inputs
    d = F.col("val") - F.col("cval")
    return (
        flat.join(cb, "pos")
        .groupBy("vec_id", "sub", "code_id")
        .agg(F.sum((d * d).cast("decimal(28,9)")).cast("double").alias("d2"))
    )


def pq_codes(dists: DataFrame) -> DataFrame:
    """Argmin codeword per (vector, subspace): (vec_id, sub, code_id,
    d2) with the min-code-id tie-break; both engines order the same
    bit-identical distances."""
    # d2 is bit-identical across engines (decimal-exact construction),
    # so ordering on the raw value needs no rounding guard
    w = W.partitionBy("vec_id", "sub").orderBy("d2", "code_id")
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def pq_audit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector PQ encoding + reconstruction-error audit:
    (vec_id, c0..c{m-1}, rel_err) with rel_err = sum of subspace
    quantization errors over ||v||² — the number that decides whether a
    codebook is good enough to search with."""
    codes = pq_codes(pq_subspace_distances(emb, m, k, dim, id_col, vec_col))
    nrm2 = _flat(emb, id_col, vec_col).groupBy("vec_id").agg(
        F.sum((F.col("val") * F.col("val")).cast("decimal(28,9)"))
        .cast("double")
        .alias("nrm2")
    )
    code_cols = [
        F.max(F.when(F.col("sub") == s, F.col("code_id"))).alias(f"c{s}")
        for s in range(m)
    ]
    err = F.sum(F.col("d2").cast("decimal(28,9)")).cast("double")
    return (
        codes.groupBy("vec_id")
        .agg(*code_cols, err.alias("err"))
        .join(nrm2, "vec_id")
        .select(
            "vec_id",
            *[f"c{s}" for s in range(m)],
            F.round(F.col("err") / F.col("nrm2"), 6).alias("rel_err"),
        )
    )


def knn_pq_adc(
    emb: DataFrame,
    topk: int = 5,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_d2, rk). Candidates are
    ranked by the sum of the query's precomputed codeword distances at
    the candidate's codes — ``m`` additions per candidate, the PQ
    search model. Approximate by construction (quantization error
    biases distances); recall recovers with trained codebooks and an
    exact re-rank of the shortlist, neither of which changes this plan.

    Scale: the per-query distance table is |queries| * m * k rows
    (broadcast); candidates join it on (sub, code_id) — an equi-join on
    a 2-int key — and aggregate m rows per (query, candidate). Codes
    come from the same broadcast-join encode pass as :func:`pq_audit`;
    at index time they would be read from the stored code table
    instead.
    """
    dists = pq_subspace_distances(emb, m, k, dim, id_col, vec_col)
    codes = pq_codes(dists).select("vec_id", "sub", "code_id")
    qd = dists.withColumnsRenamed({"vec_id": "query_id"})
    if query_pred is not None:
        qd = qd.filter(query_pred)
    adc = (
        codes.withColumnsRenamed({"vec_id": "neighbor_id"})
        .join(F.broadcast(qd), ["sub", "code_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.round(
                F.sum(F.col("d2").cast("decimal(28,9)")).cast("double"), 4
            ).alias("adc_d2")
        )
    )
    w = W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return adc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= topk
    )
