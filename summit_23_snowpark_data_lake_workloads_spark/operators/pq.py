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

from ..cache import registered_persist


def _flat(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, pos, val) long form, ``val`` widened to DOUBLE so all
    arithmetic runs in double precision (the storage type is float32;
    without the cast Spark would subtract/multiply in float while the
    DuckDB oracle computes in double, and d2 would diverge at the 8th
    decimal)."""
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


def seed_codebook(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed codebook: (code_id, pos, cval) = the ``k``
    lowest-id vectors' coordinates (each subspace's slice of codeword j
    is vector j's slice)."""
    return _flat(emb, id_col, vec_col).filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("code_id"), "pos", F.col("val").alias("cval")
    )


def pq_subspace_distances(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Squared L2 distance of every vector's subvectors to every
    codeword: (vec_id, sub, code_id, d2). The codeword side —
    ``codebook`` (code_id, pos, cval), default the deterministic seed —
    is broadcast (m*k*dim/m rows of doubles, KBs)."""
    sub = (F.col("pos") / (dim // m)).cast("int")
    flat = _flat(emb, id_col, vec_col).withColumn("sub", sub)
    cb = F.broadcast(
        codebook if codebook is not None else seed_codebook(emb, k, id_col, vec_col)
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
    bit-identical distances.

    One aggregate, no window: ``min(struct(d2, code_id))`` is the
    lexicographic argmin (distance, then code id) with map-side partial
    combine — k rows per group never sort or shuffle beyond the single
    (vec, sub)-keyed exchange (same lesson as the cluster-canonical
    max_by rewrite)."""
    m = F.min(F.struct("d2", "code_id")).alias("m")
    return (
        dists.groupBy("vec_id", "sub")
        .agg(m)
        .select(
            "vec_id",
            "sub",
            F.col("m.code_id").alias("code_id"),
            F.col("m.d2").alias("d2"),
        )
    )


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace Lloyd-trained codebooks (the production PQ path):
    start from the deterministic seed codebook, then alternate
    assignment (the same broadcast-join argmin as encoding) and update
    (mean of assigned subvectors per codeword coordinate). The update
    aggregate's state is m*k*(dim/m) doubles — collected to the driver
    only at that KB size to rebuild the broadcast codeword table, the
    identical pattern to ``kmeans_centroids``. Codewords that attract
    no vectors keep their previous coordinates.

    Deterministic end-to-end (fixed seed, fixed iteration count,
    bit-identical distance sums, min-id tie-breaks) — a trained index
    is reproducible run-to-run; the oracle-gated queries keep the seed
    codebook so DuckDB can replay encoding without k-means.
    """
    spark = emb.sparkSession
    sub = (F.col("pos") / (dim // m)).cast("int")
    flat = _flat(emb, id_col, vec_col).withColumn("sub", sub)
    cb = seed_codebook(emb, k, id_col, vec_col)
    for _ in range(iters):
        codes = pq_codes(
            pq_subspace_distances(emb, m, k, dim, id_col, vec_col, codebook=cb)
        ).select("vec_id", "sub", "code_id")
        means = (
            flat.join(codes, ["vec_id", "sub"])
            .groupBy("code_id", "pos")
            # decimal-exact mean (kmeans_centroids pattern): the trained
            # codebook is bit-identical run-to-run regardless of shuffle
            # arrival order — a frozen artifact must not depend on it
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cval")
            )
            .collect()
        )
        got = {(r.code_id, r.pos): r.cval for r in means}
        prev = {(r.code_id, r.pos): r.cval for r in cb.collect()}
        rows = [
            (cid, pos, got.get((cid, pos), prev[(cid, pos)]))
            for (cid, pos) in prev
        ]
        cb = spark.createDataFrame(
            rows, "code_id long, pos int, cval double"
        )
    return cb


def pq_audit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Per-vector PQ encoding + reconstruction-error audit:
    (vec_id, c0..c{m-1}, rel_err) with rel_err = sum of subspace
    quantization errors over ||v||² — the number that decides whether a
    codebook is good enough to search with."""
    codes = pq_codes(
        pq_subspace_distances(emb, m, k, dim, id_col, vec_col, codebook)
    )
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
    codebook: DataFrame | None = None,
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
    # the distance table feeds BOTH the candidate-code branch and the
    # query side; persist it or the explode+join+agg subtree runs twice
    dists = registered_persist(
        pq_subspace_distances(emb, m, k, dim, id_col, vec_col, codebook)
    )
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
