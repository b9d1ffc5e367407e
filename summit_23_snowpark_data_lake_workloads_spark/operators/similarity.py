"""Similarity-search operators over embedding columns (``array<float>``)
and TF-IDF document similarity (the scalable re-expression of the
reference's sklearn recommendation app, ``1_recommendation_app.py:38-98``).

Two tiers for ANN:
- brute-force cosine top-k — exact baseline, O(Q x N) pairs;
- LSH-bucketed top-k — deterministic random-hyperplane signs bucket the
  vectors; search only within the bucket (the 100 TB path: the bucket
  join prunes candidates before any arithmetic).

Rankings order by ROUNDED cosine with an id tie-break so results are
reproducible across engines (float summation order differs; rounding
absorbs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..cache import registered_persist
from ..functions.vector import cosine


def knn_bruteforce(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, neighbor_id, cos_sim, rk).

    ``query_pred`` restricts the query side (e.g. ``F.col("vec_id") < 20``);
    the candidate side is always the full table. The pairwise cosine runs
    JVM-side via zip_with/aggregate on a broadcast-joined pair stream —
    no Python boundary, no shuffle until the final per-query top-k.

    The query side is BROADCAST: it must be bounded. Without
    ``query_pred`` this would broadcast the whole table and cross-join it
    with itself (O(n²) pairs, driver/executor OOM at scale), so an
    unbounded call requires the explicit ``allow_full_scan=True`` opt-in.
    """
    if query_pred is None and not allow_full_scan:
        raise ValueError(
            "knn_bruteforce without query_pred broadcasts the FULL table as "
            "the query side (O(n^2) pairs). Pass query_pred to bound it, or "
            "allow_full_scan=True for a known-small corpus."
        )
    q = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if query_pred is not None:
        q = q.filter(query_pred)
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine("qv", "cv"), 4).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_bruteforce_arrow(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
) -> DataFrame:
    """Exact top-k cosine neighbors via an Arrow-batched pandas UDF —
    same output contract as :func:`knn_bruteforce`, different physical
    strategy.

    The bounded query side (typically 10s-1000s of vectors) is collected
    once and broadcast to every executor as a dense float64 matrix; the
    unbounded candidate side streams through ``mapInPandas`` in Arrow
    batches, where one numpy matmul scores |queries| x |batch| pairs per
    batch. This beats the JVM zip_with/aggregate formulation once pair
    counts pass ~10^7: the HOF lambda is interpreted per element, the
    matmul is vectorized C. Candidates never leave their partitions;
    only the final per-query top-k shuffles.
    """
    import numpy as np
    import pandas as pd

    q_rows = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if query_pred is not None:
        q_rows = q_rows.filter(query_pred)
    collected = q_rows.collect()  # bounded by construction: the query set
    q_ids = np.array([r[0] for r in collected], dtype=np.int64)
    qm = np.array([r[1] for r in collected], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bq = emb.sparkSession.sparkContext.broadcast((q_ids, qn))

    def score(batches):
        ids, qmat = bq.value
        for pdf in batches:
            c = np.array(list(pdf["cv"]), dtype=np.float64)
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = qmat @ cn.T  # |queries| x |batch|
            nq, nc = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, nc),
                    "neighbor_id": np.tile(pdf["neighbor_id"].to_numpy(), nq),
                    "cos_sim": np.round(sims.ravel(), 4),
                }
            )

    cand = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = cand.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def allpairs_cosine_arrow(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exhaustive pairwise cosine (id_a < id_b, cos >= threshold) via
    block matmul: the full normalized matrix broadcasts once (n x 64
    float64 — 10 MB at n=20k); each Arrow batch of rows computes
    |batch| x n similarities in one numpy matmul and emits only the
    surviving pairs.

    Replaces the interpreted zip_with/aggregate pair stream, which costs
    ~50 µs/pair (measured 93s for 2M pairs at sf0.1; this runs it in
    ~2s). Still O(n²) work by definition — beyond ~10^5 vectors switch
    to LSH-bucketed candidates (``hyperplane_bucket``) and verify only
    collisions; the broadcast ceiling (~10^6 x 64 = 0.5 GB) arrives at
    about the same point.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mn))

    def score(batches):
        all_ids, mat = bc.value
        for pdf in batches:
            c = np.array(list(pdf["v"]), dtype=np.float64)
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = np.round(cn @ mat.T, 4)  # |batch| x n
            bids = pdf["i"].to_numpy()
            keep = (sims >= threshold) & (bids[:, None] < all_ids[None, :])
            bi, ai = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": bids[bi],
                    "id_b": all_ids[ai],
                    "cos_sim": sims[bi, ai],
                }
            )

    cand = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    return cand.mapInPandas(score, "id_a long, id_b long, cos_sim double")


def allpairs_cosine_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed near-dup pairs: (id_a < id_b, cos_sim >= threshold),
    exact cosine verified ONLY within each hyperplane bucket — the
    100 TB semantic-dedup path.

    Shape: one narrow projection per row computes the deterministic
    bucket id; one shuffle on ``bucket``; each bucket verifies its own
    candidates with a single vectorized numpy matmul inside
    ``applyInPandas``. Nothing is ever collected to the driver and no
    pair outside a bucket is materialized, so total work is
    sum_b |b|^2 / 2 ~ n^2 / 2^n_planes instead of n^2 — and each
    bucket's verify is embarrassingly parallel. Recall < 1 by design
    (pairs split across buckets are missed); raise recall with more
    planes + multi-probe (see :func:`knn_lsh`) or a second plane set.
    Skew guard: a pathologically hot bucket = one big pandas group —
    add planes to split it (each plane halves expected bucket size).

    Versus :func:`allpairs_cosine_arrow` (broadcast full matrix,
    exhaustive): same verify arithmetic, but candidates are pruned
    BEFORE any arithmetic and memory per task is bounded by the bucket,
    not the corpus.
    """
    import numpy as np
    import pandas as pd

    bucketed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_bucket(vec_col, n_planes, dim).alias("bucket"),
    )

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cos_sim": np.float64}
            )
        m = np.array(list(pdf["v"]), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ mn.T, 4)
        ai, bi = np.triu_indices(len(ids), k=1)  # rows sorted by id => id_a < id_b
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ai[keep]],
                "id_b": ids[bi[keep]],
                "cos_sim": sims[ai[keep], bi[keep]],
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(
        verify, "id_a long, id_b long, cos_sim double"
    )


def hyperplane_bucket(
    vec_col: str, n_planes: int = 8, dim: int = 64
) -> F.Column:
    """Deterministic random-hyperplane LSH bucket id for a vector column.

    Plane j, coordinate i gets a pseudo-random weight in [-1, 1] derived
    from the portable md5 hash of ``"j_i"`` — reproducible in any engine,
    no stored model. Bucket = integer of the n_planes sign bits.

    The weights are CONSTANTS, so they are computed here in Python
    (hashlib md5 — bit-identical to ``portable_hash64``/DuckDB) and the
    whole projection is emitted as ONE ``F.expr`` string parsed JVM-side
    in a single pass. Building the same tree Column-by-Column costs
    thousands of py4j round trips (~6 s of pure plan construction for
    4x64 — measured); this costs milliseconds, same plan.
    """
    import hashlib

    def w(j: int, i: int) -> float:
        h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    planes = []
    for j in range(n_planes):
        proj = " + ".join(
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) * {w(j, i)!r}"
            for i in range(dim)
        )
        planes.append(f"(CASE WHEN 0.0 + {proj} >= 0 THEN {2 ** j} ELSE 0 END)")
    return F.expr(" + ".join(planes))


def knn_lsh(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    query_pred=None,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket — the candidate set shrinks ~2^n_planes-fold. Same output shape
    as :func:`knn_bruteforce` (recall < 1.0 by design).

    ``multiprobe=True`` additionally probes every 1-bit-flip neighbor
    bucket (the planes the vector was closest to crossing): candidates
    x(n_planes+1), recall typically 2-3x single-probe — the standard
    recall/cost dial for hyperplane LSH.
    """
    bucketed = emb.withColumn("bucket", hyperplane_bucket(vec_col, n_planes, dim))
    q = bucketed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    if query_pred is not None:
        q = q.filter(query_pred)
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(2**j)) for j in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(cosine("qv", "cv"), 4).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tie_round: int = 4,
) -> DataFrame:
    """K-means centroids for IVF under the cosine objective, trained
    with ``n_iters`` Lloyd rounds — deterministic end to end (seed
    centroids = the ``n_cells`` lowest-id vectors; fixed iteration
    count; decimal-exact order-invariant mean sums; assignment ties
    broken at the same rounded-cosine granularity as ``ivf_assign``),
    so a trained index is reproducible run-to-run AND replayable by a
    SQL oracle (``knn_ivf_trained``'s DuckDB mirror unrolls these exact
    iterations).

    ``tie_round`` is the assignment tie-break granularity: cosines are
    rounded to this many decimals before ranking, equal values resolve
    by centroid id. The default 4 matches ``ivf_assign`` and the DuckDB
    oracle (``round(x, 4)`` is reproducible across engines; 9 decimals
    of a double is not). BEHAVIOR NOTE: rounds 1-6 used 1e-9
    granularity — at 1e-4, cosines within 1e-4 now tie and resolve by
    centroid id, which on high-dimensional or near-uniform corpora
    (many near-ties) is a real clustering-quality change, accepted for
    oracle parity. Pass ``tie_round=9`` to recover the finer
    granularity when oracle replay is not needed.

    Centroids are the UNNORMALIZED per-dimension means: cosine is
    scale-invariant, so renormalizing changes nothing semantically —
    but a driver-side float normalization would re-introduce
    engine-specific summation into otherwise bit-exact centroid
    coordinates, so it is deliberately omitted.

    Each round is two distributed passes, both scale-shaped:
    assignment = |vectors| x n_cells broadcast-compare (argmax cosine);
    update = posexplode to (cell, dim_idx) partial means — one groupBy
    whose state is n_cells x dim doubles, collected to the driver only
    at that size (KBs) to rebuild the broadcast centroid table.
    Balanced cells are the point: seed centroids inherit corpus skew,
    k-means spreads it (measured in ``test_dedup_similarity``).
    """
    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
    )
    flat = emb.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("i", "x")
    )
    spark = emb.sparkSession
    for _ in range(n_iters):
        pairs = emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).crossJoin(F.broadcast(cents))
        w_ = W.partitionBy("id").orderBy(
            F.desc(F.round(cosine("v", "centv"), tie_round)), "cent_id"
        )
        assigned = (
            pairs.withColumn("rk", F.row_number().over(w_))
            .filter(F.col("rk") == 1)
            .select("id", "cent_id")
        )
        means = (
            flat.join(assigned, "id")
            .groupBy("cent_id", "i")
            # decimal-exact mean: the sum is order-invariant, so the
            # trained centroids are bit-identical run-to-run regardless
            # of shuffle arrival order (a plain double avg is not)
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r.cent_id, {})[r.i] = r.m
        rows = [
            (cid, [dims[i] for i in range(len(dims))])
            for cid, dims in sorted(by_cell.items())
        ]
        cents = spark.createDataFrame(
            rows, "cent_id long, centv array<double>"
        )
    return cents


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF cell assignment: (id, cent_id, cell_rank) — each vector ranked
    against every centroid by cosine (rank 1 = its home cell).

    Centroids are the ``n_cells`` lowest-id vectors — deterministic "seed
    centroids" instead of trained k-means, so the DuckDB oracle can
    reproduce the exact partitioning (a trained IVF would swap in a
    centroid table here; every downstream plan is unchanged). The
    centroid side broadcasts (n_cells x dim); assignment is
    |vectors| x n_cells pairs — linear in the table, the whole point
    of IVF vs the n² bucket-free search.
    """
    cents = (
        centroids
        if centroids is not None
        else emb.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
        )
    )
    pairs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).crossJoin(
        F.broadcast(cents)
    )
    scored = pairs.select(
        "id",
        "cent_id",
        F.round(cosine("v", "centv"), 4).alias("cent_cos"),
    )
    w = W.partitionBy("id").orderBy(F.desc("cent_cos"), "cent_id")
    return scored.withColumn("cell_rank", F.row_number().over(w))


def knn_ivf(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
    train_iters: int = 0,
    n_assign: int = 2,
) -> DataFrame:
    """IVF ANN: search only the query's ``n_probe`` nearest cells, with
    candidates REPLICATED into their ``n_assign`` top cells
    (multi-assignment — the standard inverted-file recall booster:
    storage and build cost scale by ``n_assign``, the probe budget does
    not change). ``train_iters > 0`` swaps the deterministic seed
    centroids for spherical-k-means-refined ones
    (:func:`kmeans_centroids`) — same plan, better-balanced cells; the
    oracle-gated declared query keeps ``0`` so DuckDB can replay the
    partitioning.

    Measured on the testdata embeddings (recall@5 vs brute force, 20
    queries, 16 cells / 2 probes — tests/test_dedup_similarity.py pins
    these): seed centroids 0.81 @ n_assign=1, **0.90 @ n_assign=2**
    (the default), 0.94 @ 3; TRAINED centroids 0.75 / 0.87 / 0.95 —
    k-means balances cells, which on a near-uniform corpus spreads true
    neighbors ACROSS cells and lowers recall at small n_assign, so
    multi-assignment (not training) is the production default here;
    training remains the right dial for genuinely clustered corpora.

    Output shape matches :func:`knn_bruteforce`; recall < 1 by design.

    Scale: assignment is linear; the probe join is an equi-join on
    cent_id (cells are balanced when vectors are spread, skew-prone if
    the corpus clusters — mitigate with more cells or the trained
    centroids); exact cosine runs only on
    |queries| x (n_probe * n_assign / n_cells) x n pairs.
    """
    cents = (
        kmeans_centroids(emb, n_cells, train_iters, id_col, vec_col)
        if train_iters > 0
        else None
    )
    assign = ivf_assign(emb, n_cells, id_col, vec_col, centroids=cents)
    home = assign.filter(F.col("cell_rank") <= n_assign).select(
        F.col("id").alias("neighbor_id"), F.col("cent_id").alias("cell")
    )
    probes = assign.filter(F.col("cell_rank") <= n_probe).select(
        F.col("id").alias("query_id"), F.col("cent_id").alias("cell")
    )
    q = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if query_pred is not None:
        q = q.filter(query_pred)
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    cand = (
        q.join(probes, "query_id")
        .join(home, "cell")
        .join(c, "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine("qv", "cv"), 4).alias("cos_sim")
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def hashed_features(
    tok: DataFrame,
    id_cols: list[str],
    token_col: str = "w",
    dim: int = 256,
) -> DataFrame:
    """Signed feature hashing (Weinberger et al., 2009): map every
    token occurrence to one of ``dim`` buckets with a ±1 sign from a
    second hash, sum per (entity, bucket) — a deterministic,
    model-free, fixed-dimensional "embedding" whose dot products
    approximate vocabulary-space dot products (unbiased, variance
    ~1/dim). The scale trick: per-entity state is bounded at ``dim``
    buckets no matter how large the corpus vocabulary grows (TF-IDF's
    long form is vocabulary-sized), which is what makes
    embedding-style retrieval possible with NO trained model and NO
    stored embedding column.

    Long-form sparse output ``(*id_cols, bucket, val)``; buckets whose
    signs cancel to zero are dropped (integer arithmetic — exactly
    reproducible in any engine). One groupBy, pure codegen.
    """
    from ..functions.scalar import portable_hash64

    sgn = F.lit(1) - F.lit(2) * F.pmod(
        portable_hash64(F.concat(F.lit("s#"), F.col(token_col))), F.lit(2)
    )
    return (
        tok.withColumn(
            "bucket", F.pmod(portable_hash64(F.col(token_col)), F.lit(dim))
        )
        .groupBy(*id_cols, "bucket")
        .agg(F.sum(sgn).alias("val"))
        .filter(F.col("val") != 0)
    )


def tfidf_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Relational TF-IDF: (id, token, weight) with weight = tf * idf,
    idf = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn-style).

    Fully distributed: two groupBys (tf, df) + one broadcast of the
    1-row document count. The token->df join is left to AQE: df_ has one
    row per DISTINCT TOKEN in the corpus (billions at 100 TB), far past
    any broadcast ceiling — a forced broadcast here would OOM the driver;
    AQE broadcasts it only when it is actually small.

    df derives FROM the tf table (one row per distinct (doc, token), so
    ``count(*)`` per token IS the document frequency) instead of a
    second ``distinct`` over the raw token stream: the corpus is
    tokenized and exploded exactly once per build — the previous shape
    ran the scan+explode twice (tf branch + df branch), a full extra
    corpus pass at any scale.
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token"),
    )
    tf = tok.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "weight",
            F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
        )
        .select("id", "token", "weight")
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_pred=None,
) -> DataFrame:
    """Doc-to-doc TF-IDF cosine top-k: (query_id, neighbor_id, cos_sim, rk).

    The sparse dot product is a token self-join + groupBy — the classic
    distributed formulation of the reference's dense sklearn cosine matrix
    (which is O(n²) driver memory; this is O(pairs-sharing-a-token) across
    the cluster). ``query_pred`` is applied to the QUERY side BEFORE the
    join — essential at scale: it bounds the pair stream to
    |queries| x docs-per-token instead of the full n² blowup.
    """
    # the weight table feeds four plan branches (both self-join sides +
    # both norm lookups); uncached, Spark re-runs the tokenize+tf+df
    # aggregation chain per branch — four scans of the corpus at 100 TB.
    # Persist once; production pipelines materialize this table anyway.
    wts = registered_persist(tfidf_weights(docs, id_col, text_col))
    norms = wts.groupBy("id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("nrm")
    )
    a = wts
    if query_pred is not None:
        a = a.filter(query_pred)
    a = a.alias("a")
    b = wts.alias("b")
    dots = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.id") != F.col("b.id")))
        .groupBy(F.col("a.id").alias("query_id"), F.col("b.id").alias("neighbor_id"))
        .agg(F.sum(F.col("a.weight") * F.col("b.weight")).alias("dot"))
    )
    scored = (
        dots.join(norms.withColumnsRenamed({"id": "query_id", "nrm": "nrm_q"}), "query_id")
        .join(
            # per-doc norms: unbounded cardinality — no broadcast hint, AQE decides
            norms.withColumnsRenamed({"id": "neighbor_id", "nrm": "nrm_n"}),
            "neighbor_id",
        )
        .withColumn("cos_sim", F.round(F.col("dot") / (F.col("nrm_q") * F.col("nrm_n")), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def semdedup_cells(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 4096,
) -> DataFrame:
    """SemDeDup cell assignment with the giant-cell guard:
    (id, cell, subcell, v) — rank-1 seed-centroid cell per vector, plus
    a secondary-hash ``subcell`` that splits any cell larger than
    ``max_cell`` into ``ceil(|cell| / max_cell)`` shards.

    The guard is the 100 TB safety bound: the pairwise stage is
    sum_c |c|² and k-means offers no worst-case promise — one
    degenerate cell (a boilerplate cluster, a near-constant embedding
    slice) re-creates the full O(n²) blowup inside a single Arrow
    group. Capping by secondary hash bounds every group at
    ``max_cell`` rows (bounded executor memory, bounded quadratic
    work) at a documented recall cost: pairs straddling two shards of
    a SPLIT cell are not compared — the standard shard-the-cluster
    trade every production SemDeDup makes. The split is HASH-based
    (never a per-cell row_number window, which would funnel the giant
    cell through one sorting task — the exact straggler being
    avoided), so the bound is probabilistic: shards target a 0.8 load
    factor (expected 0.8 * max_cell rows), leaving Chernoff headroom
    that makes an overshoot past ``max_cell`` vanishingly rare at
    production shard sizes. Cells at or under the cap are untouched
    (``n_sub = 1``), so results are bit-identical to the unguarded
    operator until the guard actually fires — the gated oracle query
    stays exact while the bound holds by pinned invariant
    (tests/test_dedup_similarity.py).
    """
    from ..functions.scalar import portable_hash64

    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
    )
    scored = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(cents))
        .select(
            "id",
            "v",
            "cent_id",
            F.round(cosine("v", "centv"), 4).alias("cent_cos"),
        )
    )
    # argmax cosine, tie -> min cent_id: lexicographic max of
    # (cent_cos, -cent_id), same order the windowed ivf_assign ranks by
    home = (
        scored.groupBy("id")
        .agg(
            F.max(
                F.struct(F.col("cent_cos"), (-F.col("cent_id")).alias("neg"))
            ).alias("m"),
            F.first("v").alias("v"),
        )
        .select("id", (-F.col("m.neg")).alias("cell"), "v")
    )
    if max_cell is None:
        return home.withColumn("subcell", F.lit(0))
    # per-cell pre-flight (the join_key_skew_profile shape applied to
    # the cell-id key): n_cells rows, broadcast back onto the fact side
    sizes = home.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    n_sub = F.when(F.col("cell_n") <= max_cell, F.lit(1)).otherwise(
        F.ceil(F.col("cell_n") / (0.8 * max_cell)).cast("int")
    )
    return (
        home.join(F.broadcast(sizes), "cell")
        .withColumn(
            "subcell",
            F.pmod(portable_hash64(F.col("id").cast("string")), n_sub).cast("int"),
        )
        .select("id", "cell", "subcell", "v")
    )


def cell_skew_profile(cells: DataFrame, key: str = "cell") -> DataFrame:
    """Skew pre-flight over a cell/bucket assignment — the
    ``join_key_skew_profile`` diagnostic applied to a clustering key:
    (n_cells, total_rows, max_cell_rows, skew_ratio, split_recommended).
    ``split_recommended`` uses the same hottest-vs-mean > 4 rule the
    join profiler uses for ``salt_recommended``."""
    per = cells.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    raw = F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1)))
    return per.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cell_rows"),
        F.round(raw, 4).alias("skew_ratio"),
        F.when(raw > 4, 1).otherwise(0).alias("split_recommended"),
    )


def semdedup_pairs(
    emb: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 4096,
) -> DataFrame:
    """SemDeDup removal list (Abbas et al., 2023): k-means-cell-confined
    pairwise cosine; one row per REMOVED vector with its chosen
    survivor — (vec_id, cell, dup_of, cos_sim), survivor = the lower-id
    member with max cosine (tie -> min id).

    Plan shape, both stages window-free and Python-row-free:

    - **assignment** — |vectors| x n_cells broadcast compare; the rank-1
      cell is a ``max(struct(cos, -cent_id))`` aggregate (no window);
      cells are the deterministic seed centroids so the DuckDB oracle
      replays the partitioning (``kmeans_centroids`` drops in for
      balanced production cells); oversized cells are secondary-hash
      split to at most ``max_cell`` rows (:func:`semdedup_cells` — the
      giant-cell guard that keeps the next stage's quadratic work
      bounded no matter how degenerate the clustering);
    - **pairwise** — the same per-group Arrow matmul as
      :func:`allpairs_cosine_lsh`, grouped by (cell, subcell) instead
      of hyperplane bucket: sum_c |c|² with |c| <= max_cell, each
      group one vectorized numpy block, nothing collected to the
      driver.
    """
    import numpy as np
    import pandas as pd

    home = semdedup_cells(emb, n_cells, id_col, vec_col, max_cell)

    def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        cell = int(pdf["cell"].iloc[0])
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cell": [], "cos_sim": []}
            ).astype(
                {
                    "id_a": np.int64,
                    "id_b": np.int64,
                    "cell": np.int64,
                    "cos_sim": np.float64,
                }
            )
        m = np.array(list(pdf["v"]), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ mn.T, 4)
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ai[keep]],
                "id_b": ids[bi[keep]],
                "cell": cell,
                "cos_sim": sims[ai[keep], bi[keep]],
            }
        )

    sims = home.groupBy("cell", "subcell").applyInPandas(
        verify, "id_a long, id_b long, cell long, cos_sim double"
    )
    # survivor per removed id_b: max cosine, tie -> min id_a — again an
    # aggregate argmax, no window
    return (
        sims.groupBy(F.col("id_b").alias("vec_id"))
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim"),
                    (-F.col("id_a")).alias("nega"),
                    F.col("cell"),
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.cell").alias("cell"),
            (-F.col("m.nega")).alias("dup_of"),
            F.col("m.cos_sim").alias("cos_sim"),
        )
    )
