"""Semantic tests for the dedup/similarity operators on crafted corpora
(planted duplicates), complementing the oracle differential tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_band_candidates,
    simhash_table,
)
from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
    knn_bruteforce,
    knn_lsh,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
FAR = "completely different words about spark shuffles and parquet footers here"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, NEAR),  # near duplicate of 0/1
        (3, FAR),
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_finds_planted_dup(corpus):
    groups = {r.keep_id: r.n_copies for r in exact_dup_groups(corpus, "text", "doc_id").collect()}
    assert groups[0] == 2  # docs 0 and 1 collapse, min-id survivor
    assert groups[3] == 1


def test_ngram_jaccard_identical_is_one(corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert all(3 not in p and 4 not in p for p in pairs)


def test_minhash_lsh_catches_near_dups(corpus):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 1) in pairs, "identical docs always collide in every band"
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_identical_docs_equal_fingerprint(corpus):
    fp = {r.id: r.simhash for r in simhash_table(corpus, "doc_id", "text").collect()}
    assert fp[0] == fp[1]
    assert 0 <= fp[0] < 2**32
    assert fp[0] != fp[3]
    cands = {
        (r.id_a, r.id_b)
        for r in simhash_band_candidates(corpus, "doc_id", "text").collect()
    }
    assert (0, 1) in cands


def test_knn_self_excluded_and_ranked(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_bruteforce(emb, k=3, query_pred=F.col("query_id") < 5).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rk, r.cos_sim))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3]
        sims = [r[1] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_knn_lsh_subset_of_bucket(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = knn_bruteforce(emb, k=5, query_pred=F.col("query_id") < 10)
    approx = knn_lsh(emb, k=5, n_planes=4, query_pred=F.col("query_id") < 10)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_rows = approx.collect()
    assert approx_rows, "LSH buckets must not be empty for all queries"
    # single-probe LSH over 16 buckets: recall is modest by design — the
    # assertion pins "clearly better than random" (random would be ~1%:
    # 5 of ~500 candidates), not production recall (multi-probe raises it)
    hits = sum(1 for r in approx_rows if (r.query_id, r.neighbor_id) in exact_pairs)
    single_recall = hits / len(approx_rows)
    assert single_recall > 0.05

    multi = knn_lsh(
        emb, k=5, n_planes=4, query_pred=F.col("query_id") < 10, multiprobe=True
    ).collect()
    multi_hits = sum(1 for r in multi if (r.query_id, r.neighbor_id) in exact_pairs)
    multi_recall = multi_hits / len(multi)
    assert multi_recall > single_recall, (
        f"multi-probe must beat single-probe: {multi_recall} vs {single_recall}"
    )


def test_connected_components_transitive_chain(spark):
    """a~b and b~c (but NOT a~c directly) must collapse to ONE cluster;
    isolated nodes keep their own id."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"]
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(pairs, nodes, id_col="doc_id").collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_connected_components_long_path_converges(spark):
    """A 12-node path graph needs multiple propagation rounds — pins the
    fixpoint loop, not just one iteration."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        connected_components,
    )

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    got = {r.id: r.cluster_id for r in connected_components(pairs, nodes, "doc_id").collect()}
    assert got == {i: 0 for i in range(n)}


def test_knn_bruteforce_guards_unbounded_query_side(spark, sf_dir):
    """No query_pred => whole-table broadcast cross-join; must refuse
    unless explicitly opted in."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="query_pred"):
        knn_bruteforce(emb, k=3)
    # the explicit opt-in still works for a known-small corpus
    out = knn_bruteforce(emb.limit(30), k=2, allow_full_scan=True)
    assert out.count() > 0


def test_allpairs_lsh_subset_of_exhaustive(spark, sf_dir):
    """Every LSH-verified pair must also appear (with the identical
    rounded cosine) in the exhaustive all-pairs result; identical vectors
    always share a bucket, so recall on true duplicates is 1.0."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
        allpairs_cosine_arrow,
        allpairs_cosine_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exhaustive = {
        (r.id_a, r.id_b): r.cos_sim
        for r in allpairs_cosine_arrow(emb, threshold=0.4).collect()
    }
    lsh_pairs = allpairs_cosine_lsh(emb, threshold=0.4, n_planes=4).collect()
    assert lsh_pairs, "bucketed dedup found nothing at the planted threshold"
    for r in lsh_pairs:
        assert r.id_a < r.id_b
        assert exhaustive[(r.id_a, r.id_b)] == r.cos_sim


def test_heavy_hitters_equals_naive_groupby(spark):
    """Two-pass candidate-prune heavy hitters must equal the naive
    full-shuffle groupBy exactly, including near-threshold keys spread
    adversarially across partitions (the pigeonhole superset guarantee)."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.operators.frequency import (
        heavy_hitters,
    )

    n = 20_000
    # skewed synthetic: key 0 ~ 12%, key 1 ~ 3%, long uniform tail; then
    # shuffled across 16 partitions so no key is partition-local
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 8 == 0, 0)
            .when(F.col("id") % 32 == 1, 1)
            .otherwise(F.pmod(F.xxhash64("id"), 500) + 10)
            .alias("k")
        )
        .repartition(16)
    )
    got = {(r.k, r.freq) for r in heavy_hitters(df, "k", theta=0.02).collect()}
    want = {
        (r.k, r.freq)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > 0.02 * n)
        .collect()
    }
    assert got == want and got, f"two-pass {got} != naive {want}"


def test_heavy_hitters_candidates_from_cache_not_rescan(spark):
    """Pass 1 must be scanned once: the broadcast candidate side of the
    pass-2 join reads the persisted pass-1 output (InMemoryTableScan),
    never a second mapInPandas pass over the fact — and the fact itself
    appears exactly once in the final plan (the recount join)."""
    import contextlib
    import io

    from summit_23_snowpark_data_lake_workloads_spark.operators.frequency import (
        heavy_hitters,
    )

    df = (
        spark.range(5_000)
        .select((F.pmod(F.col("id"), 20)).alias("k"))
        .repartition(8)
    )
    out = heavy_hitters(df, "k", theta=0.03)
    out.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" in plan, plan
    # MapInPandas may appear only BELOW the InMemoryTableScan node, i.e.
    # as the cached relation's plan description — never as an executed
    # node of the pass-2 query itself
    assert plan.index("InMemoryTableScan") < plan.index("MapInPandas"), plan
    assert plan.count("MapInPandas") == 1, plan


def test_heavy_hitters_rejects_non_bigint(spark):
    import pytest
    from summit_23_snowpark_data_lake_workloads_spark.operators.frequency import (
        heavy_hitters,
    )

    df = spark.range(10).select(F.col("id").cast("string").alias("s"))
    with pytest.raises(TypeError):
        heavy_hitters(df, "s", theta=0.1)


@pytest.mark.slow  # r16: model/quality tier — SPARK_GRAFT_SLOW=1 (verify-window budget)
def test_kmeans_ivf_improves_cohesion_and_keeps_recall(spark, sf_dir):
    """3 Lloyd rounds must (a) raise within-cell cohesion — the mean
    cosine between each vector and its home centroid, the objective
    Lloyd monotonically improves — over the lowest-id seed centroids,
    and (b) not lose recall vs the seed-centroid IVF at the same
    n_probe (measured against exact brute force). Cell-count balance is
    deliberately NOT asserted: on uniform synthetic embeddings seed
    cells are already near-balanced; balance wins appear on clustered
    corpora."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        knn_bruteforce,
        knn_ivf,
    )
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 20

    def cohesion(centroids):
        a = ivf_assign(emb, 16, centroids=centroids).filter(F.col("cell_rank") == 1)
        return a.agg(F.avg("cent_cos")).collect()[0][0]

    seed_coh = cohesion(None)
    km_coh = cohesion(kmeans_centroids(emb, 16, n_iters=3))
    assert km_coh > seed_coh, f"k-means cohesion {km_coh} <= seed {seed_coh}"

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, k=5, query_pred=pred).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    r_seed = recall(knn_ivf(emb, k=5, n_probe=2, query_pred=pred))
    r_km = recall(knn_ivf(emb, k=5, n_probe=2, query_pred=pred, train_iters=3))
    # on uniform embeddings tighter trained cells can cost a few recall
    # points at fixed n_probe (the classic IVF cells-vs-probes trade);
    # pin a floor rather than dominance, plus the cohesion win above
    assert r_km >= 0.7, f"k-means recall {r_km} below floor (seed {r_seed})"


def test_token_ngram_base_short_docs(spark):
    """Documents shorter than max_n tokens must not crash the zip-based
    base (slice raises on negative length if unguarded) and must emit
    exactly one null-padded row per token, like lead() windows did."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        ngrams_from_base,
        token_ngram_base,
    )

    df = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    base = token_ngram_base(df, "doc_id", "text", max_n=5)
    rows = base.collect()
    assert len(rows) == 2 + 1 + 6, "one row per token, short docs included"
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert all(r.t3 is None and r.t4 is None for r in by_id[1]), "null-padded tails"
    assert by_id[2][0].t1 is None
    tri = ngrams_from_base(base, 3)
    assert sorted(r.shingle for r in tri.filter(F.col("id") == 3).collect()) == [
        "alpha beta gamma",
        "beta gamma delta",
        "delta epsilon zeta",
        "gamma delta epsilon",
    ]
    assert tri.filter(F.col("id") != 3).count() == 0, "sub-3-token docs: no 3-grams"


def test_connected_components_tiers_agree(spark):
    """The driver union-find tier and the distributed min-label
    fixpoint must produce identical (id, cluster_id) labelings —
    including chain-shaped components (where diameter > 1 exercises
    multiple propagation rounds) and singletons."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        connected_components,
    )

    # components: chain 1-2-3-4, pair 10-11, triangle 20-21-22, singletons 30, 31
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 30, 31]], "id long"
    )
    fast = connected_components(pairs, nodes).collect()
    star = connected_components(pairs, nodes, driver_max_edges=0).collect()
    prop = connected_components(
        pairs, nodes, driver_max_edges=0, distributed_algorithm="propagation"
    ).collect()
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 31}
    assert {r.id: r.cluster_id for r in fast} == want
    assert {r.id: r.cluster_id for r in star} == want
    assert {r.id: r.cluster_id for r in prop} == want


@pytest.mark.slow  # r16: model/quality tier — SPARK_GRAFT_SLOW=1 (verify-window budget)
def test_connected_components_star_random_graphs(spark):
    """The large-star/small-star distributed tier must agree with the
    driver union-find on seeded random graphs across densities —
    including long paths (diameter >> log n, the regime the star
    algorithm exists for) and a graph whose component min has only
    larger neighbors (the case where large-star alone cannot make
    progress and the small-star half is load-bearing)."""
    import random

    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        connected_components,
    )

    cases = []
    rng = random.Random(7)
    for density in (0.02, 0.08):
        n = 30
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < density
        ]
        cases.append((n, edges))
    cases.append((14, [(i, i + 1) for i in range(13)]))  # long path
    cases.append((4, [(3, 1), (3, 2), (2, 0)]))  # min reached via max hub

    for n, edges in cases:
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        fast = {
            r.id: r.cluster_id
            for r in connected_components(pairs, nodes).collect()
        }
        star = {
            r.id: r.cluster_id
            for r in connected_components(
                pairs, nodes, driver_max_edges=0
            ).collect()
        }
        assert star == fast, f"star != union-find on n={n}, edges={edges}"


class TestSemdedupGiantCellGuard:
    """The r5-advice-#5 scale debt pinned shut: one degenerate k-means
    cell must never re-create the O(n²) pairwise stage."""

    def _skewed_emb(self, spark, n=120, dim=4):
        # seed centroids are vec_id < n_cells; every later vector sits
        # almost on centroid 0's axis -> one giant cell by construction
        rows = []
        for i in range(n):
            if i == 1:
                v = [0.0, 1.0, 0.0, 0.0]
            else:
                v = [1.0, 0.001 * (i % 7), 0.0005 * (i % 11), 0.0]
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_subcell_split_bounds_group_size(self, spark):
        from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
            cell_skew_profile,
            semdedup_cells,
        )

        emb = self._skewed_emb(spark)
        cells = semdedup_cells(emb, n_cells=2, max_cell=40)
        sizes = {
            (r["cell"], r["subcell"]): r["n"]
            for r in cells.groupBy("cell", "subcell")
            .agg(__import__("pyspark").sql.functions.count("*").alias("n"))
            .collect()
        }
        assert max(sizes.values()) <= 40, sizes
        # the skewed cell actually split into multiple shards
        assert len({sc for (c, sc) in sizes if c == 0}) >= 3

        # the pre-flight profiler flags a hot cell (hottest vs mean > 4,
        # the join_key_skew_profile rule applied to the cell key)
        skewed = spark.createDataFrame(
            [(i, 0 if i < 200 else i % 10) for i in range(250)],
            "row_id long, cell long",
        )
        prof = cell_skew_profile(skewed.select("cell")).collect()[0]
        assert prof["split_recommended"] == 1
        assert prof["max_cell_rows"] == 205  # 200 + the 5 tail rows with i%10==0
        balanced = spark.createDataFrame(
            [(i, i % 10) for i in range(250)], "row_id long, cell long"
        )
        assert (
            cell_skew_profile(balanced.select("cell")).collect()[0][
                "split_recommended"
            ]
            == 0
        )

    def test_split_preserves_membership_and_subsets_pairs(self, spark):
        from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
            semdedup_cells,
            semdedup_pairs,
        )

        emb = self._skewed_emb(spark)
        unguarded = {
            (r["id"], r["cell"])
            for r in semdedup_cells(emb, n_cells=2, max_cell=None).collect()
        }
        guarded = {
            (r["id"], r["cell"])
            for r in semdedup_cells(emb, n_cells=2, max_cell=40).collect()
        }
        assert unguarded == guarded  # split never moves a vector's cell

        # guarded removals subset the unguarded ones (missing pairs are
        # exactly the cross-shard ones -- the documented recall trade)
        full = {r["vec_id"] for r in semdedup_pairs(emb, n_cells=2, max_cell=None).collect()}
        capped = {r["vec_id"] for r in semdedup_pairs(emb, n_cells=2, max_cell=40).collect()}
        assert capped <= full
        assert capped  # the guard still finds within-shard duplicates

    def test_guard_inert_below_cap(self, spark):
        from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
            semdedup_pairs,
        )

        emb = self._skewed_emb(spark, n=60)
        a = sorted(map(tuple, semdedup_pairs(emb, n_cells=2, max_cell=4096).collect()))
        b = sorted(map(tuple, semdedup_pairs(emb, n_cells=2, max_cell=None).collect()))
        assert a == b


def test_ivf_multiassignment_recall_measured(spark, sf_dir):
    """The 'measure, don't guess' record behind the IVF production
    default: at the fixed 2-probe/16-cell budget, top-2 candidate
    multi-assignment lifts seed-centroid recall@5 to >= 0.9 (from ~0.81
    single-assignment), while TRAINED centroids measure LOWER at small
    n_assign on this near-uniform corpus (k-means balances cells, which
    spreads true neighbors across them) — which is why multi-assignment,
    not training, is the default. Trained centroids stay available and
    must still beat 0.9 at n_assign=3 (the clustered-corpus dial)."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = F.col("query_id") < 20
    bf = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, k=5, query_pred=pred).collect()}

    def recall(**kw):
        iv = {
            (r.query_id, r.neighbor_id)
            for r in knn_ivf(emb, k=5, n_cells=16, n_probe=2, query_pred=pred, **kw).collect()
        }
        return len(bf & iv) / len(bf)

    single = recall(n_assign=1)
    default = recall()  # n_assign=2, seed centroids — the production default
    trained3 = recall(train_iters=2, n_assign=3)
    assert default >= 0.9, f"default recall {default}"
    assert default > single, f"multi-assignment must beat single: {default} vs {single}"
    assert trained3 >= 0.9, f"trained n_assign=3 recall {trained3}"


def test_hashed_features_find_planted_duplicate_chunk(spark):
    """Signed feature hashing: an identical token multiset maps to the
    identical sparse vector, so a chunk duplicated across documents
    must surface as its copy's top-1 neighbor at cosine 1.0; unrelated
    chunks score below it. Also pins the sign-cancellation sparsity
    contract (val=0 buckets dropped)."""
    from pyspark.sql import Window as W

    from summit_23_snowpark_data_lake_workloads_spark.operators.similarity import (
        hashed_features,
    )

    shared = " ".join(f"tok{i % 17}x{i % 5}" for i in range(64))
    other = " ".join(f"zzz{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(0, shared + " " + other), (1, other + " " + shared), (2, other)],
        "doc_id long, text string",
    )
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).withColumn("chunk_id", F.floor(F.col("pos") / 64))
    feat = hashed_features(tok, ["doc_id", "chunk_id"], "w", dim=64)
    assert feat.filter(F.col("val") == 0).count() == 0

    nrm = feat.groupBy("doc_id", "chunk_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    q = feat.filter((F.col("doc_id") == 0) & (F.col("chunk_id") == 0)).withColumnsRenamed(
        {"doc_id": "qd", "chunk_id": "qc", "val": "qv"}
    )
    c = feat.withColumnsRenamed({"doc_id": "nd", "chunk_id": "nc", "val": "cv"})
    dots = (
        q.join(c, "bucket")
        .filter(~((F.col("qd") == F.col("nd")) & (F.col("qc") == F.col("nc"))))
        .groupBy("qd", "qc", "nd", "nc")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("dot"))
        .join(nrm.withColumnsRenamed({"doc_id": "nd", "chunk_id": "nc", "nrm": "n2"}), ["nd", "nc"])
        .join(nrm.withColumnsRenamed({"doc_id": "qd", "chunk_id": "qc", "nrm": "n1"}), ["qd", "qc"])
        .withColumn("cos", F.round(F.col("dot") / (F.col("n1") * F.col("n2")), 4))
    )
    top = dots.withColumn(
        "rk", F.row_number().over(W.partitionBy("qd", "qc").orderBy(F.desc("cos"), "nd", "nc"))
    ).filter(F.col("rk") == 1).collect()[0]
    # doc 0 chunk 0 == the shared 64 tokens == doc 1 chunk 1 exactly
    assert (top["nd"], top["nc"]) == (1, 1), top
    assert top["cos"] == 1.0


def test_minhash_mega_bucket_guard_star_candidates(spark):
    """The LSH mega-bucket guard: a dup cluster far past max_bucket
    must produce STAR candidates (min-id hub x members, g-1 pairs) —
    never the g(g-1)/2 all-pairs blowup — while connected components
    still unions the whole cluster; below the cap the guard is inert."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    g = 300
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text) for i in range(g)] + [
        (1000, "one two three four five six seven eight nine ten"),
        (1001, "cold wind north mountain river stone forest valley snow peak"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=50).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(0, i) for i in range(1, g)}, (
        f"expected {g - 1} star pairs to hub 0, got {len(got)}"
    )
    assert all(r.jaccard == 1.0 for r in pairs)

    nodes = docs.select("doc_id")
    cc = {
        r.id: r.cluster_id
        for r in connected_components(
            spark.createDataFrame(sorted(got), "id_a long, id_b long"),
            nodes,
            id_col="doc_id",
        ).collect()
    }
    assert {cc[i] for i in range(g)} == {0}, "star edges must union the cluster"
    assert cc[1000] == 1000 and cc[1001] == 1001

    # inert below the cap: guarded == unguarded on a small-bucket corpus
    small = spark.createDataFrame(rows[:5] + rows[-2:], "doc_id long, text string")
    a = sorted(map(tuple, minhash_lsh_pairs(small, "doc_id", "text", max_bucket=1024).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(small, "doc_id", "text", max_bucket=None).collect()))
    assert a == b


def test_incremental_hot_shingle_guard(spark, sf_dir, monkeypatch):
    """The incremental-dedup hot-shingle guard: with the cap forced
    below the df of a genuinely shared shingle, pairs whose overlap
    hinges on that shingle lose it from the intersection (jaccard
    biased down, documented stop-shingle trade) but the query still
    runs and every other verdict is unchanged; at the production cap
    the guard is inert and the result matches the oracle-gated output
    exactly (test_queries_oracle covers that side)."""
    from summit_23_snowpark_data_lake_workloads_spark.plans import queries_ml
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import QUERIES
    from summit_23_snowpark_data_lake_workloads_spark import cache

    def run():
        rows = {
            r["doc_id"]: tuple(r)[1:]
            for r in QUERIES["dedup_incremental_newbatch"](spark, sf_dir).collect()
        }
        cache.release_caches()
        return rows

    base = run()
    assert base, "no batch rows"
    try:
        monkeypatch.setattr(queries_ml, "HOT_SHINGLE_DF_CAP", 2)
        capped = run()
    finally:
        cache.release_caches()
    assert set(capped) == set(base)  # same batch docs, guard never drops rows
    # verdicts may only move in the MISS direction (near-dup -> accept):
    # dropping shingles can never create an intersection
    for d, (ex, nc, nb, acc) in base.items():
        ex2, nc2, nb2, acc2 = capped[d]
        assert ex2 == ex  # exact tier untouched by the shingle guard
        assert nc2 <= nc and nb2 <= nb
        assert acc2 >= acc


def test_segment_dedup_rewrite_canonical_and_reassembly(spark):
    """C4-rule semantics: the lexicographically-first occurrence of a
    duplicated segment survives (everywhere else it is cut, including a
    within-doc repeat), unique segments are untouched, and rewritten
    text preserves segment order."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        segment_dedup_rewrite,
    )

    boiler = "a b c d"  # one 4-token segment of boilerplate
    rows = [
        # doc 10: boilerplate twice (segments 0 and 1) + unique tail
        (10, f"{boiler} {boiler} t10 u10 v10 w10"),
        # doc 20: boilerplate mid-document
        (20, f"x20 y20 z20 q20 {boiler} r20 s20"),
        # doc 30: no duplicated content
        (30, "m30 n30 o30 p30"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in segment_dedup_rewrite(
            df, "id", "text", k=4, min_count=2
        ).collect()
    }
    # doc 10 keeps the FIRST boilerplate copy (seg_idx 0), loses seg 1
    assert out[10]["n_segments"] == 3
    assert out[10]["n_dropped"] == 1
    assert out[10]["text_clean"] == f"{boiler} t10 u10 v10 w10"
    # doc 20 loses its copy entirely (doc 10 holds the canonical one)
    assert out[20]["n_dropped"] == 1
    assert out[20]["text_clean"] == "x20 y20 z20 q20 r20 s20"
    # doc 30 untouched, short tail segment intact
    assert out[30]["n_dropped"] == 0
    assert out[30]["text_clean"] == "m30 n30 o30 p30"


def test_segment_dedup_rewrite_shuffle_join_parity(spark):
    """broadcast_dups=False (the huge-duplicate-volume fallback) must
    produce identical rewrites via the shuffle join."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        segment_dedup_rewrite,
    )

    rows = [(i, f"dup{i % 3} dup{i % 3} tail{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = segment_dedup_rewrite(df, "id", "text", k=2, min_count=2)
    b = segment_dedup_rewrite(
        df, "id", "text", k=2, min_count=2, broadcast_dups=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_segment_dedup_rewrite_line_boundary(spark):
    """boundary='line': newline-delimited segments, position-INVARIANT
    matching (the shifted-boilerplate case fixed-k windows miss), and
    newline-joined reassembly."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        segment_dedup_rewrite,
    )

    df = spark.createDataFrame(
        [
            (1, "BOILER\nunique one\nmore text"),
            # same boilerplate line at a DIFFERENT position
            (2, "intro words\nBOILER\nunique two"),
            (3, "all original\nnothing shared"),
        ],
        "id int, text string",
    )
    got = {
        r.id: r
        for r in segment_dedup_rewrite(
            df, "id", "text", min_count=2, boundary="line"
        ).collect()
    }
    # canonical copy = min (id, seg_idx) -> doc 1 keeps it, doc 2 loses it
    assert got[1].text_clean == "BOILER\nunique one\nmore text"
    assert got[2].text_clean == "intro words\nunique two"
    assert got[2].n_dropped == 1 and got[1].n_dropped == 0
    assert got[3].text_clean == "all original\nnothing shared"
    # fixed-k windows would NOT have matched the shifted line
    fixed = {
        r.id: r.n_dropped
        for r in segment_dedup_rewrite(
            df, "id", "text", k=2, min_count=2, boundary="fixed"
        ).collect()
    }
    assert fixed[2] == 0


def test_segment_dedup_rewrite_bad_boundary(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        segment_dedup_rewrite,
    )

    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError, match="boundary"):
        segment_dedup_rewrite(df, "id", "text", boundary="paragraph")
