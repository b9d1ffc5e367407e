"""BPE merge learning vs a pure-Python reference implementation."""

from __future__ import annotations

import collections

from summit_23_snowpark_data_lake_workloads_spark.operators.tokenizer import (
    EOW,
    learn_bpe_merges,
)


def _python_bpe(texts: list[str], k: int) -> list[tuple]:
    """Classic BPE on the word-frequency dict (Sennrich et al.):
    greedy left-to-right non-overlapping merge application."""
    words = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    vocab = {tuple(list(w) + [EOW]): f for w, f in words.items()}
    merges = []
    for rank in range(1, k + 1):
        pc = collections.Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merges.append((rank, a, b, a + b, f))
        nxt: dict[tuple, int] = {}
        for sym, fr in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + fr
        vocab = nxt
    return merges


def _check(spark, texts: list[str], k: int) -> None:
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [
        tuple(r)
        for r in learn_bpe_merges(spark, docs, k=k)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _python_bpe(texts, k), f"texts={texts!r}"


def test_bpe_simple_corpus(spark):
    _check(spark, ["low low low lower lowest", "new newer newest low"], 5)


def test_bpe_overlapping_pairs(spark):
    # 'aaaa' exercises greedy non-overlapping scan: (a,a) merges to
    # [aa, aa], never [aa, a, a] or overlapping triples
    _check(spark, ["aaaa aaa aa baab", "aab aaaa"], 4)


def test_bpe_merged_symbol_chains(spark):
    # a learned merge must participate in later pair counts (er + </w>)
    _check(spark, ["river rider racer", "racer racer river"], 6)


def test_bpe_exhausts_pairs(spark):
    # k larger than available pairs: stops early, returns what exists
    docs_texts = ["ab ab"]
    got_k = len(_python_bpe(docs_texts, 10))
    _check(spark, docs_texts, 10)
    assert got_k < 10


def test_trained_token_counts_matches_python(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.tokenizer import (
        trained_token_counts,
    )

    texts = ["low lower lowest low", "new newer lowest", "aaaa aab low"]
    k = 4
    merges = [(m[1], m[2]) for m in _python_bpe(texts, k)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in trained_token_counts(docs, merges).collect()
    }

    def encode(word: str) -> int:
        sym = list(word) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return len(sym)

    want = {
        i: sum(encode(w) for w in t.split(" ") if w) for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_artifact_roundtrip_preserves_rank_order(spark, tmp_path):
    """store -> load returns the merge list in learned-rank order and
    batch encode from the stored model equals encode from the in-memory
    model (BPE is order-sensitive: a permuted merge list changes token
    counts, so the round-trip must preserve rank exactly)."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.tokenizer import (
        load_bpe_merges,
        store_bpe_model,
        trained_token_counts,
    )

    texts = ["low lower lowest low", "new newer lowest", "aaaa aab low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    table = store_bpe_model(spark, docs, str(tmp_path / "bpe"), k=4)
    merges = load_bpe_merges(table)
    assert merges == [(m[1], m[2]) for m in _python_bpe(texts, 4)]

    inline = {
        r["doc_id"]: r["n_tokens"]
        for r in trained_token_counts(docs, merges).collect()
    }
    stored = {
        r["doc_id"]: r["n_tokens"]
        for r in trained_token_counts(docs, load_bpe_merges(table)).collect()
    }
    assert inline == stored


def test_bpe_trains_once_per_session_across_consumers(spark, sf_dir, monkeypatch):
    """The session memo: bpe_learn_merges + token_counts_bpe_trained +
    bpe_compression_audit together must invoke merge LEARNING at most
    once (the corpus-sized pass); every consumer reads the memoized
    model. This is the r5 advice-#4 scale debt pinned shut: at 100 TB,
    one training pass per model — not one per report."""
    from summit_23_snowpark_data_lake_workloads_spark import cache
    from summit_23_snowpark_data_lake_workloads_spark.operators import tokenizer
    from summit_23_snowpark_data_lake_workloads_spark.plans import queries_ml
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import QUERIES

    cache.release_caches()  # clear any memo from earlier tests
    calls = {"n": 0}
    real = tokenizer.learn_bpe_merges

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(tokenizer, "learn_bpe_merges", spy)
    try:
        QUERIES["bpe_learn_merges"](spark, sf_dir).collect()
        QUERIES["token_counts_bpe_trained"](spark, sf_dir).collect()
        QUERIES["bpe_compression_audit"](spark, sf_dir).collect()
        assert calls["n"] == 1, f"learned {calls['n']} times, expected 1"
        assert queries_ml._bpe_merge_rows(spark, sf_dir, k=6)  # memo populated
    finally:
        cache.release_caches()


def test_char_bigrams_edge_semantics(spark):
    """The split-once bigram construction must keep the exact bigram
    multiset contract: len-1 overlapping bigrams per string, empty for
    len < 2, trailing-empty split artifact filtered (a zero-width regex
    split with limit -1 keeps one — unfiltered it fabricates a bogus
    1-char final 'bigram')."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.functions.text import (
        char_bigrams,
    )

    rows = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "a b")],
        "id long, s string",
    ).select("id", char_bigrams("s").alias("bg")).collect()
    got = {r["id"]: r["bg"] for r in rows}
    assert got == {
        0: [],
        1: [],
        2: ["ab"],
        3: ["ab", "bc"],
        4: ["a ", " b"],
    }
