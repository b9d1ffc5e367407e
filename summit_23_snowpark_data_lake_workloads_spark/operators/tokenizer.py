"""Distributed BPE tokenizer training (byte-pair-encoding merge
learning) — the "train a tokenizer on the corpus" step of an LLM data
pipeline, expressed Spark-first.

Classic BPE (Sennrich et al. 2016, public algorithm) trains on the
WORD-FREQUENCY table, not the raw corpus — the right scale split: the
corpus-sized work (one tokenize + groupBy word) happens exactly once,
and every merge iteration then runs over the vocabulary table, which is
orders of magnitude smaller than the corpus at any scale (Heaps' law).

Per iteration the engine:

1. counts adjacent symbol pairs weighted by word frequency — the
   shuffle-free ``arrays_zip`` over slice-shifted arrays (same trick as
   the shingle base in :mod:`.dedup`), one small groupBy on the pair;
2. takes the deterministic argmax (frequency desc, pair string asc —
   ASCII-only symbols, so Spark and any SQL oracle order identically);
3. applies the merge to every word via one literal ``replace`` on a
   canonical DOUBLE-SPACED symbol string. The double-space form makes
   ``' a  b '`` match exactly token-boundary-aligned occurrences, and
   left-to-right non-overlapping ``replace`` (identical semantics in
   Spark and DuckDB) IS the greedy BPE merge scan; a renormalization
   re-split restores the canonical form for the next round.

The driver holds one argmax row per iteration (the learned merge —
that's the model, k rows total); the vocabulary never leaves the
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker symbol (standard BPE formulation)
EOW = "</w>"


def _canonical(sym_array) -> F.Column:
    """Symbols array -> canonical string: single space at both ends,
    double spaces between symbols (`` a  b  </w> ``)."""
    return F.concat(F.lit(" "), F.array_join(sym_array, "  "), F.lit(" "))


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, s): corpus word frequencies with each word exploded
    into its character symbols + ``</w>``, rendered canonically. The one
    corpus-sized pass of BPE training."""
    from ..functions.text import normalize_chars

    words = (
        docs.select(
            F.explode(F.split(normalize_chars(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # split between characters (zero-width boundary), then append EOW
    chars = F.split(F.col("word"), "(?!^)")
    return words.select(
        "word",
        "freq",
        _canonical(F.concat(chars, F.array(F.lit(EOW)))).alias("s"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, f): adjacent-symbol pair frequencies over the vocabulary,
    weighted by word frequency. Shuffle-free pair construction
    (arrays_zip over slice-shifted token arrays); the only shuffle is
    the small groupBy on the pair itself."""
    t = F.split(F.trim(F.col("s")), " +")
    sz = F.size(t)
    n_pairs = F.greatest(F.lit(0), sz - 1)
    zipped = F.arrays_zip(F.slice(t, 1, n_pairs), F.slice(t, 2, n_pairs))
    pairs = F.transform(zipped, lambda g: F.concat_ws(" ", g["0"], g["1"]))
    return (
        words.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("f"))
    )


def apply_merges(s, merges: list[tuple[str, str]]) -> F.Column:
    """Apply learned merges IN RANK ORDER to a canonical symbol string —
    each one literal replace + renormalization, all codegen. BPE
    inference applies merges by learned priority, which sequential
    application reproduces exactly."""
    col = F.col(s) if isinstance(s, str) else s
    for a, b in merges:
        replaced = F.replace(col, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
        col = _canonical(F.split(F.trim(replaced), " +"))
    return col


def trained_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens): per-document token counts under a TRAINED
    BPE (the learned merge list), token = post-merge symbol incl. the
    ``</w>`` marker when unmerged.

    Scale shape: encode each DISTINCT word exactly once (the vocabulary
    is Heaps'-law small), broadcast the (word -> tokens-per-word) map
    back, and the per-document count is one weighted sum — the corpus
    text is tokenized once and never re-scanned per merge.
    """
    from ..functions.text import normalize_chars

    docw = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalize_chars(F.col(text_col)), " ")).alias("word"),
        )
        .filter(F.length("word") > 0)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    chars = F.split(F.col("word"), "(?!^)")
    vocab = (
        docw.select("word")
        .distinct()
        .select(
            "word",
            _canonical(F.concat(chars, F.array(F.lit(EOW)))).alias("s"),
        )
        .select(
            "word",
            F.size(F.split(F.trim(apply_merges("s", merges)), " +")).alias("n_sym"),
        )
    )
    return (
        docw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("n_sym")).alias("n_tokens"))
    )


def learn_bpe_merges(
    spark: SparkSession, docs: DataFrame, k: int = 6, text_col: str = "text"
) -> DataFrame:
    """Learn the top-``k`` BPE merges; returns the merge table
    (merge_rank, left_sym, right_sym, merged, pair_freq) — k rows, the
    trained tokenizer model.

    Iterative by nature (each merge changes the pair statistics), so the
    driver loop collects ONE row per iteration — the argmax pair — and
    the vocabulary table stays distributed throughout.

    ONE job per iteration (r16, guide §1.2/§2.6): the argmax collect is
    the iteration's only action — it materializes the (lazily persisted)
    current vocabulary's cache as a side effect of scanning it, after
    which the parent vocabulary's cache is released. The pre-r16 loop
    ran a second ``count()`` job per iteration purely to materialize the
    next cache (2k sequential jobs for k merges, plus a wasted full
    materialization of the never-read rank-k vocabulary); fusing the
    materialization into the next argmax halves the job count with
    byte-identical merges — pair statistics are computed by the same
    plan either way. Peak cache footprint is unchanged: at most two
    vocabulary generations are pinned at any moment.
    """
    from ..cache import CACHE_LEVEL

    words = word_symbol_table(docs, text_col).persist(CACHE_LEVEL)
    prev = None
    merges: list[tuple] = []
    try:
        for rank in range(1, k + 1):
            best = (
                _pair_counts(words)
                .orderBy(F.desc("f"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            # `words` is materialized now; its parent can be released
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            pair, freq = best[0]["pair"], int(best[0]["f"])
            a, b = pair.split(" ")
            merges.append((rank, a, b, a + b, freq))
            if rank == k:
                break  # the rank-k vocabulary is never read
            replaced = F.replace(
                F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a + b} ")
            )
            nxt = words.select(
                "word",
                "freq",
                _canonical(F.split(F.trim(replaced), " +")).alias("s"),
            ).persist(CACHE_LEVEL)
            prev, words = words, nxt
    finally:
        words.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_freq bigint",
    )


def store_bpe_model(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    k: int = 6,
    text_col: str = "text",
    merges: DataFrame | None = None,
):
    """Train the BPE model ONCE and commit the merge table as a
    lakehouse artifact (the frozen-codebook pattern of
    ``pq_index.build_pq_index``): the corpus-sized word-frequency pass
    runs at TRAIN time only, and every consumer — token counting,
    compression audits, nightly batch encodes — loads the k-row merge
    table from the committed snapshot instead of re-learning it. At
    100 TB, re-learning per consuming query is the difference between
    one corpus pass per model version and one per report.

    Retrain = a new ``create`` at a new path (or ``overwrite``): the
    merge list is order-sensitive in rank, so partial updates are
    meaningless — the artifact is immutable, exactly like a PQ
    codebook. ``merges`` lets a caller commit an already-trained merge
    table (e.g. a session-memoized one) instead of training here.
    Returns the committed :class:`SnapshotTable`.
    """
    from ..sources.lakehouse import SnapshotTable

    table = SnapshotTable(spark, path)
    table.create(
        merges if merges is not None else learn_bpe_merges(spark, docs, k, text_col)
    )
    return table


def load_bpe_merges(table, version: int | None = None) -> list[tuple[str, str]]:
    """Read the stored merge table back as the rank-ordered
    ``[(left_sym, right_sym), ...]`` list :func:`apply_merges` and
    :func:`trained_token_counts` consume. k rows — a driver-side
    collect at model size, never corpus size. ``version`` time-travels
    to a historical model."""
    return [
        (r["left_sym"], r["right_sym"])
        for r in table.read(version=version)
        .orderBy("merge_rank")
        .collect()
    ]
