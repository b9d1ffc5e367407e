"""Sparse text retrieval: relational BM25 over an inverted index.

The reference's recommendation app ranks documents by TF-IDF cosine
(``streamlit/pages/1_recommendation_app.py:38-98``); BM25 is the
retrieval-grade counterpart every training-data pipeline also needs —
benchmark-similarity scoring for decontamination triage, DSIR-style
data selection, and "find corpus documents like this seed set".

Everything is expressed as DataFrame ops (no UDFs): the inverted index
is the exploded (doc, token, tf) table, the scoring join is an
equi-join on token, and the only full-corpus shuffles are keyed on the
query vocabulary — pruned FIRST, so posting lists for tokens no query
mentions never leave the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..cache import registered_persist


def bm25_topk(
    docs: DataFrame,
    query_pred,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` BM25 matches for every query document: (query_id,
    doc_id, bm25, rk). Query documents are the rows matching
    ``query_pred`` (a bounded seed set — benchmark prompts, a topic
    sample); each is scored against every OTHER corpus document using
    the Okapi/Lucene formulation::

        idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
        w(t, d)   = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        bm25(q,d) = sum over distinct tokens t of q present in d

    Rankings order by ROUNDED score (4 dp) with a doc-id tie-break so
    both engines of the differential gate agree bit-for-bit.

    Scale shape (the 100 TB contract):

    - document lengths are ``array_size(split(...))`` computed in the
      scan projection — no explode, no shuffle;
    - corpus stats (N, avgdl) are a 1-row broadcast;
    - the query vocabulary (distinct tokens of the bounded seed set) is
      broadcast, and the exploded corpus token stream is semi-joined
      against it BEFORE the tf aggregate — the posting-list shuffle
      carries only query-vocabulary tokens, not the corpus vocabulary;
    - df and the per-token idf table are |query vocab| rows, broadcast
      into the scoring join;
    - the final aggregate and top-k window shuffle on (query_id,
      candidate), proportional to matched postings only.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("w"),
    ).withColumn("dl", F.array_size("w"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )

    qterms = (
        base.filter(query_pred)
        .select(F.col("doc_id").alias("query_id"), F.explode("w").alias("token"))
        .distinct()
    )
    qvocab = qterms.select("token").distinct()

    # corpus postings, pruned to the query vocabulary BEFORE aggregating:
    # the (doc, token) shuffle never carries a token no query mentions
    tf = registered_persist(
        base.select("doc_id", "dl", F.explode("w").alias("token"))
        .join(F.broadcast(qvocab), "token")
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )  # read twice (df aggregate + scoring join): pruned, so small
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_w = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(term_w), 4).alias("bm25"))
    )
    w_ = W.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return scored.withColumn("rk", F.row_number().over(w_)).filter(
        F.col("rk") <= k
    )
