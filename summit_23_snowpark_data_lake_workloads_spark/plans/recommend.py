"""The recommendation workflow (SURVEY §2.11 Q2) — the full semantics of
``1_recommendation_app.py:38-98``, distributed:

1. product catalog = window-deduped master (TITLE != 'N/A', as the app
   filters at ``:72,97``);
2. product-to-product similarity = TF-IDF cosine over titles (the app's
   ``TfidfVectorizer(TITLE + ' _XYZ_ ' + PRODUCT_ID)`` becomes the
   token self-join formulation — no O(n²) driver matrix);
3. per customer: rank similar products to what they bought, EXCLUDING
   products already bought, top-n per MAIN_CATEGORY.

Scale: purchases join similarity on product id (shuffle on a hash key),
the anti-join removes bought items before ranking, and the final window
partitions by (customer, category) — no step is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.similarity import tfidf_cosine_topk
from .curate import build_product_master


def product_similarity(
    prod_master: DataFrame, k: int = 10, query_pred=None
) -> DataFrame:
    """(query_id=PRODUCT, neighbor_id=PRODUCT, cos_sim, rk) over TF-IDF of
    ``TITLE || ' _XYZ_ ' || PRODUCT`` — the app's exact vectorizer input
    (``1_recommendation_app.py:47``)."""
    docs = prod_master.select(
        F.col("PRODUCT").alias("doc_id"),
        F.concat_ws(" _XYZ_ ", "TITLE", "PRODUCT").alias("text"),
    )
    return tfidf_cosine_topk(docs, k=k, query_pred=query_pred)


def recommend(
    purchases: DataFrame,
    prod_feed: DataFrame,
    top_n: int = 3,
    sim_k: int = 10,
) -> DataFrame:
    """Per-customer recommendations: (CUSTOMER_ID, MAIN_CATEGORY,
    PRODUCT, score, rn).

    ``purchases``: rows with CUSTOMER_ID, PRODUCT_ID.
    ``prod_feed``: the event-grained marketplace feed (deduped here).
    """
    master = build_product_master(prod_feed).filter(F.col("TITLE") != "N/A")
    sims = product_similarity(master, k=sim_k)

    bought = purchases.select("CUSTOMER_ID", F.col("PRODUCT_ID").alias("PRODUCT")).distinct()
    # candidates: products similar to anything the customer bought
    cands = (
        bought.join(sims, bought.PRODUCT == sims.query_id)
        .select(
            "CUSTOMER_ID",
            F.col("neighbor_id").alias("REC_PRODUCT"),
            F.col("cos_sim").alias("score"),
        )
        .groupBy("CUSTOMER_ID", "REC_PRODUCT")
        .agg(F.max("score").alias("score"))
    )
    # exclude already-bought (the app's isin-filter, `:88`) — anti join
    not_bought = cands.join(
        bought.withColumnsRenamed({"PRODUCT": "REC_PRODUCT"}),
        ["CUSTOMER_ID", "REC_PRODUCT"],
        "left_anti",
    )
    # per-category top-n (the app's per-category client sort, `:79-82`)
    with_cat = not_bought.join(
        F.broadcast(master.select(F.col("PRODUCT").alias("REC_PRODUCT"), "MAIN_CATEGORY")),
        "REC_PRODUCT",
    )
    w = W.partitionBy("CUSTOMER_ID", "MAIN_CATEGORY").orderBy(
        F.desc("score"), "REC_PRODUCT"
    )
    return (
        with_cat.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            "CUSTOMER_ID",
            "MAIN_CATEGORY",
            F.col("REC_PRODUCT").alias("PRODUCT"),
            "score",
            "rn",
        )
    )
