"""Iterative graph algorithms as fixed-iteration DataFrame plans.

PageRank here is the third member of the engine's iterative family
(alongside large-star/small-star connected components in
``operators/dedup.py`` and the unrolled-Lloyd k-means in
``operators/similarity.py``), built on the same two rules that make
those gate-exact:

1. **Fixed, unrolled iterations.** A convergence loop needs a
   driver-side test per round; a FIXED iteration count is a pure
   static plan both engines can replay. Production runs pick the
   round count from the graph's diameter budget (10-20 for web-scale
   per the original paper); the oracle unrolls the same count.

2. **Integer fixed-point arithmetic.** Float PageRank sums
   contributions in nondeterministic order — cross-engine hashes
   would flake sub-ULP. Ranks are BIGINT micro-units
   (``RANK_SCALE`` per node of initial mass) and the damping step is
   ``contrib(u) = (NUM_D * r(u)) div (DEN_D * outdeg(u))`` with
   d = NUM_D/DEN_D — integer division, exact and order-independent
   on both engines. The floor-rounding loses < 1 micro-unit per edge
   per round (documented semantics, not an approximation bug).

Dangling nodes (no out-edges) keep receiving mass but forward none —
the standard "dropped dangling mass" simplification; totals therefore
shrink slightly per round, which is fine for RANKING use.

Scale: each iteration is one join (ranks x edges on src — both sides
hash-partitioned on the same key, so AQE reuses the exchange) plus one
groupBy(dst) sum — k iterations = k shuffles of |edges| contribution
rows, never an adjacency matrix. Edges and out-degrees are computed
once and shared through the session cache registry
(cache.registered_persist): a bare re-scan per iteration would read
the fact table k times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import registered_persist

#: initial rank mass per node, in micro-units (fixed-point scale)
RANK_SCALE = 10**12

#: damping d = NUM_D / DEN_D = 0.85 as an exact rational
NUM_D, DEN_D = 17, 20


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over directed ``edges`` (duplicate edges
    act as weights). Returns ``(node, rank)`` with BIGINT micro-unit
    ranks — compare/order them; divide by :data:`RANK_SCALE` for the
    conventional value.

    Headroom: the two widest intermediates — ``NUM_D * r(u)`` (<= 17x
    total mass) and the per-node contribution SUM (<= total mass) —
    both compute in DECIMAL(38,0), so the plan that ships is the
    >500k-node plan: per-node ranks are bounded by total mass
    ``n_nodes * RANK_SCALE`` and stay BIGINT-exact to ~9e6 nodes at the
    default scale (past that, lower ``RANK_SCALE`` — ranks are
    micro-units, the precision is yours to spend). The DuckDB oracle
    mirrors with HUGEINT, so the widening itself is hash-gated.
    """
    e = registered_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    nodes = registered_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = registered_persist(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    )

    # non-normalized convention: every node starts with RANK_SCALE and
    # the teleport term is (1-d) * RANK_SCALE — no global node count
    # needed anywhere (nothing touches the driver).
    ranks = nodes.withColumn("rank", F.lit(RANK_SCALE).cast("bigint"))
    tele_units = ((DEN_D - NUM_D) * RANK_SCALE) // DEN_D  # exact: 20 | 1e12

    for _i in range(iterations):
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "inner")
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                # DECIMAL(38,0) multiply: the 17x-mass intermediate that
                # would overflow BIGINT first at large n
                F.expr(
                    f"(CAST({NUM_D} AS DECIMAL(38,0)) * rank)"
                    f" div ({DEN_D} * outdeg)"
                ).alias("contrib"),
            )
        )
        ranks = (
            nodes.join(
                contribs.groupBy("node").agg(
                    F.sum(F.col("contrib").cast("decimal(38,0)")).alias("_in")
                ),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(tele_units).cast("bigint")
                    + F.coalesce(F.col("_in"), F.lit(0)).cast("bigint")
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str, iterations: int = 3
) -> str:
    """DuckDB replay: unrolled CTE per iteration, same integer
    fixed-point updates. ``edges_sql`` must yield columns
    ``src, dst``."""
    tele = ((DEN_D - NUM_D) * RANK_SCALE) // DEN_D
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, {RANK_SCALE}::BIGINT AS rank FROM nodes)",
    ]
    for i in range(iterations):
        ctes.append(f"""
        r{i + 1} AS (
            SELECT n.node,
                   ({tele}::BIGINT + coalesce(c.inmass, 0))::BIGINT AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node,
                       sum(({NUM_D}::HUGEINT * r.rank)
                           // ({DEN_D} * o.outdeg))
                           AS inmass
                FROM r{i} r JOIN outdeg o ON r.node = o.src
                            JOIN e ON e.src = r.node
                GROUP BY e.dst
            ) c ON n.node = c.node
        )""")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iterations}"
    )
