"""Vector (embedding) column helpers over ``array<float>`` columns.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions —
JVM-side, no Python boundary — for the similarity-search operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays (accumulated in double, index order —
    matching the relational/DuckDB evaluation order for oracle parity)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (double accumulation, index order — oracle-
    portable like :func:`dot`)."""
    sq = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def sign_matrix(k: int, d: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 projection matrix (k rows x d cols) derived from
    md5 — engine-independent, so a SQL oracle can embed the SAME matrix
    as a literal. Rademacher entries satisfy the Johnson-Lindenstrauss
    guarantee (Achlioptas 2003) with no float RNG involved."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def random_projection(c: Column | str, k: int, d: int, seed: str = "jl") -> Column:
    """Project a d-dim embedding to k dims: ``y_j = <x, R_j> / sqrt(k)``
    with the deterministic sign matrix. The matrix enters the plan as k
    literal arrays, so the whole projection is codegen'd arithmetic —
    a pure map at any scale, no shuffle, no Python workers. Distances
    are preserved within (1±eps) for k = O(log n / eps²)."""
    col = F.col(c) if isinstance(c, str) else c
    r = sign_matrix(k, d, seed)
    scale = float(k) ** 0.5
    return F.array(
        *[
            (dot(col, F.array(*[F.lit(float(v)) for v in row])) / F.lit(scale)).alias(
                f"p{j}"
            )
            for j, row in enumerate(r)
        ]
    )
