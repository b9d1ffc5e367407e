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
