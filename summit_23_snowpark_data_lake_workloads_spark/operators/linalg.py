"""Distributed linear algebra over embedding columns: one-pass moment
accumulation (count / sum / Gram matrix) and PCA on top of it.

The scale shape: raw vectors NEVER move. Each partition folds its rows
into a single (n, sum, Gram) partial inside an Arrow ``mapInPandas``
pass — constant memory per partition, d*(d+1)+1 doubles — and only
``numPartitions`` partial rows reach the driver, where the d x d
covariance eigendecomposition is microseconds of numpy. At 100 TB this
is one full scan with zero shuffles; the reduce tree is
partition-count-sized, independent of row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def moment_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(n, s, g): one row PER NON-EMPTY PARTITION with the partition's
    vector count, element-wise sum, and flattened Gram-matrix sum
    (sum of x xᵀ), accumulated in float64."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype="float64")
            n += m.shape[0]
            bs = m.sum(axis=0)
            bg = m.T @ m
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        gen, "n bigint, s array<double>, g array<double>"
    )


def pca_spectrum(df: DataFrame, vec_col: str = "embedding") -> dict:
    """Full PCA spectrum of the population covariance of an embedding
    column: ``{"n": int, "dim": int, "eigvals": ndarray (desc),
    "trace": float}``. One distributed pass (see
    :func:`moment_partials`); the driver reduces partition partials and
    eigendecomposes the d x d covariance."""
    partials = moment_partials(df, vec_col).collect()
    if not partials:
        raise ValueError("pca_spectrum: no vectors")
    n = sum(r["n"] for r in partials)
    s = np.sum([np.asarray(r["s"]) for r in partials], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in partials], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    eig = np.linalg.eigvalsh(cov)[::-1]  # descending
    return {"n": int(n), "dim": int(d), "eigvals": eig, "trace": float(np.trace(cov))}
