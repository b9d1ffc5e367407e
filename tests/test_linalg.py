"""PCA spectrum vs a direct numpy reference on collected vectors."""

from __future__ import annotations

import numpy as np
import pytest

from summit_23_snowpark_data_lake_workloads_spark.operators.linalg import (
    moment_partials,
    pca_spectrum,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

from .conftest import SF_DIR


def test_pca_matches_numpy(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    spec = pca_spectrum(emb, "embedding")

    m = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype="float64",
    )
    cov = np.cov(m, rowvar=False, bias=True)
    want = np.linalg.eigvalsh(cov)[::-1]

    assert spec["n"] == m.shape[0]
    assert spec["dim"] == m.shape[1]
    np.testing.assert_allclose(spec["eigvals"], want, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(spec["trace"], np.trace(cov), rtol=1e-10)


def test_moment_partials_bounded_rows(spark):
    """One output row per non-empty partition — the driver reduce is
    partition-count-sized regardless of row count."""
    emb = read_table(spark, SF_DIR, "embeddings").repartition(7)
    rows = moment_partials(emb, "embedding").collect()
    assert 0 < len(rows) <= 7
    assert sum(r["n"] for r in rows) == emb.count()
    d = len(rows[0]["s"])
    assert all(len(r["g"]) == d * d for r in rows)


def test_pca_synthetic_known_spectrum(spark):
    """A rank-1 + isotropic-noise-free synthetic: data on one line has
    exactly one nonzero eigenvalue equal to the line's variance."""
    rng = np.random.RandomState(7)
    coef = rng.randn(50)
    direction = np.array([3.0, 4.0]) / 5.0
    pts = np.outer(coef, direction)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, embedding array<float>",
    )
    spec = pca_spectrum(df, "embedding")
    want_var = np.var(np.array(pts, dtype="float32").astype("float64") @ direction)
    assert spec["dim"] == 2
    np.testing.assert_allclose(spec["eigvals"][0], want_var, rtol=1e-5)
    assert abs(spec["eigvals"][1]) < 1e-9


def test_pca_empty_raises(spark):
    df = spark.createDataFrame([], "id long, embedding array<float>")
    with pytest.raises(ValueError):
        pca_spectrum(df, "embedding")
