"""Grouped-map (applyInPandas) ML statistics — the per-group extension
point for math the built-in aggregates can't express.

The discipline: built-ins first (regression/covariance/percentiles all
have JVM aggregates — see queries using regr_* and corr), and
applyInPandas ONLY where the per-group computation is genuinely
non-relational. The example here is a spectral statistic: the top
eigenvalue of each label-cell's embedding covariance (a 64×64 eigen
decomposition per group — no SQL form). Arrow ships each group to one
Python worker as a pandas frame; groups must individually fit in
memory, which per-label embedding cells do by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SPECTRAL_SCHEMA = (
    "label int, n_vectors long, dim int, top_eigenvalue double, trace double"
)


def _spectral_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per group: covariance spectrum of the stacked embedding matrix.
    Module-level so cloudpickle serializes by reference to the shipped
    package zip (see session._ship_package)."""
    import numpy as np

    mat = np.array([list(v) for v in pdf["embedding"]], dtype="float64")
    n, dim = mat.shape
    if n < 2:
        top, trace = 0.0, 0.0
    else:
        cov = np.cov(mat, rowvar=False)
        eig = np.linalg.eigvalsh(cov)  # ascending, deterministic
        top, trace = float(eig[-1]), float(np.trace(cov))
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "n_vectors": [n],
            "dim": [dim],
            "top_eigenvalue": [round(top, 6)],
            "trace": [round(trace, 6)],
        }
    )


def label_spectral_stats(embeddings: DataFrame) -> DataFrame:
    """DataFrame[label, n_vectors, dim, top_eigenvalue, trace] — one row
    per label cell. groupBy().applyInPandas: one shuffle on label, then
    embarrassingly parallel numpy per group."""
    return embeddings.select("label", "embedding").groupBy("label").applyInPandas(
        _spectral_stats, SPECTRAL_SCHEMA
    )
