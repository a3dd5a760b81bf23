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
    "label int, n_vectors long, dim int, top_eigenvalue double, trace double, "
    "trace_q double, sum_eig_ok boolean, frob_ok boolean, "
    "eig_nonneg boolean, top_le_trace boolean"
)

# Quantization scale for the exact-integer trace anchor (trace_q): the
# embedding components are quantized to s = floor(x*1e6 + 0.5) — an
# IEEE-exact sequence both Spark-side numpy and DuckDB reproduce
# bit-identically (np.rint/ROUND would diverge on half-way ties:
# half-even vs half-away).
_TRACE_SCALE = 1_000_000


def _spectral_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per group: covariance spectrum of the stacked embedding matrix,
    plus the oracle-checkable certificate (VERDICT r08 #3):

    - ``trace_q`` — n·(n-1)·SCALE² times the sample-covariance trace,
      computed EXACTLY over quantized components as arbitrary-precision
      Python ints: sum over dims of (n·Σs² − (Σs)²). Integer sums are
      order-independent, so the value is identical regardless of row
      arrival order, and DuckDB recomputes it with HUGEINT arithmetic —
      a data-anchored hash-level check that the covariance the
      eigensolver saw is the covariance of the actual rows.
    - four invariant booleans tying the eigendecomposition to the
      matrix: Σλ = tr(C), Σλ² = ‖C‖_F², λ_min ≥ 0 (PSD), λ_max ≤ tr(C)
      — each within a float tolerance that absorbs summation-order
      jitter. Any eigensolver/covariance defect flips a boolean and
      fails the oracle hash.

    Module-level so cloudpickle serializes by reference to the shipped
    package zip (see session._ship_package)."""
    import numpy as np

    mat = np.array([list(v) for v in pdf["embedding"]], dtype="float64")
    n, dim = mat.shape
    # exact-integer trace anchor (order-independent at any group size:
    # Python ints never overflow; emitted as the correctly-rounded
    # double of the exact integer, which DuckDB's HUGEINT→DOUBLE cast
    # reproduces)
    scaled = np.floor(mat * float(_TRACE_SCALE) + 0.5)
    if scaled.size and float(np.abs(scaled).max()) >= 2.0**63:
        # .astype('int64') past int64 range is silent wraparound —
        # trace_q would diverge from DuckDB's (erroring) CAST with no
        # signal. Components that large mean the quantization scale is
        # wrong for this data; fail the task loudly instead.
        raise ValueError(
            "label_spectral_stats: |component|*1e6 exceeds int64 — "
            "embedding values too large for the trace_q quantization"
        )
    s = scaled.astype("int64")
    max_abs = int(np.abs(s).max()) if s.size else 0
    if n * max_abs * max_abs < 2**62:  # vectorized path provably exact
        # (covers s1 too: max_abs >= 1 implies n*max_abs <= n*max_abs²)
        s1 = [int(v) for v in s.sum(axis=0, dtype="int64")]
        s2 = [int(v) for v in (s * s).sum(axis=0, dtype="int64")]
    else:  # arbitrary-precision fallback for huge/wide groups — BOTH
        # sums (r9 review: the first cut left s1 on the int64 path,
        # which wraps exactly when this branch is taken)
        s1 = [int(sum(int(x) for x in col)) for col in s.T]
        s2 = [int(sum(int(x) * int(x) for x in col)) for col in s.T]
    trace_q = float(sum(n * b - a * a for a, b in zip(s1, s2)))
    if n < 2:
        top, trace = 0.0, 0.0
        ok = [True, True, True, True]
    else:
        cov = np.cov(mat, rowvar=False)
        eig = np.linalg.eigvalsh(cov)  # ascending, deterministic
        top, trace = float(eig[-1]), float(np.trace(cov))
        frob2 = float((cov * cov).sum())
        tol = 1e-8 * max(1.0, abs(trace), frob2)
        ok = [
            abs(float(eig.sum()) - trace) <= tol,
            abs(float((eig * eig).sum()) - frob2) <= tol,
            float(eig[0]) >= -tol,
            top <= trace + tol,
        ]
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "n_vectors": [n],
            "dim": [dim],
            "top_eigenvalue": [round(top, 6)],
            "trace": [round(trace, 6)],
            "trace_q": [trace_q],
            "sum_eig_ok": [ok[0]],
            "frob_ok": [ok[1]],
            "eig_nonneg": [ok[2]],
            "top_le_trace": [ok[3]],
        }
    )


def label_spectral_stats(embeddings: DataFrame) -> DataFrame:
    """DataFrame[label, n_vectors, dim, top_eigenvalue, trace] — one row
    per label cell. groupBy().applyInPandas: one shuffle on label, then
    embarrassingly parallel numpy per group."""
    return embeddings.select("label", "embedding").groupBy("label").applyInPandas(
        _spectral_stats, SPECTRAL_SCHEMA
    )
