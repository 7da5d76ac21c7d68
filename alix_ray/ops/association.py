"""Association measures for term-pair co-occurrence matrices.

Reference parity: ``util/.../AssociationMeasure.java:1-280`` — a pure
function of the four numbers (cooc count f(a,b), node marginals f(a)
and f(b), sample size N), vectorized over whole cell arrays.  Edge
conventions mirror the reference exactly:

- negative counts → NaN
- degenerate marginals / total → 0 (except LogDice → NaN when both
  marginals are 0)
- cooc == 0 → Ppmi 0, Npmi −1, LogDice −inf

``score_cooc_matrix`` applies a measure to the output of
:func:`alix_ray.ops.analytics.cooc_matrix` under the matrix-internal
marginal convention (row/col sums and grand total of the emitted
cells) — the self-contained distributional choice documented in the
reference javadoc.
"""

from __future__ import annotations

import numpy as np

_LOG2 = np.log(2.0)


def _log2(x):
    return np.log(x) / _LOG2


def pmi_bits(cooc, row, col, total):
    """log2(P(a,b) / (P(a)P(b))) — shared PMI core (callers handle the
    degenerate cases)."""
    cooc = np.asarray(cooc, np.float64)
    row = np.asarray(row, np.float64)
    col = np.asarray(col, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        return _log2(cooc * float(total) / (row * col))


def _edges(cooc, row, col, total):
    cooc = np.asarray(cooc, np.float64)
    row = np.asarray(row, np.float64)
    col = np.asarray(col, np.float64)
    nan = (cooc < 0) | (row < 0) | (col < 0)
    degenerate = (row <= 0) | (col <= 0) | (float(total) <= 0)
    return cooc, row, col, nan, degenerate


def ppmi(cooc, row, col, total):
    """Positive PMI (AssociationMeasure.java Ppmi:246-258)."""
    cooc, row, col, nan, degen = _edges(cooc, row, col, total)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.maximum(0.0, pmi_bits(cooc, row, col, total))
    out = np.where(cooc == 0, 0.0, out)
    out = np.where(degen, 0.0, out)
    return np.where(nan, np.nan, out)


def npmi(cooc, row, col, total):
    """Normalized PMI ∈ [−1, 1] (AssociationMeasure.java Npmi:187-201)."""
    cooc, row, col, nan, degen = _edges(cooc, row, col, total)
    p = cooc / float(total) if total > 0 else np.zeros_like(cooc)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = pmi_bits(cooc, row, col, total) / -_log2(p)
    out = np.where(p >= 1.0, 1.0, out)
    out = np.where(cooc == 0, -1.0, out)
    out = np.where(degen, 0.0, out)
    return np.where(nan, np.nan, out)


def logdice(cooc, row, col, total=None):
    """Collocational logDice (Rychlý 2008; AssociationMeasure.java
    LogDice:95-108): 14 + log2(2·f(a,b)/(f(a)+f(b))); −inf at 0 cooc."""
    cooc = np.asarray(cooc, np.float64)
    row = np.asarray(row, np.float64)
    col = np.asarray(col, np.float64)
    nan = (cooc < 0) | (row < 0) | (col < 0) | (row + col <= 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = 14.0 + _log2(2.0 * cooc / (row + col))
    out = np.where(cooc == 0, -np.inf, out)
    return np.where(nan, np.nan, out)


def loglikelihood(cooc, row, col, total):
    """Signed pairwise G² on the 2×2 co-occurrence table
    (AssociationMeasure.java LogLikelihood:128-170)."""
    cooc, row, col, nan, degen = _edges(cooc, row, col, total)
    total = float(total)
    nan = nan | (cooc > row) | (cooc > col) | (row > total) | (col > total)
    o11 = cooc
    o12 = row - cooc
    o21 = col - cooc
    o22 = total - row - col + cooc
    nan = nan | (o22 < 0)
    e11 = row * col / total
    e12 = row * (total - col) / total
    e21 = (total - row) * col / total
    e22 = (total - row) * (total - col) / total

    def term(o, e):
        out = np.zeros_like(o)
        m = (o > 0) & (e > 0)
        out[m] = 2.0 * o[m] * np.log(o[m] / e[m])
        return out

    g2 = term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22)
    out = np.where(o11 >= e11, g2, -g2)
    out = np.where(degen, 0.0, out)
    return np.where(nan, np.nan, out)


def pearson(cooc, row, col, total):
    """Pearson residual (o − e)/√e (AssociationMeasure.java
    Pearson:218-230) — CA inertia decomposition cell."""
    cooc, row, col, nan, degen = _edges(cooc, row, col, total)
    e = row * col / float(total) if total > 0 else np.ones_like(cooc)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = (cooc - e) / np.sqrt(e)
    out = np.where(degen, 0.0, out)
    return np.where(nan, np.nan, out)


def raw(cooc, row, col, total=None):
    """Raw co-occurrence count (AssociationMeasure.java Raw:265-274)."""
    return np.asarray(cooc, np.float64)


MEASURES = {
    "raw": raw,
    "ppmi": ppmi,
    "npmi": npmi,
    "logdice": logdice,
    "loglikelihood": loglikelihood,
    "pearson": pearson,
}


def score_cooc_matrix(pairs_df, measure: str = "ppmi"):
    """Apply an association measure to a (row, col, n) pair-count table
    using matrix-internal marginals (row/col sums, grand total of the
    emitted cells).  Returns the frame with an added ``score`` column."""
    import pandas as pd

    df = pairs_df if isinstance(pairs_df, pd.DataFrame) else pairs_df.to_pandas()
    fn = MEASURES[measure]
    row_m = df.groupby("row")["n"].sum()
    col_m = df.groupby("col")["n"].sum()
    total = float(df["n"].sum())
    out = df.copy()
    out["score"] = fn(
        df["n"].to_numpy(np.float64),
        row_m.reindex(df["row"]).to_numpy(np.float64),
        col_m.reindex(df["col"]).to_numpy(np.float64),
        total,
    )
    return out
