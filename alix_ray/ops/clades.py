"""Correspondence-analysis factor map (SURVEY.md §2.6 Contingency/SVD).

Reference: ``util/.../maths/ContingencySvd.java:63`` + the ``/clades``
endpoint (``OpClades.java:53``) — a term × category contingency table is
turned into standardized (Pearson) residuals and factored by SVD into
2-D coordinates for both terms (rows) and categories (columns).

The contingency counts are a Ray Data groupby (distributed); the SVD
runs on the driver over the (small) top-vocabulary × category matrix —
the same shape as the reference, which factors a selected vocabulary,
not the whole lexicon.  For very large vocabularies, swap
``np.linalg.svd`` for the randomized Halko-Martinsson-Tropp sketch (the
reference ships one in ``RandomizedSvd.java:49``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..analysis import SimpleAnalyzer


def contingency(ds: ray.data.Dataset, category_col: str,
                text_col: str = "text") -> pd.DataFrame:
    """(term, category) → token count, via per-batch partial counts."""

    def partial(batch: pa.Table) -> pa.Table:
        lists = SimpleAnalyzer.tokens_arrays(batch[text_col])
        lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        owner = np.repeat(np.arange(len(lengths)), lengths)
        t = pa.table(
            {
                "term": lists.flatten(),
                "category": batch[category_col].take(pa.array(owner)),
            }
        )
        g = t.group_by(["term", "category"]).aggregate([("term", "count")])
        return pa.table({"term": g["term"], "category": g["category"],
                         "n": g["term_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["term", "category"]).aggregate(
        Sum("n", alias_name="n")
    )
    return out.to_pandas()


def correspondence_coords(cont: pd.DataFrame, top_terms: int = 100,
                          dims: int = 2):
    """Pearson residuals → SVD → row/column principal coordinates.

    Returns ``(terms_df, categories_df)`` with columns
    ``(label, dim1, dim2, weight)``.
    """
    mat = cont.pivot_table(index="term", columns="category", values="n",
                           fill_value=0, aggfunc="sum")
    # restrict to the densest vocabulary (reference selects a vocab too)
    totals = mat.sum(axis=1)
    keep = totals.sort_values(ascending=False).head(top_terms).index
    mat = mat.loc[keep]
    N = float(mat.values.sum())
    P = mat.values / N
    r = P.sum(axis=1, keepdims=True)
    c = P.sum(axis=0, keepdims=True)
    expected = r @ c
    with np.errstate(divide="ignore", invalid="ignore"):
        residuals = (P - expected) / np.sqrt(expected)
    residuals = np.nan_to_num(residuals)
    U, S, Vt = np.linalg.svd(residuals, full_matrices=False)
    dims = min(dims, len(S))
    # principal coordinates: rows scaled by 1/sqrt(row mass)
    row_coords = (U[:, :dims] * S[:dims]) / np.sqrt(np.maximum(r, 1e-12))
    col_coords = (Vt[:dims].T * S[:dims]) / np.sqrt(
        np.maximum(c.T, 1e-12)
    )
    terms_df = pd.DataFrame(
        {
            "label": mat.index,
            "dim1": row_coords[:, 0],
            "dim2": row_coords[:, 1] if dims > 1 else 0.0,
            "weight": totals.loc[mat.index].to_numpy(),
        }
    ).reset_index(drop=True)
    cats_df = pd.DataFrame(
        {
            "label": mat.columns,
            "dim1": col_coords[:, 0],
            "dim2": col_coords[:, 1] if dims > 1 else 0.0,
            "weight": mat.sum(axis=0).to_numpy(),
        }
    ).reset_index(drop=True)
    return terms_df, cats_df


def _chord_distances(profiles: np.ndarray) -> np.ndarray:
    """Chord distances after unit-L2 row normalization
    (ContingencyDistance.java chordDistances:...)."""
    sq = (profiles ** 2).sum(axis=1)
    if not np.all(np.isfinite(sq)) or (sq <= 0).any():
        bad = int(np.argmin(sq))
        raise ValueError(
            f"contingency row {bad} has no finite positive profile"
        )
    norm = profiles / np.sqrt(sq)[:, None]
    sim = np.clip(norm @ norm.T, -1.0, 1.0)
    d = np.sqrt(np.maximum(0.0, 2.0 - 2.0 * sim))
    np.fill_diagonal(d, 0.0)
    return d


def hellinger_distances(counts: np.ndarray) -> np.ndarray:
    """Hellinger distance between row profiles of a non-negative
    contingency table (ContingencyDistance.java Hellinger:24-60):
    profiles are sqrt(count/rowTotal), distances are chord distances of
    the (already unit-norm) profiles."""
    counts = np.asarray(counts, np.float64)
    if counts.ndim != 2 or counts.size == 0:
        raise ValueError("contingency table must be 2-D and non-empty")
    if (counts < 0).any():
        raise ValueError("negative contingency count")
    row_tot = counts.sum(axis=1)
    if (row_tot == 0).any():
        bad = int(np.argmin(row_tot))
        raise ValueError(f"contingency row {bad} has a zero total")
    return _chord_distances(np.sqrt(counts / row_tot[:, None]))


def positive_keyness_chord(counts: np.ndarray, scorer=None) -> np.ndarray:
    """Chord distance between profiles of positive keyness evidence
    (ContingencyDistance.java PositiveKeynessChord:70-130): each cell is
    scored row-vs-all-other-rows with a keyness scorer, negatives are
    dropped, positives square-rooted before the cosine norm."""
    from .analytics import keyness_g2

    counts = np.asarray(counts, np.float64)
    if counts.ndim != 2 or counts.size == 0:
        raise ValueError("contingency table must be 2-D and non-empty")
    if (counts < 0).any():
        raise ValueError("negative contingency count")
    if scorer is None:
        scorer = keyness_g2
    n_rows = counts.shape[0]
    if n_rows == 1:
        return np.zeros((1, 1))
    row_tot = counts.sum(axis=1)
    if (row_tot == 0).any():
        bad = int(np.argmin(row_tot))
        raise ValueError(f"contingency row {bad} has a zero total")
    col_tot = counts.sum(axis=0)
    total = counts.sum()
    profiles = np.zeros_like(counts)
    for r in range(n_rows):
        other_tot = total - row_tot[r]
        scores = scorer(counts[r], row_tot[r], col_tot - counts[r], other_tot)
        if np.isnan(scores).any():
            raise ValueError(f"keyness scorer returned NaN in row {r}")
        pos = scores > 0
        profiles[r, pos] = np.sqrt(scores[pos])
    return _chord_distances(profiles)


def randomized_svd(A: np.ndarray, dims: int, oversamples: int = 20,
                   power_iterations: int = 4, seed: int = 0x5DEECE66D):
    """Halko–Martinsson–Tropp randomized truncated SVD
    (RandomizedSvd.java:49-200): Gaussian range sampling with
    oversampling + subspace power iterations (QR-stabilized), then an
    exact SVD of the small projected matrix.  Deterministic: the test
    matrix is drawn from a fixed seed.  Returns ``(U, S, Vt)`` with
    ``dims`` components, singular values descending.

    This is the clades scale path: an exact SVD of a (vocab × parts)
    residual matrix is O(vocab·parts²); the sketch needs only
    matrix–panel products, which distribute (each Ray block computes
    its row-slice of ``A @ G``)."""
    A = np.asarray(A, np.float64)
    if A.ndim != 2:
        raise ValueError("matrix must be 2-D")
    if dims <= 0:
        raise ValueError("dims must be positive")
    if oversamples < 0 or power_iterations < 0:
        raise ValueError("oversamples and powerIterations must be non-negative")
    n_rows, n_cols = A.shape
    k = min(dims + oversamples, min(n_rows, n_cols))
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((n_cols, k))
    Y = A @ G
    Q, _ = np.linalg.qr(Y)
    for _ in range(power_iterations):
        Z, _ = np.linalg.qr(A.T @ Q)
        Q, _ = np.linalg.qr(A @ Z)
    B = Q.T @ A
    Ub, S, Vt = np.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    dims = min(dims, len(S))
    return U[:, :dims], S[:dims], Vt[:dims]
