"""Filter queries: permissive year-range ∧ category conjunction
(reference: ``web/.../Op.java:380-460`` yearQuery/typeQuery semantics).

The year rules are the reference's lenient-UI behavior, exactly:
swap an inverted range, resolve open bounds to the corpus bounds,
clamp to the corpus bounds, collapse to no-filter when the clamped
range covers the whole corpus, and to no-filter when it collapses
past itself.  The result is a boolean doc mask usable as
``BM25Index.search_exact(..., filter_mask=...)`` or as a Dataset
predicate.
"""

from __future__ import annotations

import numpy as np

_OPEN_MIN = -(2**31)
_OPEN_MAX = 2**31 - 1


def year_range(start: int | None, end: int | None, corpus_min: int,
               corpus_max: int):
    """→ resolved ``(start, end)`` or ``None`` for "no filter"."""
    s = _OPEN_MIN if start is None else int(start)
    e = _OPEN_MAX if end is None else int(end)
    if s == _OPEN_MIN and e == _OPEN_MAX:
        return None
    if s != _OPEN_MIN and e != _OPEN_MAX and s > e:
        s, e = e, s  # swap inverted — lenient with the UI
    if s == _OPEN_MIN:
        s = corpus_min
    if e == _OPEN_MAX:
        e = corpus_max
    s = max(s, corpus_min)
    e = min(e, corpus_max)
    if s == corpus_min and e == corpus_max:
        return None  # not a filter
    if s > e:
        return None  # collapsed out of corpus
    return (s, e)


def year_mask(years: np.ndarray, start: int | None, end: int | None):
    """Boolean doc mask, or None when the range is not a filter."""
    years = np.asarray(years)
    lo_hi = year_range(start, end,
                       int(years.min()) if years.size else 0,
                       int(years.max()) if years.size else 0)
    if lo_hi is None:
        return None
    lo, hi = lo_hi
    return (years >= lo) & (years <= hi)


def type_mask(types: np.ndarray, wanted: str | None):
    """Category equality mask (typeQuery analog); None = no filter."""
    if wanted is None:
        return None
    return np.asarray(types) == wanted


def conjoin(*masks):
    """AND of the non-None masks; None when nothing filters
    (the filterQuery conjunction builder, Op.java:310-339)."""
    live = [m for m in masks if m is not None]
    if not live:
        return None
    out = live[0].copy()
    for m in live[1:]:
        out &= m
    return out
