"""Distributed corpus statistics.

:func:`exact_quantiles` — EXACT rank-based quantiles of a column
without sorting or materializing it: one pass of per-batch
``value_counts`` partials, one tiny ``groupby(value).sum`` exchange,
driver cumsum over the distinct-value histogram.  The quantile
definition is pinned to the classic lower quantile — the smallest
value whose cumulative count reaches ``ceil(q·n)`` — expressed
identically in the DuckDB oracle as ``max`` over the first
``ceil(q·n)`` ordered rows, so both sides agree by construction
(no dependence on any engine's quantile interpolation flavor).

Scale shape: shuffle bytes ∝ distinct values per batch, driver state
∝ global distinct values.  Quality-metric columns (token counts,
ratios rounded to 6 decimals, year buckets) have bounded domains at
any corpus size; for genuinely unbounded double columns the histogram
guard raises and the caller widens ``max_distinct`` or pre-buckets —
an explicit failure, never a silent approximation.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    max_distinct: int = 5_000_000) -> "pd.DataFrame":
    """Rows ``(q, value, rank, n)``: for each quantile fraction the
    exact column value at rank ``ceil(q·n)`` (1-based) among all
    non-null values in ascending order."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(batch[col]))
        return pa.table({
            "value": vc.field(0),
            "cnt": vc.field(1).cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("value").sum("cnt").to_pandas())
    if len(hist) > max_distinct:
        raise ValueError(
            f"{len(hist)} distinct values exceeds max_distinct="
            f"{max_distinct}; pre-bucket the column or raise the bound")
    if len(hist) == 0 or "value" not in hist.columns:
        raise ValueError(f"no non-null values in column {col!r}")
    hist = hist.sort_values("value").reset_index(drop=True)
    counts = hist["sum(cnt)"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    rows = []
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile fraction out of (0, 1]: {q}")
        # exact-decimal rank: float64 q·n can overshoot an exact
        # integer (0.55·100 = 55.000000000000007 → ceil 56), while the
        # SQL oracle's DECIMAL arithmetic is exact — Fraction(str(q))
        # pins the decimal literal the caller wrote
        k = max(1, math.ceil(Fraction(str(q)) * n))
        i = int(np.searchsorted(cum, k, side="left"))
        rows.append({"q": q, "value": hist["value"].iloc[i],
                     "rank": k, "n": n})
    return pd.DataFrame(rows)


def grouped_quantiles(ds: ray.data.Dataset, group_col: str, col: str,
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                      max_cells: int = 5_000_000) -> "pd.DataFrame":
    """Per-group exact quantiles — :func:`exact_quantiles` stratified
    by ``group_col`` (the per-SOURCE quality-threshold primitive: a
    curation pipeline sets a different keep bar per domain/source).

    Identical shape: per-batch (group, value) count partials, one
    multi-key ``groupby((group, value)).sum`` exchange of slim rows,
    driver cumsum per group.  Driver state ∝ Σ per-group distinct
    values — the same bounded-histogram assumption, enforced by
    ``max_cells``.  Rows: ``(group, q, value, rank, n)`` with the same
    pinned lower-quantile rank ``ceil(q·n_group)``."""
    import pandas as pd

    # a NULL group key is a stratum of its own (SQL GROUP BY
    # semantics), but Ray's sort shuffle cannot order None against
    # strings — string group keys ride the shuffle under a sentinel
    sentinel = "\x00<null>"

    def partial(batch: pa.Table) -> pa.Table:
        gcol = batch[group_col]
        gtype = gcol.type
        if pa.types.is_string(gtype) or pa.types.is_large_string(gtype):
            gcol = pc.fill_null(gcol, sentinel)
        t = pa.table({"g": gcol, "value": batch[col]})
        t = t.filter(pc.is_valid(t["value"]))
        agg = t.group_by(["g", "value"]).aggregate([("value", "count")])
        return pa.table({"g": agg["g"], "value": agg["value"],
                         "cnt": agg["value_count"].cast(pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "value"]).sum("cnt").to_pandas())
    # map the sentinel back for ANY string-typed group column — the
    # Ray→pandas conversion may yield object, pandas-string or
    # ArrowDtype depending on version, and the sentinel must never
    # leak as a literal group name
    if not pd.api.types.is_numeric_dtype(hist["g"]):
        hist["g"] = hist["g"].astype(object)
        hist.loc[hist["g"] == sentinel, "g"] = None
    if len(hist) > max_cells:
        raise ValueError(
            f"{len(hist)} (group, value) cells exceed max_cells="
            f"{max_cells}; pre-bucket the column or raise the bound")
    if len(hist) == 0:
        raise ValueError(f"no non-null values in column {col!r}")
    # stable two-pass sort so a NULL group keeps correct value order
    # (SQL's GROUP BY emits the NULL stratum — this must too)
    hist = (hist.sort_values("value")
            .sort_values("g", kind="stable", na_position="last")
            .reset_index(drop=True))
    rows = []
    for g, sub in hist.groupby("g", sort=True, dropna=False):
        counts = sub["sum(cnt)"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs:
            if not 0.0 < q <= 1.0:
                raise ValueError(f"quantile fraction out of (0, 1]: {q}")
            k = max(1, math.ceil(Fraction(str(q)) * n))
            i = int(np.searchsorted(cum, k, side="left"))
            rows.append({group_col: g, "q": q,
                         "value": sub["value"].iloc[i], "rank": k, "n": n})
    return pd.DataFrame(rows)
