"""Corpus-mixing / quota operators for training-data assembly.

A web corpus over-represents a few hot domains; training mixes cap
how much any one source contributes.  ``quota_cap`` is that cap as a
Ray Data operator: keep the best ``n`` docs per key under a
deterministic ordering.

Scale shape: the shuffle-avoidance identity ``global top-n per key ⊆
union of per-batch top-n per key`` lets a map-side pre-prune discard
everything else BEFORE the groupby — the exchange then moves at most
``n × distinct_keys_per_batch`` rows per batch instead of the whole
corpus (the combine-before-shuffle discipline used across this repo).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

MIX_RESOLUTION = 1_000_000


def _prune(df: pd.DataFrame, key_col: str, n: int,
           by: list[str], ascending: list[bool]) -> pd.DataFrame:
    if df.empty:
        return df
    return (
        df.sort_values(by, ascending=ascending, kind="stable")
        .groupby(key_col, sort=False)
        .head(n)
    )


def quota_cap(ds: ray.data.Dataset, key_col: str = "source", n: int = 5,
              by: tuple = ("n_chars", "doc_id"),
              ascending: tuple = (False, True)) -> ray.data.Dataset:
    """Top-``n`` rows per ``key_col`` under ``ORDER BY`` ``by`` with
    the given directions (default: longest docs first, doc_id breaking
    ties deterministically) — ``row_number() OVER (PARTITION BY key
    ORDER BY …) <= n`` as a two-step distributed operator:
    map-side pre-prune (sound per the subset identity above), then the
    per-key exact cap after the grouped exchange."""
    by, ascending = list(by), list(ascending)

    pruned = ds.map_batches(
        lambda df: _prune(df, key_col, n, by, ascending),
        batch_format="pandas",
    )
    return pruned.groupby(key_col).map_groups(
        lambda df: _prune(df, key_col, n, by, ascending),
        batch_format="pandas",
    )


def mix_sample(ds: ray.data.Dataset, weights: dict[str, float],
               id_col: str = "doc_id",
               key_col: str = "source") -> ray.data.Dataset:
    """Deterministic weighted subsampling per key — the training-mix
    "keep X% of source S" step.  Row kept iff
    ``md5_number_lower('mix:' || id) % RESOLUTION < weight*RESOLUTION``
    (integer threshold compare, never a float), so membership is a
    pure function of the row id: reproducible across runs, cluster
    sizes, and partitionings, with no shuffle and no RNG state — and
    bit-identical to the DuckDB oracle expression.  Keys absent from
    ``weights`` default to keep-everything."""
    # round, not int(): see hash_split — int() truncates float products
    # of exact decimal weights one below the oracle's DECIMAL bound
    thresholds = {k: round(w * MIX_RESOLUTION) for k, w in weights.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        from .dedup import md5_lower64

        h = md5_lower64([f"mix:{i}" for i in df[id_col]]) % MIX_RESOLUTION
        thr = df[key_col].map(thresholds).fillna(MIX_RESOLUTION).to_numpy()
        return df.loc[np.asarray(h, np.int64) < thr]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(ds: ray.data.Dataset, fractions: dict[str, float],
               id_col: str = "doc_id",
               salt: str = "split") -> ray.data.Dataset:
    """Deterministic train/val/test assignment: the splits partition
    the md5 hash line into contiguous integer ranges in the given
    order (fractions must sum to 1).  Pure function of the row id —
    reproducible across runs, cluster sizes, and partitionings; no
    shuffle, no RNG state; every row lands in exactly one split.
    Adds a ``split`` column (``mix_sample``'s hashing convention, so
    the DuckDB oracle reproduces it bit-for-bit)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    # round, not int(): float products of exact decimal fractions can
    # land one ulp below the intended integer bound
    # (int(0.0157 * 1e6) == 15699)
    bounds = np.cumsum([round(fractions[n] * MIX_RESOLUTION)
                        for n in names])
    bounds[-1] = MIX_RESOLUTION  # absorb integer-truncation remainder

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df = df.copy()
            df["split"] = pd.Series([], dtype="object")
            return df
        from .dedup import md5_lower64

        h = md5_lower64([f"{salt}:{i}" for i in df[id_col]]) % MIX_RESOLUTION
        idx = np.searchsorted(bounds, np.asarray(h, np.int64), side="right")
        df = df.copy()
        df["split"] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas")
