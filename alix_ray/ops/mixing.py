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

import pandas as pd
import ray.data


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
