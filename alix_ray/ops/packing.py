"""Sequence packing offsets — assign every document its byte-exact
position in the concatenated token stream that training dataloaders
consume (docs concatenated in doc_id order, cut into fixed
``seq_len``-token windows; GPT-style pretraining packing).

The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM over per-doc
token counts, done hierarchically so nothing global ever materializes:

1. slim pass: per-doc token counts + doc-range shard id
   (``doc_id // shard_size`` — doc ids are dense by construction of
   the docs stage, so shards are balanced);
2. per-shard totals (tiny: one row per shard) → driver exclusive scan
   over shard totals → broadcast base-offset table;
3. ``groupby(shard)`` finishes the scan inside each shard (vectorized
   in-shard cumsum + its shard's base).

Shuffle cost is one groupby of slim (doc_id, n_tokens) rows; the
driver holds only O(n_shards) values.  Deterministic by construction —
same output for any partitioning or cluster size.

Oracle: DuckDB window cumsum (``queries.py q_pack_offsets``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..analysis import SimpleAnalyzer


def pack_offsets(ds: ray.data.Dataset, seq_len: int = 2048,
                 text_col: str = "text", id_col: str = "doc_id",
                 shard_size: int = 1_000_000) -> ray.data.Dataset:
    """Rows ``(doc_id, n_tokens, offset, chunk_id, chunk_pos)`` where
    ``offset`` is the exclusive prefix sum of token counts in doc_id
    order, ``chunk_id = offset // seq_len`` the training window the
    doc STARTS in, and ``chunk_pos`` its position inside that window
    (docs may span windows — the dataloader's concat semantics)."""

    def counts(batch: pa.Table) -> pa.Table:
        lists = SimpleAnalyzer.tokens_arrays(batch[text_col])
        n = pc.list_value_length(lists).cast(pa.int64())
        ids = batch[id_col].cast(pa.int64())
        shard = pc.divide(ids, shard_size)
        return pa.table({id_col: ids, "n_tokens": n, "shard": shard})

    slim = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # per-shard totals → driver exclusive scan (O(n_shards) rows)
    totals = slim.groupby("shard").sum("n_tokens").to_pandas() \
        .sort_values("shard")
    shard_ids = totals["shard"].to_numpy(np.int64)
    base = np.concatenate(
        ([0], np.cumsum(totals["sum(n_tokens)"].to_numpy(np.int64))[:-1]))
    base_ref = ray.put({int(s): int(b) for s, b in zip(shard_ids, base)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = g.sort_values(id_col, kind="stable")
        n = g["n_tokens"].to_numpy(np.int64)
        off = bases[int(g["shard"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(n)[:-1]))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "n_tokens": n,
            "offset": off,
            "chunk_id": off // seq_len,
            "chunk_pos": off % seq_len,
        })

    return slim.groupby("shard").map_groups(finish, batch_format="pandas")


def pack_chunks(ds: ray.data.Dataset, seq_len: int = 2048,
                text_col: str = "text", id_col: str = "doc_id",
                shard_size: int = 1_000_000) -> ray.data.Dataset:
    """Chunk manifest: one row per (doc, training window) the doc
    overlaps — ``(doc_id, chunk_id, tok_start, tok_end)`` where
    ``[tok_start, tok_end)`` is the doc-relative token span that lands
    in ``chunk_id``.  This is the dataloader's read plan: a window's
    content is exactly the spans of every row with its chunk_id.
    Zero-token docs emit nothing.  Vectorized expansion over
    :func:`pack_offsets` output (repeat + cumsum enumeration — no
    per-doc Python loop)."""
    offsets = pack_offsets(ds, seq_len=seq_len, text_col=text_col,
                           id_col=id_col, shard_size=shard_size)

    def expand(batch: pa.Table) -> pa.Table:
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        o = batch["offset"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = n > 0
        n, o, ids = n[m], o[m], ids[m]
        if len(n) == 0:  # batch of only zero-token docs
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
            })
        first = o // seq_len
        last = (o + n - 1) // seq_len
        reps = (last - first + 1).astype(np.int64)
        owner = np.repeat(np.arange(len(n)), reps)
        # per-doc chunk ordinal 0..reps-1 via cumsum reset
        pos = np.arange(len(owner)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        chunk = first[owner] + pos
        tok_start = np.maximum(0, chunk * seq_len - o[owner])
        tok_end = np.minimum(n[owner], (chunk + 1) * seq_len - o[owner])
        return pa.table({
            id_col: pa.array(ids[owner], pa.int64()),
            "chunk_id": pa.array(chunk.astype(np.int64)),
            "tok_start": pa.array(tok_start.astype(np.int64)),
            "tok_end": pa.array(tok_end.astype(np.int64)),
        })

    return offsets.map_batches(expand, batch_format="pyarrow")
