"""End-to-end corpus curation pipeline (the training-data flagship):

    quality gate → exact dedup → deterministic split → packing offsets

One streaming Dataset composition, two coarse-keyed shuffles total
(dedup pkey, packing shard); the quality gate recomputes its metrics
in the same pass that filters, so there is no metric join-back.  Used
by the oracle-checked ``curate`` driver query and the
``python -m alix_ray curate`` CLI verb (which writes one Parquet
directory per split — the resumable-output layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DEFAULT_FRACS = {"train": 0.9, "val": 0.05, "test": 0.05}


def quality_gate(ds: ray.data.Dataset, min_tokens: int = 32,
                 min_alpha: float = 0.8,
                 text_col: str = "text") -> ray.data.Dataset:
    """Map-side quality filter: keep docs with at least ``min_tokens``
    simple-profile tokens and alpha ratio ≥ ``min_alpha`` (6-decimal
    rounded, matching the SQL oracle's comparison)."""
    from ..analysis import SimpleAnalyzer
    from ..ops.textstats import round_half_away

    def gate(batch: pa.Table) -> pa.Table:
        lists = SimpleAnalyzer.tokens_arrays(batch[text_col])
        n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        texts = batch[text_col]
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        alpha = pc.utf8_length(
            pc.replace_substring_regex(texts, "[^A-Za-z]", "")
        ).to_numpy(zero_copy_only=False)
        ratio = round_half_away(alpha / np.maximum(n_chars, 1))
        keep = (n_tok >= min_tokens) & (ratio >= min_alpha)
        return batch.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


def curate(ds: ray.data.Dataset, min_tokens: int = 32,
           min_alpha: float = 0.8, fractions: dict | None = None,
           id_col: str = "doc_id",
           text_col: str = "text") -> ray.data.Dataset:
    """Gate → dedup → split.  Returns ``(doc_id, text, split)`` rows —
    the curated corpus with split assignments, still streaming."""
    from ..ops.dedup import exact_dedup
    from ..ops.mixing import hash_split

    gated = quality_gate(ds, min_tokens, min_alpha, text_col)
    clean = exact_dedup(gated, key_col=text_col, id_col=id_col) \
        .select_columns([id_col, text_col])
    return hash_split(clean, fractions or DEFAULT_FRACS, id_col=id_col)


def curate_to_dir(ds: ray.data.Dataset, out_dir: str,
                  seq_len: int = 2048, shard_size: int = 1_000_000,
                  **kw) -> dict:
    """Materialize the curated corpus as one Parquet directory per
    split (``<out>/train`` …), plus packing offsets for the training
    stream (``<out>/train_offsets``).  Each directory publishes
    atomically (write to ``<dir>.tmp`` → rename, the repo's build
    convention) and is the resume unit: a rerun SKIPS any directory
    already published, so a crash mid-run redoes only the unfinished
    splits.  Returns per-split row counts (``-1`` for skipped splits —
    they were not recounted)."""
    import os
    import shutil

    def publish(dataset: ray.data.Dataset, name: str) -> int:
        final = os.path.join(out_dir, name)
        if os.path.isdir(final):  # published by a previous run
            return -1
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        dataset.write_parquet(tmp)
        n = dataset.count()
        # an empty split writes no files — publish the empty dir so the
        # layout is uniform and the resume skip still applies
        os.makedirs(tmp, exist_ok=True)
        os.rename(tmp, final)
        return n

    split = curate(ds, **kw).materialize()
    counts: dict[str, int] = {}
    names = (kw.get("fractions") or DEFAULT_FRACS).keys()
    for name in names:
        counts[name] = publish(
            split.filter(expr=f"split == '{name}'"), name)
    from ..ops.packing import pack_offsets

    train = split.filter(expr="split == 'train'")
    publish(pack_offsets(train, seq_len=seq_len,
                         shard_size=shard_size), "train_offsets")
    return counts
