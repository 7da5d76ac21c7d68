"""DSIR-style importance weighting (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every raw
document by how much it looks like a TARGET distribution, using
hashed-n-gram bag features — the standard cheap proxy for "select
pretraining data that resembles the high-quality set".

log w(doc) = Σ_grams [ log p_target(bucket) − log p_raw(bucket) ]

with unigram+bigram features hashed into ``buckets`` (the paper's
hashing trick) and add-k smoothed bucket probabilities.

Distributed shape: ONE counting pass (per-batch bincount partials over
both distributions at once — the bucket table is tiny, so the shuffle
moves at most ``buckets`` rows per batch), driver assembles the
log-ratio table (``buckets`` float64s), ``ray.put`` broadcasts it, one
scoring pass.  No all-to-all ever touches token occurrences.

Gram hashing is the md5 low-64 convention (:func:`~alix_ray.ops.dedup.
md5_lower64` == DuckDB ``md5_number_lower``), so the whole pipeline has
an exact SQL oracle (``queries.py q_dsir_weights``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ._util import broadcast_cached
from .dedup import md5_lower64
from .lm import _bigram_rows
from .textstats import round_half_away


def _hashed_grams(batch: pa.Table, text_col: str, buckets: int):
    """(owner_row, bucket) for every unigram and bigram in the batch.
    Hash cost is bounded by DISTINCT grams per batch
    (dictionary-encode first, md5 once per dictionary entry)."""
    owner, idx, flat, w1, w2 = _bigram_rows(batch, text_col)
    grams = pa.concat_arrays([
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
        pc.binary_join_element_wise(w1, w2, " "),
    ])
    gowner = np.concatenate([owner, owner[idx]]) if len(owner) else owner
    enc = pc.dictionary_encode(grams)
    dict_vals = enc.dictionary.to_pylist()
    hdict = (md5_lower64(dict_vals) % np.uint64(buckets)).astype(np.int64)
    b = hdict[enc.indices.to_numpy(zero_copy_only=False)] \
        if len(dict_vals) else np.empty(0, np.int64)
    return gowner, b


def dsir_weights(ds: ray.data.Dataset, text_col: str = "text",
                 target_col: str = "lang", target_value: str = "en",
                 buckets: int = 8192, add: float = 1.0) -> ray.data.Dataset:
    """Per-doc importance weight of raw docs toward the target subset
    (rows where ``target_col == target_value``).  Output
    ``(doc_id, n_grams, logw)``; docs with no grams drop out."""

    def partial(batch: pa.Table) -> pa.Table:
        gowner, b = _hashed_grams(batch, text_col, buckets)
        is_tgt = pc.fill_null(
            pc.equal(batch[target_col], target_value), False
        ).to_numpy(zero_copy_only=False)
        raw = np.bincount(b, minlength=buckets)
        tgt = np.bincount(b[is_tgt[gowner]], minlength=buckets) \
            if len(b) else np.zeros(buckets, np.int64)
        nz = np.nonzero(raw)[0]
        return pa.table({
            "b": pa.array(nz, pa.int64()),
            "raw": pa.array(raw[nz], pa.int64()),
            "tgt": pa.array(tgt[nz], pa.int64()),
        })

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b").sum(["raw", "tgt"]).to_pandas()
    )
    raw = np.zeros(buckets, np.float64)
    tgt = np.zeros(buckets, np.float64)
    raw[counts["b"].to_numpy()] = counts["sum(raw)"].to_numpy()
    tgt[counts["b"].to_numpy()] = counts["sum(tgt)"].to_numpy()
    denom_r = raw.sum() + add * buckets
    denom_t = tgt.sum() + add * buckets
    logratio = (np.log((tgt + add) / denom_t)
                - np.log((raw + add) / denom_r))
    ratio_ref = ray.put(logratio)

    def score(batch: pa.Table) -> pa.Table:
        lr = broadcast_cached(ratio_ref)
        gowner, b = _hashed_grams(batch, text_col, buckets)
        n_rows = len(batch)
        n_grams = np.bincount(gowner, minlength=n_rows)
        s = np.bincount(gowner, weights=lr[b], minlength=n_rows)
        keep = n_grams > 0
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "n_grams": pa.array(n_grams[keep].astype(np.int64)),
            "logw": pa.array(round_half_away(s[keep])),
        })

    return ds.map_batches(score, batch_format="pyarrow")
