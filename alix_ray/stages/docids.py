"""Exact dedup by url + deterministic global doc-id assignment.

Replaces the reference's implicit doc identity (Lucene ingestion-order
docIds, ``TermLexicon.java:20-24``) with ids that are **reproducible
across runs and cluster sizes** (SURVEY.md §7.4.2): after one global
sort by ``(url, warc_ts)``, the kept row for each url is its first
occurrence (min ``warc_ts`` — dedup-keep-first, SURVEY.md §2.8) and
``doc_id`` = rank of the url in sorted order.  Never a partition-local
counter.

Distributed shape: one Ray ``sort`` (the only wide exchange), then two
embarrassingly-parallel passes over the sorted blocks:

1. per-block metadata (row count, first/last url, adjacent-distinct
   count) — driver computes per-block id offsets from a tiny cumsum;
2. per-block dedup + id stamping with the computed offset.

Duplicate urls spanning block boundaries are handled by comparing each
block's first url with the previous block's last url (sortedness makes
the previous block sufficient even when a hot url spans many blocks:
every non-first block of the run drops all its rows of that url).

Scale note (10^12 docs): the sort moves (url, text, …) rows — html is
dropped before this stage (SURVEY.md §4 wide-rows row).  The two
metadata passes move O(blocks) bytes to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


@ray.remote
def _block_meta(tbl: pa.Table, url_col: str):
    n = tbl.num_rows
    if n == 0:
        return 0, None, None, 0
    urls = tbl[url_col]
    first = urls[0].as_py()
    last = urls[n - 1].as_py()
    # number of adjacent-distinct url runs inside the block
    arr = urls.combine_chunks()
    neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
    runs = 1 + pc.sum(neq).as_py() if n > 1 else 1
    return n, first, last, runs


@ray.remote
def _dedup_stamp(tbl: pa.Table, url_col: str, drop_first_run: bool, id_offset: int):
    n = tbl.num_rows
    if n == 0:
        return tbl.append_column("doc_id", pa.array([], pa.int64()))
    arr = tbl[url_col].combine_chunks()
    keep = np.ones(n, bool)
    if n > 1:
        eq_prev = pc.equal(arr.slice(1), arr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        keep[1:] = ~eq_prev
    if drop_first_run:
        keep[0] = False
    out = tbl.filter(pa.array(keep))
    ids = np.arange(id_offset, id_offset + out.num_rows, dtype=np.int64)
    return out.append_column("doc_id", pa.array(ids, pa.int64()))


def dedup_assign_ids(
    ds: ray.data.Dataset, url_col: str = "url", ts_col: str = "warc_ts",
    id_base: int = 0,
) -> tuple[ray.data.Dataset, int]:
    """Sort-based dedup + id assignment (full-row global sort).

    The build uses the broadcast-dictionary path
    (:func:`build_url_dictionary` + :func:`stamp_ids_batch`) — same ids,
    no payload shuffle.  This variant remains the 10^12-doc fallback for
    when the url dictionary exceeds driver memory: the full sort keeps
    everything distributed.  Returns ``(dataset sorted by url with
    doc_id column, n_docs)``.
    """
    mat = ds.sort([url_col, ts_col]).materialize()
    refs = mat.to_arrow_refs()
    metas = ray.get([_block_meta.remote(r, url_col) for r in refs])
    offsets = []
    off = int(id_base)
    drops = []
    prev_last = None
    for n, first, last, runs in metas:
        drop = n > 0 and prev_last is not None and first == prev_last
        kept = runs - (1 if drop else 0) if n > 0 else 0
        drops.append(drop)
        offsets.append(off)
        off += kept
        if n > 0:
            prev_last = last
    out_refs = [
        _dedup_stamp.remote(r, url_col, drop, o)
        for r, drop, o in zip(refs, drops, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs), off


def build_url_dictionary(ds: ray.data.Dataset, url_col: str = "url",
                         ts_col: str = "warc_ts"):
    """Distinct urls → (sorted url array, min-ts array, dense ids).

    Only the (url, ts) PROJECTION shuffles (a groupby-min + sort of a
    few bytes/row), never the document payload — the docs pipeline then
    stamps ids map-side against the broadcast dictionary.  At 10^12
    docs the driver-side collect becomes a partitioned dictionary with
    a hash-join inside ``map_batches``; the id assignment (rank in the
    url sort) is identical either way.
    """
    def partial_min(batch: pa.Table) -> pa.Table:
        g = batch.group_by(url_col).aggregate([(ts_col, "min")])
        return g.rename_columns([url_col, ts_col])

    pairs = ds.select_columns([url_col, ts_col]).map_batches(
        partial_min, batch_format="pyarrow"
    )
    # per-batch partials are ~distinct already; the final min-merge is a
    # small driver-side reduce (no cluster shuffle).  At 10^12 docs the
    # merge becomes one groupby over the partials instead.
    # NB: Ray emits EMPTY blocks without running the UDF, so a ragged
    # input (more read tasks than rows) yields schemaless zero-row
    # tables — drop them before the unify or concat_tables raises.
    tables = ray.get(pairs.materialize().to_arrow_refs())
    return merge_url_ts_tables(tables, url_col=url_col, ts_col=ts_col)


def merge_url_ts_tables(tables, url_col: str = "url",
                        ts_col: str = "warc_ts"):
    """Fold (url, ts) partial tables into the dictionary arrays:
    (sorted fixed-width url array, per-url min ts).  The single home of
    the dictionary-merge semantics — :func:`build_url_dictionary` and
    the small-build flush path (``stages/smallbuild.py``) both call it,
    so keep-first/tie rules and the ragged-block guard can never
    diverge between the two build engines.  Accepts partials that are
    already grouped or raw (url, ts) rows; extra columns are ignored.
    """
    tables = [t.select([url_col, ts_col]) for t in tables
              if url_col in t.schema.names and t.num_rows]
    if not tables:
        return (np.empty(0, np.str_),
                np.empty(0, "datetime64[us]"))
    parts = pa.concat_tables(tables, promote_options="permissive")
    merged = parts.group_by(url_col).aggregate([(ts_col, "min")])
    urls_arr = merged[url_col].to_numpy(zero_copy_only=False)
    ts_arr = merged[f"{ts_col}_min"].to_numpy(zero_copy_only=False)
    order = np.argsort(urls_arr)
    # fixed-width unicode dtype → C-level searchsorted compares
    urls = urls_arr[order].astype(np.str_)
    return urls, ts_arr[order]


def stamp_ids_batch(batch: pa.Table, urls_ts_ref, url_col="url",
                    ts_col="warc_ts", id_base: int = 0) -> pa.Table:
    """Dedup + id-stamp one batch against the broadcast dictionary:
    keep the row whose ts equals the url's min ts (keep-first; the
    corpus contract guarantees distinct ts per duplicated url),
    ``doc_id`` = rank of url in the sorted dictionary (+ ``id_base``
    for delta generations of an incremental index).  ``urls_ts_ref``
    is an ObjectRef (broadcast path) or the resolved (urls, ts) tuple
    (raw-task callers whose ref Ray already dereferenced)."""
    urls, ts = (ray.get(urls_ts_ref)
                if isinstance(urls_ts_ref, ray.ObjectRef) else urls_ts_ref)
    burls = batch[url_col].to_numpy(zero_copy_only=False).astype(np.str_)
    idx = np.searchsorted(urls, burls)
    bts = batch[ts_col].to_numpy(zero_copy_only=False)
    keep = ts[idx] == bts
    out = batch.filter(pa.array(keep))
    return out.append_column(
        "doc_id", pa.array(idx[keep].astype(np.int64) + int(id_base)))


@ray.remote
def _count_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _stamp_ids(tbl: pa.Table, col: str, offset: int) -> pa.Table:
    ids = np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
    return tbl.append_column(col, pa.array(ids, pa.int64()))


def assign_ranks(
    ds: ray.data.Dataset, sort_col: str, id_col: str, descending: bool = False
) -> ray.data.Dataset:
    """Add a dense global-rank column = row index after sort by sort_col.

    Used for the term lexicon (dense termId = lexicographic rank,
    TermLexicon.java:1-30).  One sort + one metadata pass.
    """
    mat = ds.sort(sort_col, descending=descending).materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    out = [_stamp_ids.remote(r, id_col, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
