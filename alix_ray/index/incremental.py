"""Incremental (generational) index maintenance — add / delete / compact.

Re-expression of Lucene's ``IndexWriter`` segment protocol
(reference: ``lucene`` usage in ``Alix.java`` / SURVEY.md §1.3 —
``addDocuments`` → new segment, ``deleteDocuments`` → liveDocs bitset,
``forceMerge`` → segment rewrite) over the artifact-table layout:

- a **generation** is one complete index build (docs / analyzed /
  doc_stats / postings / term_stats + config.json) rooted in a subdir
  of the index; delta generations stamp doc ids ABOVE every existing
  generation's max id, so doc-id ranges never interleave and per-term
  shard lists across generations stay disjoint + sorted — the serving
  cursors (WAND / block-max window) work unchanged;
- ``generations.json`` is the ``segments_N`` analog: the atomically
  swapped list of live generations.  A crashed delta build is invisible
  (its dir is not referenced) and resumes through the per-stage
  manifest on retry;
- ``tombstones/del-*.parquet`` are the liveDocs analog: deletes mask
  search results immediately, while per-term df/cf stay stale until
  compaction (exactly Lucene's semantics — term stats ignore deletes
  until merge); ``n_docs`` (→ idf) counts live docs only;
- :meth:`IndexWriter.compact` is ``forceMerge(1)``: live generations
  merge and tombstoned rows drop WITHOUT re-running the analysis chain
  (the analyzed artifact is the copy source, as a Lucene merge copies
  postings without re-tokenizing); postings / stats rebuild from it,
  so the compacted index is EXACTLY the index a one-shot build over
  the live documents would produce (same doc ids, df, cf, scores).

Readers (:class:`~alix_ray.index.engine.BM25Index`) are snapshots:
reopen after writer operations, like ``DirectoryReader.openIfChanged``.

Scale notes: add/compact inherit the build pipeline's distribution
(streaming Ray Data stages, per-partition checkpoints).  The
delete-by-url lookup broadcasts the url set and filters the docs
artifact distributed — driver memory ∝ matches, not corpus.  The
``update=True`` replaced-url scan assumes the DELTA is driver-sized
(its url column is collected once); at 10^12-doc scale with huge
deltas, run compaction-time dedup instead.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.build import IndexBuilder, _fingerprint
from ..stages.store import resolve_stage
from .engine import _load_tombstones

_STATE = "generations.json"


def _drop_deleted_fn(del_ref):
    """Batch filter dropping tombstoned doc ids (broadcast sorted
    array via ``ray.put`` — read once per task, never reshipped)."""

    def drop(t: pa.Table) -> pa.Table:
        d = ray.get(del_ref)
        if not len(d) or not t.num_rows:
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(d, ids)
        pos[pos == len(d)] = 0
        return t.filter(pa.array(~(d[pos] == ids)))

    return drop


class IndexWriter:
    """Writer handle over a generational index rooted at ``root``.

    ``builder_kwargs`` are forwarded to each generation's
    :class:`IndexBuilder` (analyzer / shard_range / keep_positions /
    store kind …); for delta generations the base generation's config
    pins analyzer + sharding so generations can never diverge."""

    def __init__(self, root: str, **builder_kwargs):
        self.root = root
        self.builder_kwargs = dict(builder_kwargs)
        os.makedirs(root, exist_ok=True)

    # -- state ---------------------------------------------------------
    def generations(self) -> list[str]:
        """Live generation names (relative to root).  A plain index dir
        (config.json, no generations.json) is adopted as the single
        generation ``"."`` — any existing build becomes incrementally
        extendable in place."""
        p = os.path.join(self.root, _STATE)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)["generations"]
        if os.path.exists(os.path.join(self.root, "config.json")):
            return ["."]
        return []

    def _write_state(self, gens: list[str]) -> None:
        # atomic swap — readers see the old or the new list, never torn
        tmp = os.path.join(self.root, _STATE + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"format": 1, "generations": gens}, f)
        os.replace(tmp, os.path.join(self.root, _STATE))

    def _gen_dir(self, name: str) -> str:
        return os.path.normpath(os.path.join(self.root, name))

    def _next_gen_name(self) -> str:
        """Fresh generation name: one past the highest ``gen-N`` ON
        DISK (merges shrink the live list, so its length can collide
        with a live or lingering dir; disk scan never does)."""
        nums = [-1]
        for d in os.listdir(self.root):
            tail = d.rpartition("-")[2]
            if d.startswith("gen-") and tail.isdigit():
                nums.append(int(tail))
        return f"gen-{max(nums) + 1:05d}"

    def _gen_cfgs(self) -> list[dict]:
        out = []
        for g in self.generations():
            with open(os.path.join(self._gen_dir(g), "config.json")) as f:
                out.append(json.load(f))
        return out

    def _keep_positions(self, gen: str) -> bool:
        adir = resolve_stage(self._gen_dir(gen), "analyzed")
        for r, _d, ns in os.walk(adir):
            for n in ns:
                if n.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(r, n))
                    return "positions" in sch.names
        return False

    def _builder(self, gen_dir: str, id_base: int = 0,
                 like: dict | None = None) -> IndexBuilder:
        kw = dict(self.builder_kwargs)
        if like is not None:
            kw["analyzer"] = like["analyzer"]
            kw["shard_range"] = like["shard_range"]
            kw["num_buckets"] = like["num_buckets"]
            kw["idf_exp"] = like["idf_exp"]
        return IndexBuilder(gen_dir, id_base=id_base, **kw)

    # -- operations ----------------------------------------------------
    def add_documents(self, ds: ray.data.Dataset,
                      input_kind: str = "pages",
                      update: bool = False) -> str:
        """Index ``ds`` as a new generation.

        pages-kind inputs get doc ids assigned at ``max_doc_id + 1``
        (url-rank within the delta, offset above every existing id);
        documents-kind inputs must arrive with ids already above the
        existing range (asserted via Parquet stats).  ``update=True``
        (pages only) tombstones older docs whose url reappears in the
        delta — Lucene's ``updateDocument`` delete-then-add."""
        gens = self.generations()
        if not gens:
            name = "gen-00000"
            b = self._builder(self._gen_dir(name))
            b.build(ds, input_kind=input_kind, fingerprint=f"gen:{name}")
            self._write_state([name])
            return name
        cfgs = self._gen_cfgs()
        id_base = max(c["max_doc_id"] for c in cfgs) + 1
        name = self._next_gen_name()
        gdir = self._gen_dir(name)
        kp = self._keep_positions(gens[0])
        b = self._builder(gdir, id_base=id_base, like=cfgs[0])
        b.keep_positions = kp
        b.build(ds, input_kind=input_kind, fingerprint=f"gen:{name}")
        if input_kind == "documents":
            lo = _min_doc_id(resolve_stage(gdir, "docs"))
            if lo is not None and lo < id_base:
                raise ValueError(
                    f"documents-kind delta carries doc_id {lo} below the "
                    f"existing id range (needs ≥ {id_base}) — ids across "
                    "generations must never interleave")
        replaced: np.ndarray = np.empty(0, np.int64)
        if update:
            if input_kind != "pages":
                raise ValueError("update=True needs url-keyed (pages) input")
            new_urls = _read_column(resolve_stage(gdir, "docs"), "url")
            replaced = self._find_ids_by_url(new_urls, gens)
        self._write_state(gens + [name])
        if len(replaced):
            self._append_tombstones(replaced)
        return name

    def delete_documents(self, urls=None, doc_ids=None) -> int:
        """Tombstone documents by url (pages-kind builds) or doc id.
        Returns the number of newly tombstoned ids."""
        if (urls is None) == (doc_ids is None):
            raise ValueError("pass exactly one of urls / doc_ids")
        if doc_ids is not None:
            ids = np.unique(np.asarray(list(doc_ids), np.int64))
        else:
            ids = self._find_ids_by_url(list(urls), self.generations())
        return self._append_tombstones(ids)

    def compact(self) -> str:
        """Merge ALL live generations, dropping tombstoned docs — the
        ``forceMerge(1)`` analog.  Doc ids are preserved; the result
        equals a one-shot build over the live documents (postings and
        stats rebuild from the merged analyzed artifact under the
        merged corpus' own avgdl, so scores are exact, not
        stale-bounded)."""
        gens = self.generations()
        if not gens:
            raise ValueError("empty index — nothing to compact")
        deleted = _load_tombstones(self.root)
        if len(gens) == 1 and not len(deleted):
            return gens[0]  # already compact
        name = self._rebuild_from(gens, deleted, self._next_gen_name())
        self._write_state([name])
        # every tombstone is applied in the new generation — retire all
        tdir = os.path.join(self.root, "tombstones")
        if os.path.isdir(tdir):
            shutil.rmtree(tdir, ignore_errors=True)
        return name

    def merge(self, names: list[str]) -> str:
        """Merge a SUBSET of generations into one new generation — the
        unit step of a tiered merge policy (Lucene TieredMergePolicy:
        bounded segment count without paying a full forceMerge).
        Tombstones falling inside the merged generations' doc-id ranges
        are applied and retired; tombstones of other generations stay.
        Doc-id ranges across generations are disjoint, so merging ANY
        subset (contiguous or not) preserves serving invariants."""
        gens = self.generations()
        names = list(names)
        unknown = [n for n in names if n not in gens]
        if unknown:
            raise ValueError(f"not live generations: {unknown}")
        if len(names) < 2:
            raise ValueError("merge needs ≥ 2 generations (use compact "
                             "for single-generation tombstone purges)")
        deleted = _load_tombstones(self.root)
        in_range = np.zeros(len(deleted), bool)
        for g in names:
            lo = _min_doc_id(resolve_stage(self._gen_dir(g), "docs")) or 0
            with open(os.path.join(self._gen_dir(g), "config.json")) as f:
                hi = json.load(f)["max_doc_id"]
            in_range |= (deleted >= lo) & (deleted <= hi)
        applied = deleted[in_range]
        name = self._rebuild_from(names, applied, self._next_gen_name())
        survivors = [g for g in gens if g not in names] + [name]
        # deterministic order: ascending doc-id range
        survivors.sort(key=lambda g: _min_doc_id(
            resolve_stage(self._gen_dir(g), "docs")) or 0)
        self._write_state(survivors)
        remaining = deleted[~in_range]
        tdir = os.path.join(self.root, "tombstones")
        if os.path.isdir(tdir):
            shutil.rmtree(tdir, ignore_errors=True)
        if len(remaining):
            self._append_tombstones(remaining)
        return name

    def maybe_merge(self, max_generations: int = 8) -> str | None:
        """Size-tiered policy: when the generation count exceeds the
        cap, merge the SMALLEST generations (by n_docs) down to the
        cap in one step — open cost per replica is one O(lexicon) scan
        per generation, so the cap bounds it.  Returns the new
        generation name, or None if under the cap."""
        gens = self.generations()
        if len(gens) <= max_generations:
            return None
        sizes = {g: c["n_docs"]
                 for g, c in zip(gens, self._gen_cfgs())}
        by_size = sorted(gens, key=lambda g: (sizes[g], g))
        n_merge = len(gens) - max_generations + 1
        return self.merge(by_size[:n_merge])

    def _rebuild_from(self, gens: list[str], deleted: np.ndarray,
                      name: str) -> str:
        """Stream docs+analyzed of ``gens`` through a tombstone filter
        into a new generation ``name`` and rebuild its postings/stats —
        the analysis chain is never re-run (the analyzed artifact is
        the copy source, as a Lucene merge copies postings)."""
        cfgs = self._gen_cfgs()
        gdir = self._gen_dir(name)
        b = self._builder(gdir, like=cfgs[0])
        b.keep_positions = self._keep_positions(self.generations()[0])
        # fingerprint: the source generation list + tombstone count —
        # a crashed merge resumes stage-by-stage under the same fp
        fp = "merge:" + ",".join(gens) + f":{len(deleted)}"
        del_ref = ray.put(deleted)
        drop = _drop_deleted_fn(del_ref)
        docs_dirs = [resolve_stage(self._gen_dir(g), "docs") for g in gens]
        docs = ray.data.read_parquet(_parquet_files(docs_dirs)).map_batches(
            drop, batch_format="pyarrow")
        b.build_docs_from_documents(docs, fp)
        an_dirs = [resolve_stage(self._gen_dir(g), "analyzed") for g in gens]
        analyzed = ray.data.read_parquet(_parquet_files(an_dirs)).map_batches(
            drop, batch_format="pyarrow")
        b.seed_analyzed(analyzed, fp)
        # downstream chain — fingerprints exactly as IndexBuilder.build
        fp_docs = _fingerprint("docs", fp)
        fp_analyzed = _fingerprint(
            "analyzed", fp_docs, b.analyzer, b.keep_positions)
        b.build_doc_stats(fp_analyzed)
        fp_stats = _fingerprint("doc_stats", fp_analyzed, b.shard_range)
        b.build_postings(fp_stats)
        fp_postings = _fingerprint(
            "postings", fp_stats, b.shard_range, b.num_buckets)
        b.build_term_stats(fp_postings)
        return name

    def prune(self) -> list[str]:
        """Remove generation dirs no longer referenced by
        ``generations.json`` (superseded by a compact).  Never touches
        the live set or a plain adopted base's stage dirs."""
        live = {self._gen_dir(g) for g in self.generations()}
        removed = []
        for d in sorted(os.listdir(self.root)):
            p = self._gen_dir(d)
            if (d.startswith("gen-") and os.path.isdir(p)
                    and p not in live):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(d)
        return removed

    # -- internals -----------------------------------------------------
    def _find_ids_by_url(self, urls, gens) -> np.ndarray:
        """Doc ids whose url is in ``urls``, across ``gens`` — a
        distributed filter of the docs artifact against the broadcast
        url set (result ∝ matches)."""
        uset = pa.array(sorted({str(u) for u in urls}), pa.large_string())
        if not len(uset):
            return np.empty(0, np.int64)
        dirs = [resolve_stage(self._gen_dir(g), "docs") for g in gens]
        sch = pq.read_schema(_first_parquet(dirs[0]))
        if "url" not in sch.names:
            raise ValueError(
                "url-keyed delete/update needs a pages-kind build "
                "(docs artifact has no url column)")

        def hit(t: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(t["url"], pa.large_string()),
                         value_set=uset)
            return t.select(["doc_id"]).filter(m)

        got = ray.data.read_parquet(
            _parquet_files(dirs), columns=["url", "doc_id"]
        ).map_batches(hit, batch_format="pyarrow").take_all()
        return np.unique(np.array(
            [r["doc_id"] for r in got], np.int64))

    def _append_tombstones(self, ids: np.ndarray) -> int:
        ids = np.unique(np.asarray(ids, np.int64))
        existing = _load_tombstones(self.root)
        if len(existing):
            ids = ids[~np.isin(ids, existing)]
        if not len(ids):
            return 0
        tdir = os.path.join(self.root, "tombstones")
        os.makedirs(tdir, exist_ok=True)
        n = sum(1 for f in os.listdir(tdir) if f.endswith(".parquet"))
        tmp = os.path.join(tdir, f"del-{n:05d}.tmp")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
        os.replace(tmp, os.path.join(tdir, f"del-{n:05d}.parquet"))
        return len(ids)


def _parquet_files(dirs) -> list[str]:
    """Expand stage dirs to their parquet files — ray.data.read_parquet
    expands ONE directory argument but not a list of directories."""
    out = []
    for d in dirs:
        for r, _sub, ns in os.walk(d):
            for nm in sorted(ns):
                if nm.endswith(".parquet"):
                    out.append(os.path.join(r, nm))
    return out


def _first_parquet(dir_: str) -> str:
    for r, _d, ns in os.walk(dir_):
        for nm in sorted(ns):
            if nm.endswith(".parquet"):
                return os.path.join(r, nm)
    raise FileNotFoundError(f"no parquet under {dir_}")


def _read_column(dir_: str, col: str) -> list:
    return pq.read_table(dir_, columns=[col])[col].to_pylist()


def _min_doc_id(docs_dir: str):
    """Min doc_id across the docs artifact via Parquet row-group
    statistics — a metadata scan, no data read."""
    lo = None
    for r, _d, ns in os.walk(docs_dir):
        for nm in ns:
            if not nm.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(r, nm))
            ci = md.schema.to_arrow_schema().get_field_index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    lo = int(st.min) if lo is None else min(lo, int(st.min))
    return lo
