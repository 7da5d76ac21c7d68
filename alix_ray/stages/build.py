"""Index build orchestration: staged, checkpointed, resumable.

Pipeline (SURVEY.md §7.2), each stage a Ray Data pipeline whose output
is a partitioned Parquet directory published atomically through an
``ArtifactStore`` (``stages/store.py``): the default ``RenameStore``
stages ``<stage>.tmp`` → rename (the reference's atomic dir swap,
``TeiIngester.java:336-356``; requires a shared POSIX FS), the
``store="pointer"`` mode publishes immutable versioned prefixes with
an atomic pointer PUT (the object-store protocol — no directory
renames anywhere).  Per-partition lineage rows go to the store's
manifest (journal file or PUT-only object journal).  A rerun skips
stages whose manifest entry matches the input fingerprint —
"resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north rule).

    docs       pages → extract(+quarantine) → dedup(url) → doc_id
    analyzed   docs → actor-pool analyzer → per-doc (terms, tfs, width, tokens)
    doc_stats  analyzed projection + global sums (N, Σtokens, avgdl)
    postings   analyzed → segment encode → (bucket,shard) merge → blocks
    term_stats postings projection → per-term df/cf + dense lexicon ids
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from .. import B, IDF_EXP, K1
from .analyze import extract_batch
from .docids import assign_ranks
from .postings import (
    DEFAULT_NUM_BUCKETS,
    DEFAULT_SHARD_RANGE,
    SegmentEncode,
    make_merge_fn,
)
from .store import Manifest, make_store, resolve_stage  # noqa: F401 (Manifest re-exported)

STAGES = ("docs", "analyzed", "doc_stats", "postings", "term_stats")


def _patch_ray_http_fs_check() -> None:
    """Ray's path resolution probes ``fsspec.implementations.http`` on
    every dataset/datasink creation and catches only
    ModuleNotFoundError.  With aiohttp absent, two threads creating
    datasets concurrently (the overlapped analyze groups) race the
    retried import and one sees a partially-initialized module — a
    plain ImportError that escapes Ray's guard.  Treat ANY ImportError
    as "not an HTTP filesystem" (it never is, locally)."""
    try:
        import ray.data.datasource.path_util as _pu
    except Exception:  # pragma: no cover - future Ray layout change
        return
    orig = _pu._is_http_filesystem
    if getattr(orig, "_alix_safe", False):
        return

    def _safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    _safe._alix_safe = True
    _pu._is_http_filesystem = _safe


_patch_ray_http_fs_check()


def _fingerprint(*parts) -> str:
    h = hashlib.blake2b(digest_size=12)
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\0")
    return h.hexdigest()


_SHARED_FS_VERIFIED: set[str] = set()


@ray.remote(num_cpus=0)
def _probe_visible(path: str) -> bool:
    return os.path.exists(path)


def verify_shared_fs(out_dir: str) -> None:
    """Guard the manifest/publish protocol's HARD precondition: the
    artifact dir must be one shared POSIX filesystem visible to every
    node (stage publish is a driver-side atomic dir rename;
    ``Manifest.record_partitions`` lists it with ``os.listdir``).

    - URI-style paths (``s3://…``) fail fast: object stores have no
      atomic rename — they need an ArtifactStore port with a
      manifest-pointer publish (documented in SCALING.md §artifacts).
    - On a live Ray session, a probe file written by the driver must be
      visible from a worker task; a node-local path on a real cluster
      fails here instead of silently splitting the build across disks.
    """
    if out_dir in _SHARED_FS_VERIFIED:
        return
    if "://" in out_dir:
        raise ValueError(
            f"artifact dir {out_dir!r} is a URI, not a shared-filesystem "
            "path. The publish protocols (stages/store.py) run against "
            "mounted paths: RenameStore needs a POSIX shared FS "
            "(NFS/Lustre); PointerStore (store=\"pointer\") uses only "
            "object-store primitives but URI plumbing additionally "
            "needs an fsspec filesystem threaded through the parquet "
            "readers/writers (not available in this environment)."
        )
    os.makedirs(out_dir, exist_ok=True)
    probe = os.path.join(out_dir, ".shared_fs_probe")
    with open(probe, "w") as f:
        f.write("probe")
    try:
        if ray.is_initialized():
            # target a NON-driver node when the cluster has one —
            # locality scheduling would otherwise run the probe on this
            # node and prove nothing about remote visibility
            task = _probe_visible
            try:
                my_node = ray.get_runtime_context().get_node_id()
                others = [n for n in ray.nodes()
                          if n.get("Alive") and n.get("NodeID") != my_node]
            except Exception:
                others = []
            if others:
                from ray.util.scheduling_strategies import (
                    NodeAffinitySchedulingStrategy,
                )

                task = _probe_visible.options(
                    scheduling_strategy=NodeAffinitySchedulingStrategy(
                        node_id=others[0]["NodeID"], soft=False))
            if not ray.get(task.remote(probe)):
                raise RuntimeError(
                    f"artifact dir {out_dir!r} written by the driver is "
                    "NOT visible from Ray workers — the index build "
                    "requires a shared filesystem mounted on every node."
                )
        _SHARED_FS_VERIFIED.add(out_dir)
    finally:
        os.remove(probe)


@ray.remote
def _split_file(path: str, n_parts: int) -> None:
    tbl = pq.read_table(path)
    n = tbl.num_rows
    step = (n + n_parts - 1) // n_parts
    for j, s in enumerate(range(0, n, step)):
        pq.write_table(tbl.slice(s, step), f"{path[:-8]}.s{j:03d}.parquet")
    os.remove(path)


def _split_heavy_files(dir_: str, max_bytes: int) -> None:
    """Bound each file's UNCOMPRESSED bytes (task work ∝ decoded chars,
    and repetitive heavy pages compress 10-20×, so on-disk size hides
    them).  Row caps alone miss doc-LENGTH skew: a crawl's giant pages
    cluster under few sites and url-sorted ids make them consecutive —
    one analyze task inherited the whole cluster (measured 13s
    straggler).  Oversized files are re-split by parallel remote tasks."""
    jobs = []
    for name in os.listdir(dir_):
        p = os.path.join(dir_, name)
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(p)
        raw = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        if raw > max_bytes:
            jobs.append(_split_file.remote(p, int(np.ceil(raw / max_bytes))))
    if jobs:
        ray.get(jobs)


def _write_stage(ds: ray.data.Dataset, store, stage: str,
                 manifest: Manifest, fingerprint: str, t_start=None,
                 max_file_bytes: int | None = None, **write_kwargs) -> None:
    t0 = t_start if t_start is not None else time.time()
    tmp = store.stage_begin(stage, fingerprint, clear=True)
    ds.write_parquet(tmp, **write_kwargs)
    if max_file_bytes:
        _split_heavy_files(tmp, max_file_bytes)
    final = store.stage_commit(stage, fingerprint)
    manifest.record_partitions(stage, final, fingerprint, int((time.time() - t0) * 1000))


class IndexBuilder:
    """Builds the full index under ``out_dir``; resumable per stage."""

    def __init__(
        self,
        out_dir: str,
        analyzer: str = "french",  # "french" | "simple"
        shard_range: int = DEFAULT_SHARD_RANGE,
        num_buckets: int = DEFAULT_NUM_BUCKETS,
        analyze_concurrency: int | tuple | None = None,
        analyze_batch_size: int | None = None,
        segment_batch_size: int = 8192,
        idf_exp: float = IDF_EXP,
        analyze_groups: int | None = None,
        docs_rows_per_file: int = 500,
        docs_max_file_bytes: int = 1_500_000,
        keep_positions: bool = False,
        hunspell_resources: tuple | None = None,
        analyze_overlap: int = 2,
        # "rename" (shared FS) | "pointer" (object store) | an
        # ArtifactStore INSTANCE (e.g. PointerStore(root, fs=<fsspec>)
        # for a real object-store URI — protocol metadata flows
        # through the fs object; bulk parquet I/O uses pyarrow's
        # native URI support in a real deployment)
        store: str = "rename",
        id_base: int = 0,
    ):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.store = make_store(out_dir, store)
        self.analyzer = analyzer
        self.shard_range = shard_range
        self.num_buckets = num_buckets
        self.analyze_concurrency = analyze_concurrency
        self.analyze_batch_size = analyze_batch_size
        self.segment_batch_size = segment_batch_size
        self.idf_exp = idf_exp
        self.analyze_groups = analyze_groups
        self.docs_rows_per_file = docs_rows_per_file
        self.docs_max_file_bytes = docs_max_file_bytes
        # positions (the TermRail artifact, SURVEY.md §1.3) multiply the
        # analyzed artifact size ~3-5x and BM25 needs only tf
        # (SURVEY.md §7.4.6) — off by default, on for span/phrase queries
        self.keep_positions = keep_positions
        # (dic_lines, aff_text) → compile a vocabulary-restricted
        # Hunspell sidecar after term_stats (HunspellCompiler analog)
        self.hunspell_resources = hunspell_resources
        self.analyze_overlap = max(1, analyze_overlap)
        # delta generations of an incremental index stamp doc ids
        # starting at id_base (> every existing generation's max id)
        self.id_base = int(id_base)
        self.manifest = self.store.make_manifest()

    # Above this row count the broadcast url dictionary (driver memory
    # ∝ distinct urls, ~100 B/url) flips to the fully distributed
    # sort-based path — both produce IDENTICAL ids (rank in url order).
    BROADCAST_DICT_MAX_ROWS = 20_000_000

    # -- stage 1: docs -------------------------------------------------
    def build_docs_from_pages(self, pages: ray.data.Dataset, fingerprint: str):
        """pages(url,warc_ts,html,text,lang) → docs with dense doc_id.

        Dedup/id strategy auto-selects on input size: the broadcast
        url-dictionary (fast: payload never shuffles) up to
        ``BROADCAST_DICT_MAX_ROWS``, the distributed sort-based
        assignment beyond it (``docids.dedup_assign_ids`` — the
        10^12-doc path; ids identical by construction)."""
        # id_base folds into the fp only when nonzero so existing
        # base-index manifests stay resumable unchanged
        fp = (_fingerprint("docs", fingerprint, self.id_base)
              if self.id_base else _fingerprint("docs", fingerprint))
        if self.manifest.stage_done("docs", fp):
            return
        t0 = time.time()
        import functools

        from .docids import (
            build_url_dictionary,
            dedup_assign_ids,
            stamp_ids_batch,
        )

        n_rows = pages.count()  # parquet metadata — no scan
        if n_rows > self.BROADCAST_DICT_MAX_ROWS:
            # distributed path: sort moves (url, ts, text …) — html is
            # dropped first so the wide exchange never carries it
            extracted = pages.map_batches(
                extract_batch, batch_format="pyarrow", zero_copy_batch=True
            )
            deduped, _n = dedup_assign_ids(extracted, id_base=self.id_base)
        else:
            # the (url, ts) dictionary pass and the html→text extraction
            # are independent — OVERLAP them (thread + materialize).
            # Materializing the extracted text is fine exactly on this
            # path: the broadcast dict is the ≤20M-row regime, where the
            # text fits the object store (beyond it the distributed
            # sort path streams end-to-end).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as ex:
                dict_fut = ex.submit(build_url_dictionary, pages)
                extracted = pages.map_batches(
                    extract_batch, batch_format="pyarrow",
                    zero_copy_batch=True,
                ).materialize()
                urls, ts = dict_fut.result()
            dict_ref = ray.put((urls, ts))
            # map-side dedup/stamp — payload never shuffles
            deduped = extracted.map_batches(
                functools.partial(stamp_ids_batch, urls_ts_ref=dict_ref,
                                  id_base=self.id_base),
                batch_format="pyarrow",
            )
        # bounded rows per file → the analyze stage reads balanced
        # blocks.  Small bound (default 250 rows) also disperses
        # doc-LENGTH skew: web corpora cluster giant pages under few
        # sites, and url-sorted ids put them in consecutive rows — with
        # large files one analyze task inherits the whole heavy cluster
        # (measured 14s straggler on the synthetic corpus).  At 10^12
        # scale this becomes a byte-bounded writer.
        _write_stage(deduped, self.store, "docs", self.manifest, fp,
                     t_start=t0, min_rows_per_file=self.docs_rows_per_file // 2,
                     max_rows_per_file=self.docs_rows_per_file,
                     max_file_bytes=self.docs_max_file_bytes)

    def build_docs_from_documents(self, docs: ray.data.Dataset, fingerprint: str):
        """documents(doc_id,text,…) → docs stage (ids already dense)."""
        fp = (_fingerprint("docs", fingerprint, self.id_base)
              if self.id_base else _fingerprint("docs", fingerprint))
        if self.manifest.stage_done("docs", fp):
            return
        _write_stage(docs, self.store, "docs", self.manifest, fp,
                     min_rows_per_file=self.docs_rows_per_file // 2,
                     max_rows_per_file=self.docs_rows_per_file,
                     max_file_bytes=self.docs_max_file_bytes)

    # -- stage 2: analyzed --------------------------------------------
    def _analyze_pipeline(self, files: list[str]):
        import functools

        from .analyze import analyze_batch_fn

        # one block per (row-bounded) input file: read coalescing would
        # otherwise merge files into uneven straggler tasks
        docs = ray.data.read_parquet(
            files, columns=["doc_id", "text"], override_num_blocks=len(files)
        )
        # stateless tasks + per-worker cached analyzer (see
        # stages/analyze.py rationale): every warm worker participates,
        # no actor-pool fork/import at stage start
        # batch_size=None → one batch per (byte-bounded) block; an
        # explicit batch_size would re-bundle consecutive small blocks
        # and reassemble the very heavy clusters the writer dispersed
        return docs.map_batches(
            functools.partial(analyze_batch_fn, profile=self.analyzer,
                              keep_positions=self.keep_positions),
            batch_format="pyarrow",
            batch_size=self.analyze_batch_size,
        )

    GROUP_TARGET_BYTES = 512 * 1024 * 1024  # input bytes per resume unit

    def build_analyzed(self, fingerprint: str, n_groups: int | None = None):
        """The heavy stage — split into input-file groups, each written
        atomically with its own lineage row, so an interrupted build
        resumes from the last completed group (per-partition
        checkpointing, the north-rule resume requirement).  Group count
        adapts to input size: one actor-pool spin-up per ~512 MB of
        input, so checkpoint granularity never dominates wall time at
        small scale."""
        fp = _fingerprint("analyzed", fingerprint, self.analyzer, self.keep_positions)
        if self.manifest.stage_done("analyzed", fp):
            return
        t_stage = time.time()
        docs_dir = self.store.resolve("docs")
        files = sorted(
            os.path.join(docs_dir, f)
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
        if n_groups is None:
            n_groups = self.analyze_groups
        if n_groups is None:
            total = sum(os.path.getsize(f) for f in files)
            n_groups = max(1, int(total // self.GROUP_TARGET_BYTES))
        n_groups = max(1, min(n_groups, len(files)))
        bounds = np.linspace(0, len(files), n_groups + 1).astype(int)
        # clear=False: the staging prefix persists across crashed
        # attempts — committed groups inside it are the resume units
        tmp = self.store.stage_begin("analyzed", fp, clear=False)
        # sweep strays: a crashed attempt under a different config can
        # have left group dirs outside this run's key set (fewer
        # groups, different bounds) — anything not expected would be
        # published as phantom documents
        # (.tmp part dirs are never valid publish content either — an
        # aborted rewrite of an expected key must not ride along)
        expected = {f"g{gi:05d}" for gi in range(n_groups)}
        for d in os.listdir(tmp):
            p = os.path.join(tmp, d)
            if os.path.isdir(p) and (
                d not in expected or d.endswith(".tmp")
            ):
                shutil.rmtree(p)
        # groups OVERLAP (bounded thread pool): each group is still an
        # atomic checkpoint, but group N+1's tasks fill the idle cores
        # during group N's straggler tail and write — the per-group
        # barrier otherwise costs ~0.3-0.5 s × groups of lost wall.
        # Ray's scheduler interleaves the two streaming jobs under the
        # global CPU cap, so there is no oversubscription.
        import threading
        from concurrent.futures import ThreadPoolExecutor

        done_parts = {
            (r.get("partition"), r.get("fingerprint"))
            for r in self.manifest.rows()
            if r.get("stage") == "analyzed" and r.get("status") == "part-done"
        }
        mlock = threading.Lock()

        def run_group(gi: int) -> None:
            gfiles = files[bounds[gi] : bounds[gi + 1]]
            if not gfiles:
                return
            gkey = f"g{gi:05d}"
            gfp = _fingerprint(fp, gkey, *gfiles)
            if self.store.part_done(tmp, gkey) and (gkey, gfp) in done_parts:
                return  # resumed: group already complete
            t0 = time.time()
            gtmp = self.store.part_begin(tmp, gkey)
            # NB: no min_rows_per_file coalescing here — forcing the
            # write to merge across upstream blocks stalls the
            # streaming pipeline (measured +3s on the hot stage); the
            # many small files cost less than that downstream
            self._analyze_pipeline(gfiles).write_parquet(gtmp)
            gdir = self.store.part_commit(tmp, gkey)
            # fold the doc_stats projection in HERE: the group's files
            # are page-cache-warm, so this read is nearly free — and
            # build_doc_stats then never re-scans the analyzed
            # artifact (a 2-column pass over 10^12 rows at full scale)
            self._write_stats_part(gdir, gkey)
            rows = sum(
                pq.read_metadata(os.path.join(gdir, f)).num_rows
                for f in os.listdir(gdir)
                if f.endswith(".parquet")
            )
            nbytes = sum(
                os.path.getsize(os.path.join(gdir, f)) for f in os.listdir(gdir)
                if f.endswith(".parquet")
            )
            with mlock:
                self.manifest.append(
                    stage="analyzed", partition=gkey, fingerprint=gfp,
                    rows=rows, bytes=nbytes, status="part-done",
                    wall_ms=int((time.time() - t0) * 1000),
                )

        with ThreadPoolExecutor(max_workers=self.analyze_overlap) as ex:
            # list() re-raises the first group failure (fail the stage,
            # completed groups stay checkpointed for the resume)
            list(ex.map(run_group, range(n_groups)))
        self.store.stage_commit("analyzed", fp)
        self.manifest.append(
            stage="analyzed", fingerprint=fp, status="done",
            wall_ms=int((time.time() - t_stage) * 1000),
        )

    def seed_analyzed(self, ds: ray.data.Dataset, fingerprint: str):
        """Adopt an ALREADY-ANALYZED dataset as this build's analyzed
        stage — the compaction path of the incremental index: live
        generations merge and tombstoned docs drop WITHOUT re-running
        the analysis chain (Lucene's segment merge copies postings and
        never re-tokenizes; here the analyzed artifact is the copy
        source).  Written as one committed group with its doc_stats
        projection part, exactly the layout ``build_analyzed`` leaves,
        so every downstream stage runs unchanged."""
        fp_docs = (_fingerprint("docs", fingerprint, self.id_base)
                   if self.id_base else _fingerprint("docs", fingerprint))
        fp = _fingerprint("analyzed", fp_docs, self.analyzer,
                          self.keep_positions)
        if self.manifest.stage_done("analyzed", fp):
            return
        t0 = time.time()
        gkey = "g00000"
        tmp = self.store.stage_begin("analyzed", fp, clear=True)
        gtmp = self.store.part_begin(tmp, gkey)
        ds.write_parquet(gtmp)
        gdir = self.store.part_commit(tmp, gkey)
        self._write_stats_part(gdir, gkey)
        self.manifest.append(stage="analyzed", partition=gkey,
                             fingerprint=_fingerprint(fp, gkey),
                             status="part-done")
        self.store.stage_commit("analyzed", fp)
        self.manifest.append(stage="analyzed", fingerprint=fp, status="done",
                             wall_ms=int((time.time() - t0) * 1000))

    # -- stage 3: doc_stats -------------------------------------------
    def _stats_parts_dir(self) -> str:
        # shard_range keyed: parts from a run with a different sharding
        # must never assemble into this build's doc_stats
        return os.path.join(self.out_dir,
                            f"doc_stats.parts.sr{self.shard_range}")

    def _write_stats_part(self, gdir: str, gkey: str) -> None:
        """(doc_id, width, tokens) projection of one analyzed group,
        written hive-partitioned by shard under an atomically-renamed
        per-group dir — the doc_stats stage assembles these instead of
        re-scanning `analyzed`."""
        t = pq.read_table(gdir, columns=["doc_id", "width", "tokens"])
        shards = (
            t["doc_id"].to_numpy(zero_copy_only=False) // self.shard_range
        ).astype(np.int32)
        pdir = self._stats_parts_dir()
        os.makedirs(pdir, exist_ok=True)
        gtmp = self.store.part_begin(pdir, gkey)  # empty group → empty part
        for s in np.unique(shards):
            sub = t.filter(pa.array(shards == s))
            sdir = os.path.join(gtmp, f"shard={int(s)}")
            os.makedirs(sdir, exist_ok=True)
            pq.write_table(sub, os.path.join(sdir, f"{gkey}.parquet"))
        self.store.part_commit(pdir, gkey)

    def build_doc_stats(self, fingerprint: str):
        fp = _fingerprint("doc_stats", fingerprint, self.shard_range)
        if self.manifest.stage_done("doc_stats", fp):
            return
        t0 = time.time()
        # SHARD-partitioned projection of `analyzed` (shard = doc_id //
        # shard_range — the key the postings merge groups by, so merge
        # tasks partition-prune their norm slice).  The projection was
        # already written per group DURING the analyze stage
        # (_write_stats_part, page-cache-warm read inside the
        # overlapped group threads); here we assemble those parts and
        # only BACKFILL groups whose part is missing (crash between the
        # group publish and its stats write, or a shard_range change).
        analyzed_dir = self.store.resolve("analyzed")
        groups = sorted(
            d for d in os.listdir(analyzed_dir)
            if os.path.isdir(os.path.join(analyzed_dir, d))
        )
        parts_root = self._stats_parts_dir()
        tmp = self.store.stage_begin("doc_stats", fp, clear=True)
        for g in groups:
            gpart = os.path.join(parts_root, g)
            if not self.store.part_done(parts_root, g):
                self._write_stats_part(os.path.join(analyzed_dir, g), g)
            for sd in os.listdir(gpart):
                src = os.path.join(gpart, sd)
                if not os.path.isdir(src):
                    continue  # part commit marker, not a shard dir
                dst = os.path.join(tmp, sd)
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    # COPY, not move: a crash mid-assembly must leave
                    # every part intact (part_done stays true, so the
                    # resume would otherwise skip the backfill and
                    # commit a doc_stats missing the consumed rows);
                    # parts are deleted wholesale after the publish
                    self.store.copy_file(
                        os.path.join(src, f), os.path.join(dst, f))
        final = self.store.stage_commit("doc_stats", fp)
        # parts consumed — drop every parts dir (incl. stale other-
        # shard_range ones)
        for d in os.listdir(self.out_dir):
            if d.startswith("doc_stats.parts."):
                shutil.rmtree(os.path.join(self.out_dir, d),
                              ignore_errors=True)
        self.manifest.append(
            stage="doc_stats", fingerprint=fp, status="done",
            wall_ms=int((time.time() - t0) * 1000),
        )
        t0 = time.time()  # config wall measures ONLY the aggregate
        # global sums (N, Σtokens, max doc_id).  Auto-select (the
        # docids precedent): below the size cap a thread pool of
        # column-pruned driver reads over the artifact files avoids a
        # whole Ray pipeline launch (~0.5 s fixed cost); beyond it the
        # per-batch-partials pass keeps everything distributed.
        stat_files = [
            os.path.join(r, n)
            for r, _d, ns in os.walk(final)
            for n in ns if n.endswith(".parquet")
        ]
        total_bytes = sum(os.path.getsize(f) for f in stat_files)
        if total_bytes <= 256 * 1024 * 1024:
            from concurrent.futures import ThreadPoolExecutor

            def fpart(path):
                t = pq.read_table(path, columns=["doc_id", "tokens"])
                return (
                    t.num_rows,
                    int(pa.compute.sum(t["tokens"]).as_py() or 0),
                    int(pa.compute.max(t["doc_id"]).as_py())
                    if t.num_rows else -1,
                )

            with ThreadPoolExecutor(max_workers=16) as ex:
                parts = list(ex.map(fpart, stat_files))
            n_docs = int(sum(p[0] for p in parts))
            total_tokens = int(sum(p[1] for p in parts))
            max_doc = int(max((p[2] for p in parts), default=-1))
        else:
            def _partial(t: pa.Table) -> pa.Table:
                return pa.table({
                    "n": pa.array([t.num_rows], pa.int64()),
                    "tok": pa.array([int(pa.compute.sum(t["tokens"]).as_py() or 0)]),
                    "maxd": pa.array([
                        int(pa.compute.max(t["doc_id"]).as_py())
                        if t.num_rows else -1
                    ]),
                })

            parts = ray.data.read_parquet(
                final, columns=["doc_id", "tokens"]
            ).map_batches(_partial, batch_format="pyarrow").take_all()
            n_docs = int(sum(p["n"] for p in parts))
            total_tokens = int(sum(p["tok"] for p in parts))
            max_doc = int(max((p["maxd"] for p in parts), default=-1))
        avgdl = total_tokens / n_docs if n_docs else 1.0
        cfg = {
            "n_docs": n_docs,
            "max_doc_id": max_doc,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "k1": K1,
            "b": B,
            "idf_exp": self.idf_exp,
            "analyzer": self.analyzer,
            "shard_range": self.shard_range,
            "num_buckets": self.num_buckets,
            "block": 128,
        }
        # atomic single-object PUT in both modes (readers never see a
        # torn config)
        self.store.put_json(os.path.join(self.out_dir, "config.json"), cfg)
        self.manifest.append(stage="config", fingerprint=fp, status="done",
                             wall_ms=int((time.time() - t0) * 1000))

    # -- stage 4: postings --------------------------------------------
    def build_postings(self, fingerprint: str):
        fp = _fingerprint("postings", fingerprint, self.shard_range,
                          self.num_buckets)
        if self.manifest.stage_done("postings", fp):
            return
        t0 = time.time()  # include dataset creation (file listing) in wall
        cfg = self.config()
        analyzed = ray.data.read_parquet(
            self.store.resolve("analyzed"),
            columns=["doc_id", "terms", "tfs"],
        )
        segments = analyzed.map_batches(
            SegmentEncode(self.shard_range, self.num_buckets),
            batch_format="pyarrow",
            batch_size=self.segment_batch_size,
        )
        # block-max norms come from each group's own shard slice of the
        # shard-partitioned doc_stats artifact — no global dense array
        merged = segments.groupby(["bucket", "shard"]).map_groups(
            make_merge_fn(self.store.resolve("doc_stats"),
                          cfg["avgdl"], self.shard_range),
            batch_format="pyarrow",
        )
        # small row groups: the serving engine reads postings per term
        # via row-group-pruned reads — one giant row group per file
        # would make every cold term read the whole file's blobs
        _write_stage(merged, self.store, "postings", self.manifest, fp,
                     t_start=t0, row_group_size=256)

    # -- stage 5: term_stats / lexicon --------------------------------
    # Below this artifact size the whole lexicon aggregation runs as one
    # driver-side Arrow group_by (saves ~1.5 s of fixed Ray shuffle/sort
    # launch); beyond it the distributed groupby + sort-rank path (the
    # 10^9-term web-scale lexicon) takes over — identical output.
    TERM_STATS_DRIVER_MAX_BYTES = 512 * 1024 * 1024

    def build_term_stats(self, fingerprint: str):
        fp = _fingerprint("term_stats", fingerprint)
        if self.manifest.stage_done("term_stats", fp):
            return
        t0 = time.time()
        post_dir = self.store.resolve("postings")
        post_files = [
            os.path.join(post_dir, f) for f in os.listdir(post_dir)
            if f.endswith(".parquet")
        ]
        total_bytes = sum(os.path.getsize(f) for f in post_files)
        if total_bytes <= self.TERM_STATS_DRIVER_MAX_BYTES:
            t = pq.read_table(post_dir, columns=["term", "df", "cf"])
            g = t.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
            g = g.take(pa.compute.sort_indices(
                g, sort_keys=[("term", "ascending")]))
            out = pa.table({
                "term": g["term"],
                "df": pa.compute.cast(g["df_sum"], pa.int64()),
                "cf": pa.compute.cast(g["cf_sum"], pa.int64()),
                # dense lexicographic ids (TermLexicon.java:1-30); id 0
                # is the absent-term sentinel, so ranks start at 1
                "term_id": pa.array(
                    np.arange(1, g.num_rows + 1, dtype=np.int32)),
            })
            tmp = self.store.stage_begin("term_stats", fp, clear=True)
            pq.write_table(out, os.path.join(tmp, "part-0.parquet"))
            final = self.store.stage_commit("term_stats", fp)
            self.manifest.record_partitions(
                "term_stats", final, fp, int((time.time() - t0) * 1000))
            return
        posts = ray.data.read_parquet(post_files, columns=["term", "df", "cf"])
        stats = posts.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
        )
        with_ids = assign_ranks(stats, "term", "rank")
        with_ids = with_ids.map_batches(
            lambda t: t.append_column(
                "term_id",
                pa.array(t["rank"].to_numpy(zero_copy_only=False) + 1, pa.int32()),
            ).drop_columns(["rank"]),
            batch_format="pyarrow",
        )
        _write_stage(with_ids, self.store, "term_stats", self.manifest, fp,
                     t_start=t0)

    # -- orchestration -------------------------------------------------
    def config(self) -> dict:
        with open(os.path.join(self.out_dir, "config.json")) as f:
            return json.load(f)

    def build(self, input_ds: ray.data.Dataset, input_kind: str = "pages",
              fingerprint: str = "input") -> str:
        if getattr(self.store, "fs", None) is None:
            # an fsspec-backed store handles remote visibility itself;
            # the probe protocol below is for plain shared-FS paths
            verify_shared_fs(self.out_dir)
        # fingerprints CHAIN: each stage's fp folds in its upstream
        # stage's fp (which already folds in analyzer/keep_positions/
        # shard params), so resuming into an out_dir after changing any
        # upstream parameter re-runs every downstream stage instead of
        # silently mixing artifacts from different configurations.
        if input_kind == "pages":
            self.build_docs_from_pages(input_ds, fingerprint)
        else:
            self.build_docs_from_documents(input_ds, fingerprint)
        fp_docs = (_fingerprint("docs", fingerprint, self.id_base)
                   if self.id_base else _fingerprint("docs", fingerprint))
        self.build_analyzed(fp_docs)
        fp_analyzed = _fingerprint(
            "analyzed", fp_docs, self.analyzer, self.keep_positions
        )
        self.build_doc_stats(fp_analyzed)
        fp_stats = _fingerprint("doc_stats", fp_analyzed, self.shard_range)
        self.build_postings(fp_stats)
        fp_postings = _fingerprint(
            "postings", fp_stats, self.shard_range, self.num_buckets
        )
        self.build_term_stats(fp_postings)
        if self.hunspell_resources is not None:
            # HunspellCompiler.compile analog: prune the supplied dic
            # to the indexed vocabulary, annotate fr: counts, write the
            # <field>.dic/.aff sidecar pair next to the index
            from ..analysis.hunspell import compile_restricted

            ts = pq.read_table(
                self.store.resolve("term_stats"),
                columns=["term", "cf"],
            )
            term_cf = dict(zip(ts["term"].to_pylist(),
                               ts["cf"].to_pylist()))
            dic_lines, aff_text = self.hunspell_resources
            kept = compile_restricted(
                dic_lines, aff_text, term_cf,
                os.path.join(self.out_dir, "hunspell"),
            )
            self.manifest.append(stage="hunspell", status="done",
                                 rows=kept, fingerprint="sidecar")
        return self.out_dir
