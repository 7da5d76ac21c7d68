"""Artifact store abstraction: how built index stages are committed,
resolved, and journaled.

Two implementations of one publish protocol:

- ``RenameStore`` (default) — the staged ``<stage>.tmp`` → atomic
  directory-rename publish the builder has always used.  Requires ONE
  shared POSIX filesystem mounted on every node (NFS/Lustre); guarded
  by ``build.verify_shared_fs``.
- ``PointerStore`` — the object-store protocol: every stage version is
  written under an immutable versioned prefix
  (``.versions/<stage>/<fingerprint>/``) and COMMITTED by atomically
  putting a small pointer object (``_ptr/<stage>.json``).  The only
  storage primitives used are PUT (whole-object write), GET, LIST,
  per-object DELETE, and COPY — exactly the S3-style API; there are NO
  directory renames anywhere on the publish path (single-file
  ``os.replace`` is the local simulation of an atomic single-key PUT).
  Intra-stage resume checkpoints commit with ``_SUCCESS`` marker
  objects (ignored by every parquet reader in the repo: pyarrow
  datasets skip ``_``/``.`` prefixes and ``_walk_parquet`` filters on
  the ``.parquet`` suffix).  The lineage journal becomes PUT-only too
  (``ObjectManifest``: one immutable object per append under
  ``manifest.d/``).

The sandbox has no object-store endpoint or fsspec backends, so
``PointerStore`` runs against a local directory while restricting
itself to object-store-legal primitives (asserted by
``tests/test_store.py``, which fails the build if any directory rename
happens); pointing it at a real ``s3://`` bucket additionally needs an
fsspec filesystem threaded through the ``pq``/``ray.data`` calls.

Reference parity note: the reference publishes its Lucene index by an
atomic directory swap on one machine (TeiIngester writes + commit);
this module re-expresses that durability contract for the two storage
backends a multi-node deployment actually has.
"""

from __future__ import annotations

import json
import os
import shutil
import time


# ---------------------------------------------------------------------
# manifests
# ---------------------------------------------------------------------


class _ManifestBase:
    """Append-only lineage journal: stage/partition rows with
    fingerprints, used for stage-skip resume and bench lineage."""

    def rows(self) -> list[dict]:  # pragma: no cover - abstract
        raise NotImplementedError

    def append_rows(self, rows: list[dict]) -> None:  # pragma: no cover
        raise NotImplementedError

    def append(self, **row) -> None:
        row.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
        self.append_rows([row])

    def stage_done(self, stage: str, fingerprint: str) -> bool:
        for r in self.rows():
            if (
                r.get("stage") == stage
                and r.get("status") == "done"
                and r.get("fingerprint") == fingerprint
            ):
                return True
        return False

    def record_partitions(self, stage: str, out_dir: str, fingerprint: str,
                          wall_ms: int) -> None:
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        names = sorted(
            n for n in os.listdir(out_dir) if n.endswith(".parquet")
        )

        def meta(name):
            p = os.path.join(out_dir, name)
            return name, pq.read_metadata(p).num_rows, os.path.getsize(p)

        # footer reads are I/O-bound and independent — a serial loop
        # over ~1000 partition files costs ~1s of pure driver wall
        with ThreadPoolExecutor(max_workers=16) as ex:
            metas = list(ex.map(meta, names))
        ts = time.strftime("%Y-%m-%dT%H:%M:%S")
        rows = [
            {"stage": stage, "partition": name, "fingerprint": fingerprint,
             "rows": nrows, "bytes": nbytes, "status": "partition", "ts": ts}
            for name, nrows, nbytes in metas
        ]
        rows.append({"stage": stage, "fingerprint": fingerprint,
                     "rows": sum(r["rows"] for r in rows), "wall_ms": wall_ms,
                     "status": "done", "ts": ts})
        self.append_rows(rows)


class Manifest(_ManifestBase):
    """Journal file (``manifest.jsonl``) — shared-POSIX-FS backend."""

    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "manifest.jsonl")

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def append_rows(self, rows: list[dict]) -> None:
        with open(self.path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


class ObjectManifest(_ManifestBase):
    """PUT-only journal: each ``append`` is one immutable object under
    ``manifest.d/`` (object stores cannot append).  Object names embed
    (ns-timestamp, pid, seq) so a lexicographic list replays appends in
    order within a driver and is collision-free across drivers."""

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "manifest.d")
        self._seq = 0

    def rows(self) -> list[dict]:
        if not os.path.isdir(self.dir):
            return []
        out: list[dict] = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    def append_rows(self, rows: list[dict]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        self._seq += 1
        name = f"{time.time_ns():020d}-{os.getpid()}-{self._seq:06d}.jsonl"
        _put_text(
            os.path.join(self.dir, name),
            "".join(json.dumps(r) + "\n" for r in rows),
        )


# ---------------------------------------------------------------------
# stores
# ---------------------------------------------------------------------


def _clear_dir_objects(d: str) -> None:
    """Delete everything under ``d`` object-by-object (the DELETE-
    prefix idiom; no directory rename involved)."""
    if os.path.isdir(d):
        shutil.rmtree(d)  # locally rmtree IS per-object deletes
    os.makedirs(d, exist_ok=True)


def _put_text(path: str, text: str) -> None:
    """Atomic whole-file write — the local simulation of a single-key
    object PUT (write a unique temp object, then ``os.replace``, which
    is atomic for a single FILE; never a directory rename)."""
    tmp = f"{path}.put{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


class RenameStore:
    """Staged-dir + atomic-rename publish (shared POSIX FS)."""

    kind = "rename"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def make_manifest(self) -> Manifest:
        return Manifest(self.root)

    # -- stage publish ------------------------------------------------
    def stage_begin(self, stage: str, fingerprint: str,
                    clear: bool = True) -> str:
        tmp = os.path.join(self.root, stage + ".tmp")
        if clear:
            _clear_dir_objects(tmp)
        else:
            os.makedirs(tmp, exist_ok=True)
        return tmp

    def stage_commit(self, stage: str, fingerprint: str) -> str:
        tmp = os.path.join(self.root, stage + ".tmp")
        final = os.path.join(self.root, stage)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # a pointer left by an earlier pointer-mode build of this root
        # would otherwise shadow the plain dir just published —
        # resolve_stage prefers pointers
        stale_ptr = os.path.join(self.root, "_ptr", f"{stage}.json")
        if os.path.exists(stale_ptr):
            os.remove(stale_ptr)
        return final

    def resolve(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    # -- intra-stage resume parts -------------------------------------
    def part_begin(self, parent: str, key: str) -> str:
        tmp = os.path.join(parent, key + ".tmp")
        _clear_dir_objects(tmp)
        return tmp

    def part_commit(self, parent: str, key: str) -> str:
        tmp = os.path.join(parent, key + ".tmp")
        final = os.path.join(parent, key)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return final

    def part_done(self, parent: str, key: str) -> bool:
        return os.path.isdir(os.path.join(parent, key))

    def part_path(self, parent: str, key: str) -> str:
        return os.path.join(parent, key)

    # -- small primitives ---------------------------------------------
    def move_file(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def copy_file(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)

    def put_json(self, path: str, obj) -> None:
        _put_text(path, json.dumps(obj, indent=1))


class PointerStore:
    """Immutable versioned prefixes + atomic pointer commit (the
    object-store publish protocol; see module docstring)."""

    kind = "pointer"

    def __init__(self, root: str):
        self.root = root
        self.ptr_dir = os.path.join(root, "_ptr")
        os.makedirs(self.ptr_dir, exist_ok=True)

    def make_manifest(self) -> ObjectManifest:
        return ObjectManifest(self.root)

    def _version_dir(self, stage: str, fingerprint: str) -> str:
        return os.path.join(self.root, ".versions", stage, fingerprint)

    # -- stage publish ------------------------------------------------
    def stage_begin(self, stage: str, fingerprint: str,
                    clear: bool = True) -> str:
        d = self._version_dir(stage, fingerprint)
        if clear:
            _clear_dir_objects(d)  # crashed attempt → delete its objects
        else:
            os.makedirs(d, exist_ok=True)
        return d

    def stage_commit(self, stage: str, fingerprint: str) -> str:
        d = self._version_dir(stage, fingerprint)
        rel = os.path.relpath(d, self.root)
        self.put_json(
            os.path.join(self.ptr_dir, f"{stage}.json"),
            {"path": rel, "fingerprint": fingerprint,
             "ts": time.strftime("%Y-%m-%dT%H:%M:%S")},
        )
        return d

    def resolve(self, stage: str) -> str:
        return resolve_stage(self.root, stage)

    # -- intra-stage resume parts -------------------------------------
    # A part commits by PUTting a `_SUCCESS` marker object; leftover
    # objects from an uncommitted attempt are deleted per-object before
    # the rewrite.  Every parquet reader here ignores the marker
    # (pyarrow datasets skip `_` prefixes; _walk_parquet filters on the
    # .parquet suffix).
    def part_begin(self, parent: str, key: str) -> str:
        # always clear: the caller only begins a part it has decided to
        # (re)write, and leftovers — including a stale _SUCCESS from a
        # crash between part_commit and the lineage row — must never
        # mix with the new attempt's objects
        d = os.path.join(parent, key)
        _clear_dir_objects(d)
        return d

    def part_commit(self, parent: str, key: str) -> str:
        d = os.path.join(parent, key)
        _put_text(os.path.join(d, "_SUCCESS"), "")
        return d

    def part_done(self, parent: str, key: str) -> bool:
        return os.path.exists(os.path.join(parent, key, "_SUCCESS"))

    def part_path(self, parent: str, key: str) -> str:
        return os.path.join(parent, key)

    # -- small primitives ---------------------------------------------
    def move_file(self, src: str, dst: str) -> None:
        # object-store move = server-side COPY + DELETE (no rename)
        shutil.copyfile(src, dst)
        os.remove(src)

    def copy_file(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)

    def put_json(self, path: str, obj) -> None:
        _put_text(path, json.dumps(obj, indent=1))

    # -- garbage collection -------------------------------------------
    def prune_versions(self) -> list[str]:
        """Delete superseded version prefixes (immutable-prefix
        publishes accumulate garbage by design).  Scoped to stages
        that HAVE a committed pointer, so a build that crashed before
        its first commit keeps its staging prefix (the analyzed resume
        checkpoints live there).  Do NOT run concurrently with a
        build: an in-progress rebuild's new prefix has no pointer yet
        and would be collected."""
        current, pointed_stages = set(), set()
        for name in os.listdir(self.ptr_dir):
            if name.endswith(".json"):
                with open(os.path.join(self.ptr_dir, name)) as f:
                    current.add(os.path.normpath(json.load(f)["path"]))
                pointed_stages.add(name[: -len(".json")])
        removed = []
        vroot = os.path.join(self.root, ".versions")
        if not os.path.isdir(vroot):
            return removed
        for stage in os.listdir(vroot):
            if stage not in pointed_stages:
                continue  # never committed → resume state, keep
            sdir = os.path.join(vroot, stage)
            for fp in os.listdir(sdir):
                rel = os.path.normpath(os.path.relpath(
                    os.path.join(sdir, fp), self.root))
                if rel not in current:
                    shutil.rmtree(os.path.join(sdir, fp))
                    removed.append(rel)
        return removed


def make_store(root: str, kind: str = "rename"):
    if kind == "rename":
        return RenameStore(root)
    if kind == "pointer":
        return PointerStore(root)
    raise ValueError(f"unknown artifact store kind {kind!r}")


def resolve_stage(root: str, stage: str) -> str:
    """Current committed directory for ``stage`` under an index root,
    without knowing which store built it: follow the ``_ptr`` pointer
    if one exists (PointerStore build), else the plain subdirectory
    (RenameStore build).  Every reader resolves through this."""
    ptr = os.path.join(root, "_ptr", f"{stage}.json")
    if os.path.exists(ptr):
        with open(ptr) as f:
            return os.path.join(root, json.load(f)["path"])
    return os.path.join(root, stage)
