"""Micro-batch streaming ingestion over the incremental IndexWriter.

The near-real-time indexing loop every Lucene deployment runs (commit
cadence + merge policy), re-expressed over generations: watch an input
directory for new parquet page files, index each backlog batch as ONE
delta generation (cost ∝ batch), bound the generation count with the
tiered merge policy, repeat.  Readers open the index root at any time
and see a consistent snapshot (the generations.json swap is atomic);
a crash mid-batch resumes into the same generation on restart (the
state-file counter + per-stage manifest), and files are recorded as
ingested only AFTER the generation publishes.

Usage::

    python scripts/stream_ingest.py --root /tmp/idx --watch /data/in \\
        [--poll 5] [--max-generations 8] [--analyzer french] [--once]

``--once`` drains the current backlog and exits (cron-style; also the
test hook).  At cluster scale this loop runs on one node (the writer
is single-writer by write.lock); ingestion itself is distributed Ray
Data work.

Exactly-once accounting: the ingested-file ledger is the generation's
``meta`` dict, persisted in the SAME atomic generations.json swap that
publishes the generation — a crash leaves either (generation + its
files recorded) or (neither), never a half state, and merges carry the
ledger forward.  The backlog digest folds into the build fingerprint,
so a retry whose backlog GREW rebuilds the generation's stages instead
of resuming checkpoints that are missing the new files.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _seen(writer) -> set[str]:
    out: set[str] = set()
    for m in writer.meta().values():
        out |= set(m.get("ingested_files", []))
    return out


def drain_once(writer, watch_dir: str, max_generations: int) -> dict:
    """Ingest every not-yet-seen parquet file under ``watch_dir`` as
    one delta generation, then apply the merge policy.  Returns a
    summary dict (files, generation, merged)."""
    import ray.data

    seen = _seen(writer)
    names = sorted(
        f for f in os.listdir(watch_dir)
        if f.endswith(".parquet") and f not in seen
    )
    if not names:
        return {"files": 0, "generation": None, "merged": None}
    backlog = [os.path.join(watch_dir, f) for f in names]
    digest = hashlib.blake2b(
        "\0".join(names).encode(), digest_size=8).hexdigest()
    gen = writer.add_documents(
        ray.data.read_parquet(backlog), input_kind="pages",
        fingerprint_extra=digest,
        meta={"ingested_files": names, "watch_dir": watch_dir},
    )
    merged = writer.maybe_merge(max_generations=max_generations)
    if merged:
        writer.prune()
    return {"files": len(backlog), "generation": gen, "merged": merged}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="stream_ingest")
    p.add_argument("--root", required=True)
    p.add_argument("--watch", required=True)
    p.add_argument("--poll", type=float, default=5.0)
    p.add_argument("--max-generations", type=int, default=8)
    p.add_argument("--analyzer", default="french",
                   choices=["french", "simple"])
    p.add_argument("--once", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from alix_ray.index.incremental import IndexWriter

    w = IndexWriter(args.root, analyzer=args.analyzer)
    try:
        while True:
            out = drain_once(w, args.watch, args.max_generations)
            print(json.dumps(out), flush=True)
            if args.once:
                break
            time.sleep(args.poll)
    except KeyboardInterrupt:
        pass
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
