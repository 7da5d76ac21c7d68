"""Cluster job entrypoint for the index build — the ``ray job submit``
deployment path of the north rule::

    ray job submit --working-dir . -- \\
        python scripts/build_job.py --input s3://bucket/pages/ \\
        --out /shared/index --kind pages

On a cluster, ``ray.init(address="auto")`` attaches to the running
head node; standalone it falls back to a local session.  The build is
resumable: re-submitting the same job against the same ``--out``
skips every stage whose manifest fingerprint matches (per-partition
lineage rows in ``manifest.jsonl`` are the progress record the north
rule requires).  Prints one JSON line with the stage walls + config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet path/dir/glob of pages or documents")
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--kind", default="pages", choices=["pages", "documents"])
    p.add_argument("--analyzer", default="french",
                   choices=["french", "simple"])
    p.add_argument("--positions", action="store_true")
    p.add_argument("--shard-range", type=int, default=None,
                   help="docs per posting shard (skew bound)")
    p.add_argument("--num-buckets", type=int, default=None,
                   help="term hash buckets for the merge shuffle")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # on a cluster the job runner exports RAY_ADDRESS; standalone
        # runs get a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from alix_ray.stages.build import DEFAULT_NUM_BUCKETS, DEFAULT_SHARD_RANGE
    from alix_ray.stages.build import IndexBuilder, Manifest

    t0 = time.time()
    b = IndexBuilder(
        args.out,
        analyzer=args.analyzer,
        keep_positions=args.positions,
        shard_range=args.shard_range or DEFAULT_SHARD_RANGE,
        num_buckets=args.num_buckets or DEFAULT_NUM_BUCKETS,
    )
    ds = ray.data.read_parquet(args.input)
    b.build(ds, input_kind=args.kind, fingerprint=f"{args.input}")
    wall = time.time() - t0

    stages = {
        r["stage"]: round(r["wall_ms"] / 1000.0, 3)
        for r in Manifest(args.out).rows()
        if r.get("status") == "done" and "wall_ms" in r
    }
    print(json.dumps({
        "index": args.out, "wall_sec": round(wall, 3), "stages": stages,
        "config": b.config(),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
