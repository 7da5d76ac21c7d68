"""Command-line entry points (the reference's picocli tool set,
SURVEY.md §3.3, re-expressed over the Ray engine).

    python -m alix_ray build   --input pages.parquet --out /tmp/idx \\
                               [--kind pages|documents] [--analyzer french]
    python -m alix_ray search  --index /tmp/idx --q "table stream" [-k 10]
    python -m alix_ray doc     --index /tmp/idx --id 42
    python -m alix_ray suggest --index /tmp/idx --prefix st [-k 10]
    python -m alix_ray spell   --index /tmp/idx --word tabel [-k 10]
    python -m alix_ray tokens  --input docs.parquet --out toks.parquet
    python -m alix_ray w2v     --input docs.parquet --out corpus.txt
    python -m alix_ray add     --index /tmp/idx --input delta.parquet \\
                               [--kind pages|documents] [--update]
    python -m alix_ray delete  --index /tmp/idx --url https://… | --ids 1,2
    python -m alix_ray compact --index /tmp/idx [--prune]
    python -m alix_ray serve   --index main=/tmp/idx [--port 8080]

The CLI owns its Ray session (guarded init + shutdown) — library code
never does (driver contract)."""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    ray = _ray_session()
    import ray.data

    from .stages.build import IndexBuilder

    b = IndexBuilder(args.out, analyzer=args.analyzer,
                     keep_positions=args.positions)
    ds = ray.data.read_parquet(args.input)
    b.build(ds, input_kind=args.kind, fingerprint=args.input)
    print(json.dumps({"index": args.out, "config": b.config()}))
    ray.shutdown()
    return 0


def cmd_search(args) -> int:
    from .index.engine import BM25Index

    ix = BM25Index(args.index)
    hits = ix.search(args.q, args.k)
    from .ops.render import order_hits, to_csv, to_json, to_jsonl

    hits = order_hits(hits, args.order)
    fmt = {"json": to_json, "jsonl": to_jsonl, "csv": to_csv}[args.format]
    out = fmt(hits, args.q) if args.format == "json" else fmt(hits)
    print(out)
    return 0


def cmd_doc(args) -> int:
    from .index.engine import BM25Index

    ix = BM25Index(args.index)
    print(json.dumps(ix.document(args.id), ensure_ascii=False, default=str))
    return 0


def cmd_suggest(args) -> int:
    from .index.engine import BM25Index
    from .ops.analytics import suggest

    ix = BM25Index(args.index)
    out = suggest(ix.suggest_frame(), args.prefix, args.k)
    print(out.to_csv(index=False))
    return 0


def cmd_spell(args) -> int:
    from .analysis.hunspell import spell_suggest
    from .index.engine import BM25Index

    ix = BM25Index(args.index)
    for term, dist, cf in spell_suggest(args.word, ix.cf, args.k):
        print(f"{term}\t{dist}\t{cf}")
    return 0


def cmd_tokens(args) -> int:
    """Token-table export (sqlite.Insert analog — Parquet sink)."""
    ray = _ray_session()
    import ray.data

    from .ops.export import token_table

    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    token_table(ds).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_w2v(args) -> int:
    """POS-filtered word2vec corpus lines (Analyze4vec analog)."""
    ray = _ray_session()
    import ray.data

    from .ops.export import w2v_corpus

    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    df = w2v_corpus(ds).to_pandas()
    with open(args.out, "w") as f:
        for line in df["line"]:
            f.write(line + "\n")
    print(json.dumps({"out": args.out, "lines": len(df)}))
    ray.shutdown()
    return 0


def cmd_report(args) -> int:
    """Vocabulary reports (Keywords/Unknowns/Names/Expressions CLI
    analogs; ops/reports.py)."""
    ray = _ray_session()
    import ray.data

    from .ops import reports

    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    if args.kind == "keywords":
        df = reports.keywords_report(ds, k=args.k).to_pandas()
    elif args.kind == "unknowns":
        df = reports.unknowns_report(ds, k=args.k)
    elif args.kind == "names":
        df = reports.names_report(ds, k=args.k)
    else:
        df = reports.expressions_report(ds, k=args.k)
    print(df.to_csv(sep="\t", index=False), end="")
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Corpus curation: quality gate -> dedup -> split -> packing,
    one Parquet directory per split (pipelines/curate.py)."""
    ray = _ray_session()
    import ray.data

    from .pipelines.curate import curate_to_dir

    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    counts = curate_to_dir(ds, args.out, seq_len=args.seq_len,
                           min_tokens=args.min_tokens,
                           min_alpha=args.min_alpha)
    print(json.dumps({"out": args.out, "splits": counts}))
    ray.shutdown()
    return 0


def cmd_bpe(args) -> int:
    """Train a BPE merge table on a corpus and write it as TSV
    (rank, left, right); optionally report total encoded tokens."""
    ray = _ray_session()
    import ray.data

    from .ops.bpe import encode_counts, train_bpe

    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    merges = train_bpe(ds, n_merges=args.merges)
    with open(args.out, "w") as f:
        for i, (a, b) in enumerate(merges):
            f.write(f"{i}\t{a}\t{b}\n")
    result = {"out": args.out, "merges": len(merges)}
    if args.count:
        result["total_bpe_tokens"] = int(
            encode_counts(ds, merges).sum("n_bpe"))
    print(json.dumps(result))
    ray.shutdown()
    return 0


def cmd_semdedup(args) -> int:
    """Semantic dedup over an embedding parquet: k-means clustering
    (or an existing cluster column via --cluster-col) then SemDeDup
    within-cluster cosine pruning; writes (id, cluster, kept)
    parquet and prints the keep summary."""
    ray = _ray_session()
    import ray.data

    from .ops.semdedup import kmeans_assign, semdedup_prune

    ds = ray.data.read_parquet(args.input)
    if args.cluster_col:
        clustered, ccol = ds, args.cluster_col
    else:
        clustered = kmeans_assign(ds, k=args.k, iters=args.iters,
                                  id_col=args.id_col,
                                  vec_col=args.vec_col, append=True)
        ccol = "cluster"
    res = semdedup_prune(clustered, tau=args.tau, cluster_col=ccol,
                         id_col=args.id_col,
                         vec_col=args.vec_col).materialize()
    res.write_parquet(args.out)
    import pyarrow as pa

    def as_int(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["kept"].cast(pa.int64())})

    kept = int(res.map_batches(as_int, batch_format="pyarrow").sum("k"))
    total = res.count()
    print(json.dumps({"out": args.out, "total": total, "kept": kept,
                      "dropped": total - kept, "tau": args.tau}))
    ray.shutdown()
    return 0


def cmd_add(args) -> int:
    """Incremental add: index new parquet input as a delta generation
    (IndexWriter.addDocuments analog)."""
    ray = _ray_session()
    import ray.data

    from .index.incremental import IndexWriter

    w = IndexWriter(args.index, analyzer=args.analyzer,
                    keep_positions=args.positions)
    gen = w.add_documents(ray.data.read_parquet(args.input),
                          input_kind=args.kind, update=args.update)
    print(json.dumps({"index": args.index, "generation": gen,
                      "generations": w.generations()}))
    ray.shutdown()
    return 0


def cmd_delete(args) -> int:
    """Tombstone documents by url or id (deleteDocuments analog)."""
    ray = _ray_session()
    from .index.incremental import IndexWriter

    w = IndexWriter(args.index)
    if args.url:
        n = w.delete_documents(urls=args.url)
    else:
        n = w.delete_documents(
            doc_ids=[int(v) for v in args.ids.split(",") if v])
    print(json.dumps({"index": args.index, "deleted": n}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Merge generations, dropping tombstoned docs (forceMerge(1))."""
    ray = _ray_session()
    from .index.incremental import IndexWriter

    w = IndexWriter(args.index)
    gen = w.compact()
    pruned = w.prune() if args.prune else []
    print(json.dumps({"index": args.index, "generation": gen,
                      "pruned": pruned}))
    ray.shutdown()
    return 0


def cmd_snapshot(args) -> int:
    """Point-in-time hard-link snapshot (SnapshotDeletionPolicy)."""
    from .index.incremental import IndexWriter

    info = IndexWriter(args.index).snapshot(args.out)
    print(json.dumps(info))
    return 0


def cmd_info(args) -> int:
    """Index state summary: generations, sizes, tombstones, configs."""
    import os

    from .index.engine import _generation_dirs, _load_tombstones

    gens = _generation_dirs(args.index)
    out = {"index": args.index, "generations": [], "n_deleted": 0}
    for g in gens:
        with open(os.path.join(g, "config.json")) as f:
            cfg = json.load(f)
        out["generations"].append({
            "dir": g, "n_docs": cfg["n_docs"],
            "max_doc_id": cfg["max_doc_id"], "avgdl": cfg["avgdl"],
            "analyzer": cfg["analyzer"],
        })
    out["n_docs"] = sum(g["n_docs"] for g in out["generations"])
    out["n_deleted"] = int(len(_load_tombstones(args.index)))
    out["n_live"] = out["n_docs"] - out["n_deleted"]
    print(json.dumps(out))
    return 0


def cmd_check(args) -> int:
    """Artifact integrity verification (CheckIndex analog)."""
    ray = _ray_session()
    from .index.check import check_index

    report = check_index(args.index)
    print(json.dumps(report))
    ray.shutdown()
    return 0 if report["ok"] else 1


def cmd_serve(args) -> int:
    """HTTP op façade over one or more indexes (AlixServlet analog);
    ``--index name=dir`` repeatable, plain dirs get name 'main'."""
    from .index.http import AlixHTTPServer

    indexes = {}
    for spec in args.index:
        name, sep, d = spec.partition("=")
        # "name=dir" (dir may itself contain '='); bare dir → "main"
        indexes[name if sep else "main"] = d if sep else name
    srv = AlixHTTPServer(indexes, host=args.host, port=args.port,
                         sf_dir=args.sf_dir)
    print(json.dumps({"host": srv.host, "port": srv.port,
                      "indexes": sorted(indexes)}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.close()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="alix_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from parquet input")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--kind", default="documents",
                   choices=["pages", "documents"])
    b.add_argument("--analyzer", default="french",
                   choices=["french", "simple"])
    b.add_argument("--positions", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--q", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--order", default="score",
                   choices=["score", "doc", "doc_desc"])
    s.add_argument("--format", default="json",
                   choices=["json", "jsonl", "csv"])
    s.set_defaults(fn=cmd_search)

    d = sub.add_parser("doc", help="fetch one stored document")
    d.add_argument("--index", required=True)
    d.add_argument("--id", type=int, required=True)
    d.set_defaults(fn=cmd_doc)

    g = sub.add_parser("suggest", help="diacritic-folded term suggestion")
    g.add_argument("--index", required=True)
    g.add_argument("--prefix", required=True)
    g.add_argument("-k", type=int, default=10)
    g.set_defaults(fn=cmd_suggest)

    sp = sub.add_parser("spell", help="vocabulary-restricted spell suggest")
    sp.add_argument("--index", required=True)
    sp.add_argument("--word", required=True)
    sp.add_argument("-k", type=int, default=10)
    sp.set_defaults(fn=cmd_spell)

    t = sub.add_parser("tokens", help="token-table export")
    t.add_argument("--input", required=True)
    t.add_argument("--out", required=True)
    t.set_defaults(fn=cmd_tokens)

    w = sub.add_parser("w2v", help="word2vec corpus export")
    w.add_argument("--input", required=True)
    w.add_argument("--out", required=True)
    w.set_defaults(fn=cmd_w2v)

    rp = sub.add_parser("report", help="vocabulary reports "
                        "(keywords/unknowns/names/expressions)")
    rp.add_argument("--input", required=True)
    rp.add_argument("--kind", default="keywords",
                    choices=["keywords", "unknowns", "names",
                             "expressions"])
    rp.add_argument("-k", type=int, default=100)
    rp.set_defaults(fn=cmd_report)

    cu = sub.add_parser("curate", help="quality gate -> dedup -> split "
                        "-> packing, parquet dir per split")
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-tokens", type=int, default=32)
    cu.add_argument("--min-alpha", type=float, default=0.8)
    cu.add_argument("--seq-len", type=int, default=2048)
    cu.set_defaults(fn=cmd_curate)

    bp = sub.add_parser("bpe", help="train a BPE merge table (TSV out)")
    bp.add_argument("--input", required=True)
    bp.add_argument("--out", required=True)
    bp.add_argument("--merges", type=int, default=200)
    bp.add_argument("--count", action="store_true",
                    help="also report total encoded tokens")
    bp.set_defaults(fn=cmd_bpe)

    sd = sub.add_parser("semdedup", help="k-means + SemDeDup semantic "
                        "dedup over an embedding parquet")
    sd.add_argument("--input", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument("--tau", type=float, default=0.9)
    sd.add_argument("--k", type=int, default=64)
    sd.add_argument("--iters", type=int, default=3)
    sd.add_argument("--cluster-col", default=None,
                    help="use an existing cluster column instead of k-means")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")
    sd.set_defaults(fn=cmd_semdedup)

    a = sub.add_parser("add", help="incremental add (delta generation)")
    a.add_argument("--index", required=True)
    a.add_argument("--input", required=True)
    a.add_argument("--kind", default="pages",
                   choices=["pages", "documents"])
    a.add_argument("--analyzer", default="french",
                   choices=["french", "simple"])
    a.add_argument("--positions", action="store_true")
    a.add_argument("--update", action="store_true",
                   help="tombstone older docs whose url reappears")
    a.set_defaults(fn=cmd_add)

    de = sub.add_parser("delete", help="tombstone documents")
    de.add_argument("--index", required=True)
    de.add_argument("--url", action="append", default=[])
    de.add_argument("--ids", default="", help="comma-separated doc ids")
    de.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact", help="merge generations, drop tombstones")
    c.add_argument("--index", required=True)
    c.add_argument("--prune", action="store_true",
                   help="remove superseded generation dirs")
    c.set_defaults(fn=cmd_compact)

    ck = sub.add_parser("check", help="artifact integrity verification")
    ck.add_argument("--index", required=True)
    ck.set_defaults(fn=cmd_check)

    sn = sub.add_parser("snapshot", help="point-in-time index snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)
    sn.set_defaults(fn=cmd_snapshot)

    inf = sub.add_parser("info", help="index state summary")
    inf.add_argument("--index", required=True)
    inf.set_defaults(fn=cmd_info)

    sv = sub.add_parser("serve", help="HTTP op facade over indexes")
    sv.add_argument("--index", action="append", required=True,
                    metavar="NAME=DIR")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--sf-dir", default=None,
                    help="corpus dir for table-scan ops (chrono etc.)")
    sv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
