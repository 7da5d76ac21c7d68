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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
