"""Result renderers (SURVEY.md §2.1 results-renderer row): the same
top-k hit list rendered as JSON / JSONL / CSV / HTML-concordance —
format hooks over one sink contract (``ResultsRenderer.java:1-18``).
"""

from __future__ import annotations

import csv
import io
import json


def _rows(hits, urls=None, snippets=None):
    out = []
    for rank, (doc_id, score) in enumerate(hits):
        row = {"rank": rank, "doc_id": int(doc_id), "score": float(score)}
        if urls is not None:
            row["url"] = urls.get(doc_id) if isinstance(urls, dict) else urls[doc_id]
        if snippets is not None and doc_id in snippets:
            row["snippet"] = snippets[doc_id]
        out.append(row)
    return out


def to_json(hits, q: str = "", urls=None, snippets=None) -> str:
    return json.dumps({"q": q, "total": len(hits),
                       "hits": _rows(hits, urls, snippets)},
                      ensure_ascii=False, indent=1)


def to_jsonl(hits, urls=None, snippets=None) -> str:
    return "\n".join(
        json.dumps(r, ensure_ascii=False) for r in _rows(hits, urls, snippets)
    )


def to_csv(hits, urls=None, snippets=None) -> str:
    rows = _rows(hits, urls, snippets)
    if not rows:
        return ""
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=list(rows[0]))
    w.writeheader()
    w.writerows(rows)
    return buf.getvalue()


def to_html(hits, q: str = "", urls=None, snippets=None) -> str:
    """Concordance-style list; snippet HTML (already ``<mark>``-ed by
    ops/snippets) is embedded as-is."""
    parts = [f'<ol class="results" data-q="{q}">']
    for r in _rows(hits, urls, snippets):
        label = r.get("url", r["doc_id"])
        snip = r.get("snippet", "")
        parts.append(
            f'<li><a href="#doc{r["doc_id"]}">{label}</a> '
            f'<span class="score">{r["score"]:.4f}</span>'
            f'<div class="snippet">{snip}</div></li>'
        )
    parts.append("</ol>")
    return "\n".join(parts)


def order_hits(hits, order: str = "score"):
    """Explicit /results sort modes (OpResults.java three walks):

    - ``score``: relevance — score desc, doc asc (TopArray rule; the
      input order from the engine, re-asserted here);
    - ``doc``: docId order — the reference's "date" walk (ingestion
      order IS chronological order in its corpora; here doc ids are
      url-rank, so this is the deterministic corpus walk);
    - ``doc_desc``: reverse docId walk.
    """
    if order == "score":
        return sorted(hits, key=lambda h: (-h[1], h[0]))
    if order == "doc":
        return sorted(hits, key=lambda h: h[0])
    if order == "doc_desc":
        return sorted(hits, key=lambda h: -h[0])
    raise ValueError(f"unknown order {order!r}")
