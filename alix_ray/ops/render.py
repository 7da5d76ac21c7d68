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


def to_docx(hits, q: str = "", urls=None, snippets=None) -> bytes:
    """Minimal valid .docx (OOXML) of the hit list — stdlib zipfile
    only, no python-docx (completes the reference's renderer set;
    ResultsRenderer.java:1-18).  One heading paragraph + one paragraph
    per hit; snippet text is embedded plain (``<mark>`` stripped)."""
    import io
    import re as _re
    import zipfile
    from xml.sax.saxutils import escape

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

    def para(text, bold=False):
        rpr = "<w:rPr><w:b/></w:rPr>" if bold else ""
        return (f"<w:p><w:r>{rpr}<w:t xml:space=\"preserve\">"
                f"{escape(text)}</w:t></w:r></w:p>")

    body = [para(f"Results: {q}" if q else "Results", bold=True)]
    for r in _rows(hits, urls, snippets):
        label = str(r.get("url", r["doc_id"]))
        line = f"{r['rank'] + 1}. {label}  (score {r['score']:.4f})"
        body.append(para(line))
        if "snippet" in r:
            body.append(para(_re.sub(r"</?mark>", "", r["snippet"])))
    document = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{"".join(body)}'
        f"</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", document)
    return buf.getvalue()
