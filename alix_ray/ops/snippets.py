"""Snippet extraction + highlighting (SURVEY.md §2.9).

Re-expresses the reference's span-walk → merge → hilite chain
(``SpanWalker.java:50``, ``DocSnippets.java:47``,
``HiliteSnippets.java:60``) as a per-row batch transform:

- match positions of query terms are found in the analyzed token
  stream of each doc;
- raw spans merge while ``start ≤ current_end + merge_gap`` (the
  DocSnippets online merge rule, ``DocSnippets.java:1-12``);
- each merged span is scored ThemeWords-style: Σ of *distinct* matched
  terms' BM25 idf weights (``SnippetScorer.java:23`` — dedup per
  snippet);
- highlighting wraps matched tokens in ``<mark>`` on the raw text
  (HiliteSnippets role), using the simple profile's token offsets.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

_WORD_RE = re.compile(r"[a-z0-9]+")


def _attr(v) -> str:
    """XML-attribute-escape a milestone unit (document-controlled)."""
    from xml.sax.saxutils import escape

    return escape(str(v), {'"': "&quot;"})


def doc_snippets(text: str, terms: set[str], merge_gap: int = 6,
                 ctx: int = 3, idf: dict | None = None,
                 milestones=None):
    """One doc → list of (start_tok, end_tok, score, html) snippets.

    ``milestones``: optional ``[(char_offset, unit), ...]`` structural
    events (page/section breaks); events falling inside a fragment are
    emitted as ``<milestone unit="..."/>`` markers at their position —
    the reference's milestone events inside hilite fragments
    (``HiliteSnippets.java:60``).  An event landing inside a ``<mark>``
    is emitted immediately after it (marks are never split)."""
    matches = []  # (token_index, char_start, char_end, term)
    tokens = []
    for m in _WORD_RE.finditer(text.lower()):
        tokens.append((m.start(), m.end(), m.group(0)))
        if m.group(0) in terms:
            matches.append((len(tokens) - 1, m.start(), m.end(), m.group(0)))
    if not matches:
        return []
    # online merge: span joins previous while start <= cur_end + gap
    spans = []
    cur = [matches[0][0], matches[0][0], {matches[0][3]}]
    for ti, _, _, term in matches[1:]:
        if ti <= cur[1] + merge_gap:
            cur[1] = ti
            cur[2].add(term)
        else:
            spans.append(cur)
            cur = [ti, ti, {term}]
    spans.append(cur)
    out = []
    for start, end, matched in spans:
        score = (
            sum(idf.get(t, 0.0) for t in matched) if idf else float(len(matched))
        )
        lo = max(0, start - ctx)
        hi = min(len(tokens), end + 1 + ctx)
        char_lo = tokens[lo][0]
        char_hi = tokens[hi - 1][1]
        frag = text[char_lo:char_hi]
        # hilite: wrap matched tokens (offset-shifted into the fragment)
        marks = [
            (cs - char_lo, ce - char_lo)
            for ti, cs, ce, _ in matches
            if start <= ti <= end
        ]
        rel_ms = sorted(
            (off - char_lo, unit)
            for off, unit in (milestones or [])
            if char_lo <= off < char_hi
        )
        html = []
        prev = 0
        mi = 0
        for cs, ce in marks:
            while mi < len(rel_ms) and rel_ms[mi][0] <= cs:
                p, unit = rel_ms[mi]
                mi += 1
                if p < prev:  # inside the previous mark — emit after it
                    html.append(f'<milestone unit="{_attr(unit)}"/>')
                    continue
                html.append(frag[prev:p])
                html.append(f'<milestone unit="{_attr(unit)}"/>')
                prev = p
            html.append(frag[prev:cs])
            html.append(f"<mark>{frag[cs:ce]}</mark>")
            prev = ce
        while mi < len(rel_ms):
            p, unit = rel_ms[mi]
            mi += 1
            if p < prev:  # inside the last mark — emit right after it
                html.append(f'<milestone unit="{_attr(unit)}"/>')
                continue
            html.append(frag[prev:p])
            html.append(f'<milestone unit="{_attr(unit)}"/>')
            prev = p
        html.append(frag[prev:])
        out.append((start, end, score, "".join(html)))
    return out


def snippets_pipeline(ds: ray.data.Dataset, query_terms: list[str],
                      idf: dict | None = None, merge_gap: int = 6,
                      ctx: int = 3, top_per_doc: int = 2):
    """docs → (doc_id, snippet_rank, score, html) rows; per-doc top-k
    snippets by score desc then start asc (TopSnippetCollector rule)."""
    terms = set(t.lower() for t in query_terms)

    def per_batch(batch: pa.Table) -> pa.Table:
        ids, ranks, scores, htmls = [], [], [], []
        starts, ends = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            snips = doc_snippets(text or "", terms, merge_gap, ctx, idf)
            snips.sort(key=lambda s: (-s[2], s[0]))
            for rank, (st, en, score, html) in enumerate(snips[:top_per_doc]):
                ids.append(doc_id)
                ranks.append(rank)
                scores.append(round(score, 6))
                htmls.append(html)
                starts.append(st)
                ends.append(en)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "snippet_rank": pa.array(ranks, pa.int32()),
                "score": pa.array(scores, pa.float64()),
                "start_tok": pa.array(starts, pa.int64()),
                "end_tok": pa.array(ends, pa.int64()),
                "html": pa.array(htmls, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
