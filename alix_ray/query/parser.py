"""Query parser (reference grammar subset: ``SpanQueryParser.java:1-24``).

- bare terms → scored disjunctively (the engine's BM25 sum);
- ``"quoted words"`` or ``a_b`` underscore forms → one indexed MWE term
  (underscore-joined canonical, as the MWE filter indexes them);
- ``( … )`` groups → flattened (OR semantics under disjunctive BM25);
- ``*``/``?`` wildcards → multi-term expansion against the lexicon;
- terms are resolved through the same analyzer as indexing; unknown
  terms are dropped by the engine (reference drops them at parse).

Scoring-semantics note (documented divergence): the reference's
relevance mode wraps all terms in an unordered ``SpanNearQuery`` (doc
must contain all terms within slop); this engine scores pure
disjunctive BM25 by default and offers ``mode="and"`` conjunctive
filtering — positions are an optional artifact (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import fnmatch
import re

_PHRASE = re.compile(r'"([^"]*)"')
_WS = re.compile(r"\s+")


def parse_query(q: str, analyzer, lexicon=None, root_dict=None,
                df=None) -> list[str]:
    """Query string → list of index terms (possibly with duplicates).

    When ``root_dict`` (a :class:`alix_ray.analysis.hunspell.
    RootDictionary`) and ``df`` (term → document frequency) are given,
    exact single-word terms prefer INDEXED dictionary roots — the
    reference's Hunspell root preference
    (``snippets/SpanQueryParser.java:463-520``): every indexed root of
    the inflected form is kept (OR expansion); the surface form is the
    fallback; terms with neither are left for the engine to drop.
    """
    if not q:
        return []
    terms: list[str] = []

    def phrase(m):
        words = analyzer.terms(m.group(1))
        if words:
            terms.append("_".join(words))
        return " "

    def resolve(token: str) -> list[str]:
        if root_dict is None or df is None:
            return [token]
        roots = [r for r in root_dict.get_roots(token) if df.get(r, 0) > 0]
        return roots if roots else [token]

    rest = _PHRASE.sub(phrase, q)
    rest = rest.replace("(", " ").replace(")", " ")
    for word in _WS.split(rest.strip()):
        if not word:
            continue
        if "*" in word or "?" in word:
            if lexicon:
                pat = word.lower()
                terms.extend(t for t in lexicon if fnmatch.fnmatchcase(t, pat))
            continue
        if "_" in word:
            terms.append(word)  # already-canonical MWE term
            continue
        for tok in analyzer.terms(word):
            terms.extend(resolve(tok))
    return terms
