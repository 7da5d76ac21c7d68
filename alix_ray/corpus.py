"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Schema = exactly the ``input_hint`` shape from BASELINE.json:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is a pure function of ``(seed, row_index)`` (per-row
``numpy`` Philox streams), so the corpus is identical regardless of
partitioning, parallelism or generation order — the property the
deterministic-doc-id and scaling tests rely on.

The ``text`` column holds the expected output of the pinned extraction
kernel (:func:`alix_ray.extract.extract_text`) — the per-row
byte-identity oracle (BASELINE.json ``input_hint``).

Content exercises the reference tokenizer's hard cases
(``MarkupTokenizer.java:56-92, 576-581``): block/inline tags, the five
XML entities, clitics, abbreviations (``etc.``, ``M.``, ``J.-J.``,
``U.S.A.``), numbers (``12,5``), curly apostrophes and soft hyphens.
Vocabulary is Zipf-distributed so a handful of hot terms dominate
postings (the skew-splitting path is observable), and document lengths
vary from 1 token to thousands (BM25 length normalization
discriminates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .extract import extract_text

SEED = 42
CORPUS_VERSION = 2  # bump when the generator changes (invalidates cached corpora)
DUP_EVERY = 50  # row i with i % DUP_EVERY == 1 duplicates row i-1's url
OVERSIZED_EVERY = 997  # rows with huge html (quarantine path)
MALFORMED_EVERY = 211  # rows with broken markup (extractor tolerance)

# function words = hot Zipf head (stop-word analogs)
_FUNCTION = (
    "le la les de des du et un une en dans que qui pour sur avec est "
    "sont au aux ce cette il elle ne pas plus par"
).split()

_SYLL_A = "b c d f g l m n p r s t v".split()
_SYLL_B = "a e i o u ai ou on an".split()

_SPECIAL = [
    "l'analyse",
    "qu'il",
    "j'aime",
    "donne-le-moi",
    "quelqu'un",
    "c'est-à-dire",
    "etc.",
    "M. Martin",
    "J.-J. Rousseau",
    "U.S.A.",
    "12,5",
    "1959",
    "-42",
    "d’abord",  # curly apostrophe
    "re­connaître",  # soft hyphen
    "AT&amp;T",  # entity in source HTML
    "&lt;tag&gt;",
]

_BLOCK_TAGS = ["p", "div", "li", "h1", "h2", "blockquote"]
_INLINE_TAGS = ["i", "em", "b"]
_LANGS = ["fr", "fr", "fr", "fr", "fr", "fr", "fr", "fr", "en", "de"]


def _vocabulary(size: int = 2000) -> list[str]:
    """Deterministic word list: hot function words + generated CV words."""
    words = list(_FUNCTION)
    rng = np.random.default_rng(SEED)
    seen = set(words)
    while len(words) < size:
        n_syll = int(rng.integers(2, 5))
        w = "".join(
            _SYLL_A[int(rng.integers(len(_SYLL_A)))]
            + _SYLL_B[int(rng.integers(len(_SYLL_B)))]
            for _ in range(n_syll)
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_VOCAB = _vocabulary()
_ZIPF_W = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()


def _row_rng(i: int) -> np.random.Generator:
    return np.random.default_rng([SEED, int(i)])


def make_page(i: int) -> dict:
    """Generate page row ``i`` — pure function of the row index."""
    rng = _row_rng(i)
    dup = i % DUP_EVERY == 1 and i > 0
    key = i - 1 if dup else i
    url = f"https://example.org/site{key % 997}/page{key}.html"
    # duplicates of a url have distinct, later timestamps
    ts = np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(
        int(key * 7919 + (1_000_000 if dup else 0) + int(_row_rng(key).integers(0, 3600)) ), "s"
    )
    lang = _LANGS[int(rng.integers(len(_LANGS)))]

    n_tokens = int(np.clip(rng.lognormal(4.5, 1.2), 1, 3000))
    idx = rng.choice(len(_VOCAB), size=n_tokens, p=_ZIPF_P)
    words = [_VOCAB[j] for j in idx]
    # sprinkle special fragments at deterministic positions
    for k in range(int(rng.integers(0, 4))):
        pos = int(rng.integers(0, n_tokens))
        words[pos] = _SPECIAL[int(rng.integers(len(_SPECIAL)))]

    # assemble sentences into block elements
    parts = [f"<h1>doc {i}</h1>"]
    s = 0
    while s < len(words):
        slen = int(rng.integers(4, 18))
        sent = words[s : s + slen]
        s += slen
        if sent and rng.random() < 0.2:
            w = int(rng.integers(0, len(sent)))
            tag = _INLINE_TAGS[int(rng.integers(len(_INLINE_TAGS)))]
            sent[w] = f"<{tag}>{sent[w]}</{tag}>"
        tag = _BLOCK_TAGS[int(rng.integers(len(_BLOCK_TAGS)))]
        parts.append(f"<{tag}>{' '.join(sent)}.</{tag}>")
    body = "\n".join(parts)
    html = (
        f'<html><head><title>page {i}</title>'
        f"<style>body {{ color: red }}</style>"
        f'<script>var x = "{i}" < 5 && 3 > 2;</script></head>'
        f"<body>{body}</body></html>"
    )
    if i % MALFORMED_EVERY == 3:
        html = 'attr="oops">' + html + "<unterminated"
    if i % OVERSIZED_EVERY == 5:
        # push past the analyze-stage MAX_HTML_BYTES (2 MB) so the
        # oversized-row quarantine path is genuinely exercised; the
        # expected text for a quarantined row is the empty string
        html = html + "<div>" + ("pad " * 520_000) + "</div>"
        return {
            "url": url,
            "warc_ts": ts,
            "html": html.encode("utf-8"),
            "text": "",
            "lang": lang,
        }
    text = extract_text(html)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def pages_batch(indices: np.ndarray) -> pa.Table:
    """Arrow table of pages for the given row indices (map_batches body)."""
    rows = [make_page(int(i)) for i in indices]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def pages_dataset(n_rows: int, parallelism: int = -1):
    """Distributed deterministic generation: ``ray.data.range → map_batches``."""
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b: pages_batch(b["id"]),
        batch_format="numpy",
        batch_size=1024,
    )


def write_pages(out_dir: str, n_rows: int, parallelism: int = -1) -> None:
    pages_dataset(n_rows, parallelism).write_parquet(out_dir)
