"""Analyzer chains: canonical French chain + SQL-mirrorable simple chain.

``FrenchAnalyzer`` composes the canonical chain in reference order
(``fr/FrenchAnalyzer.java:288-305``).  It is the *stateful* part of the
pipeline: lexicons are built once per instance — instantiate once per
Ray actor (``map_batches(AnalyzeActor, concurrency=N)``), never per
batch (SURVEY.md §2.3).

``SimpleAnalyzer`` is a deliberately SQL-expressible profile
(lowercase + split on non-alphanumeric runs) used for the DuckDB
oracle-checked index queries over the driver's ``documents`` table —
its exact SQL mirror is ``regexp_split_to_array(lower(text),
'[^a-z0-9]+')`` with empties removed.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import resources
from .filters import (
    MweAutomaton,
    boundary_filter,
    cleanup,
    clitic_filter,
    lemma_filter,
    mwe_filter,
    replace_filter,
    stop_filter,
    uppercase_filter,
)
from .tokenizer import DEFAULT_BREVIDOTS, MarkupTokenizer


class FrenchAnalyzer:
    """text/HTML → ``(terms, positions, width, n_tokens)`` per document."""

    def __init__(
        self,
        stopwords=resources.STOPWORDS,
        lexicon=resources.LEMMA_LEXICON,
        normalization=resources.NORMALIZATION,
        ucwords=resources.UCWORDS,
        mwe_form=resources.MWE_FORM,
        mwe_lemma=resources.MWE_LEMMA,
        brevidots=DEFAULT_BREVIDOTS,
        ocr_garbage: bool = False,
        sentence_start_lower: bool = False,
        pers_initial: bool = False,
        tagger="default",
    ):
        self.tokenizer = MarkupTokenizer(brevidots=brevidots)
        self.stopwords = frozenset(stopwords)
        self.lexicon = dict(lexicon)
        self.normalization = dict(normalization)
        self.ucwords = frozenset(ucwords)
        self.automaton = MweAutomaton(mwe_form, mwe_lemma)
        self.ocr_garbage = ocr_garbage
        self.sentence_start_lower = sentence_start_lower
        self.pers_initial = pers_initial
        # pluggable sentence-context POS model (PosTaggingFilter.java:66
        # slot): ``tagger(toks) -> None`` mutates ``t.pos`` in place
        # over the full token sequence BEFORE lexicon lookup — its tags
        # take precedence (lemma_filter only fills pos where unset).
        # Load the model in the callable's closure / actor ``__init__``
        # (once per worker).  The SHIPPED default is the tiny averaged
        # perceptron (analysis/tagger.py) that disambiguates noun/verb
        # homographs from closed-class context — the stand-in for the
        # reference's OpenNLP model; pass ``tagger=None`` for the pure
        # lexicon chain.
        if tagger == "default":
            from .tagger import default_tagger

            tagger = default_tagger()
        self.tagger = tagger

    def _chain(self, text: str):
        from .filters import (
            ocr_garbage_filter,
            pers_initial_filter,
            sentence_start_lowercase_filter,
        )

        toks = self.tokenizer.tokenize(text)
        if self.pers_initial:
            toks = pers_initial_filter(toks)
        toks = boundary_filter(toks)
        toks = clitic_filter(toks)
        toks = replace_filter(toks, self.normalization)
        toks = uppercase_filter(toks, self.ucwords)
        if self.sentence_start_lower:
            toks = sentence_start_lowercase_filter(toks, self.lexicon)
        if self.tagger is not None:
            self.tagger(toks)
        toks = lemma_filter(toks, self.lexicon)
        toks = mwe_filter(toks, self.automaton)
        toks = stop_filter(toks, self.stopwords)
        if self.ocr_garbage:
            toks = ocr_garbage_filter(toks)
        return toks

    def analyze(self, text: str):
        """Run the canonical chain on one document (optional members per
        constructor flags — SURVEY.md §2.2 optional chain rows)."""
        return cleanup(self._chain(text))

    def analyze_counts(self, text: str):
        """Chain + per-term COUNTS (no position stream) — the BM25
        build path (keep_positions=False) never looks at positions, so
        skipping the per-token tuple stream cuts the dominant
        allocation pressure of the hot analyze stage."""
        from .filters import cleanup_counts

        return cleanup_counts(self._chain(text))

    def terms(self, text: str) -> list[str]:
        return [t for t, _ in self.analyze(text)[0]]


class SimpleAnalyzer:
    """Lowercase + split on ``[^a-z0-9]+`` — DuckDB-mirrorable profile.

    Restricted to ASCII token chars so Python ``str.lower`` and SQL
    ``lower`` agree byte-for-byte on every emitted term.
    """

    _SPLIT = re.compile(r"[^a-z0-9]+")

    def analyze(self, text: str):
        terms = [t for t in self._SPLIT.split(text.lower()) if t]
        emitted = list(zip(terms, range(len(terms))))
        return emitted, len(terms), len(terms)

    def terms(self, text: str) -> list[str]:
        return [t for t in self._SPLIT.split(text.lower()) if t]

    # -- vectorized batch path (Arrow in / Arrow out, no Python loop) --
    @staticmethod
    def tokens_arrays(texts: pa.ChunkedArray | pa.Array):
        """Vectorized: column of texts → (list<string> tokens) array."""
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        lowered = pc.utf8_lower(arr)
        splits = pc.split_pattern_regex(lowered, "[^a-z0-9]+")
        # remove empty strings produced at boundaries
        flat = splits.flatten()
        keep = pc.not_equal(flat, "")
        # rebuild list offsets after filtering
        lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
        keep_np = keep.to_numpy(zero_copy_only=False)
        owner = np.repeat(np.arange(len(lengths)), lengths)
        kept_counts = np.bincount(owner[keep_np], minlength=len(lengths))
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        values = flat.filter(keep)
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
