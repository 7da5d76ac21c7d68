"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting (training-data extensions; the
quality-metric shapes mirror published web-corpus filtering heuristics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..analysis import SimpleAnalyzer


def round_half_away(x, decimals: int = 6):
    """SQL-compatible rounding (half away from zero) — numpy's default
    round-half-even diverges from DuckDB ROUND on exact halves."""
    x = np.asarray(x, np.float64)
    f = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f

# small per-language function-word profiles (n-gram-free heuristic)
LANG_PROFILES = {
    "en": frozenset("the a of and to in is it that for on with as are was".split()),
    "fr": frozenset("le la les de des du et un une est dans que pour sur avec".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit für auf im".split()),
    "es": frozenset("el la los las de y un una es en que para por con del".split()),
}


class LangId:
    """Per-doc language guess = argmax function-word hit rate.

    Stateful actor stage: profiles built once per actor.  Ties or no
    hits → "und".
    """

    def __init__(self, profiles=LANG_PROFILES):
        self.profiles = {k: frozenset(v) for k, v in profiles.items()}
        self.sa = SimpleAnalyzer()

    def guess(self, text: str) -> str:
        toks = self.sa.terms(text or "")
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang in sorted(self.profiles):
            hits = sum(1 for t in toks if t in self.profiles[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        guesses = [self.guess(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_guess", pa.array(guesses, pa.string()))


def quality_metrics(ds: ray.data.Dataset, text_col="text") -> ray.data.Dataset:
    """Vectorized quality features per doc: n_tokens, alpha_ratio,
    stop_ratio (en profile), mean token length."""
    stop = sorted(LANG_PROFILES["en"])

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        lists = SimpleAnalyzer.tokens_arrays(texts)
        n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = lists.flatten()
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(stop)).to_numpy(
            zero_copy_only=False
        )
        owner = np.repeat(np.arange(len(n_tok)), n_tok)
        sum_len = np.bincount(owner, weights=tok_lens, minlength=len(n_tok))
        n_stop = np.bincount(owner, weights=is_stop, minlength=len(n_tok))
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        alpha = pc.utf8_length(
            pc.replace_substring_regex(texts, "[^A-Za-z]", "")
        ).to_numpy(zero_copy_only=False)
        safe = np.maximum(n_tok, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "alpha_ratio": pa.array(
                    round_half_away(alpha / np.maximum(n_chars, 1))
                ),
                "stop_ratio": pa.array(round_half_away(n_stop / safe)),
                "mean_token_len": pa.array(round_half_away(sum_len / safe)),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


def fingerprint(ds: ray.data.Dataset, text_col="text", window: int = 4):
    """Winnowing-style document fingerprint: polynomial rolling hash of
    token 3-grams, min-sampled per window → stable content signature."""
    from .dedup import _shingle_hashes

    def fp(batch: pa.Table) -> pa.Table:
        sa = SimpleAnalyzer()
        out = []
        for t in batch[text_col].to_pylist():
            sh = _shingle_hashes(sa.terms(t or ""))
            if len(sh) == 0:
                out.append("0" * 16)
                continue
            if len(sh) >= window:
                view = np.lib.stride_tricks.sliding_window_view(sh, window)
                sel = np.unique(view.min(axis=1))
            else:
                sel = sh
            acc = np.uint64(0)
            for v in np.sort(sel):
                acc = acc * np.uint64(1099511628211) + np.uint64(v)
            out.append(f"{int(acc):016x}")
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(out, pa.string())})

    return ds.map_batches(fp, batch_format="pyarrow")


def token_count_total(ds: ray.data.Dataset, text_col="text") -> int:
    """Corpus token count via per-batch partial sums (no shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        lists = SimpleAnalyzer.tokens_arrays(batch[text_col])
        n = int(pc.sum(pc.list_value_length(lists)).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    from ray.data.aggregate import Sum

    return int(ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="total"))["total"])
