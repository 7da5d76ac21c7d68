"""BPE tokenizer training (Sennrich et al. 2016) as a distributed
pipeline — the missing piece between corpus curation and token
budgeting: train the vocabulary ON the corpus being assembled.

Industrial shape: BPE never iterates the corpus.  ONE pass builds the
(word, count) table (partial counts per batch + one small groupby —
the table is vocabulary-sized, not corpus-sized); every merge round
then touches only that table.

Two equivalent engines (auto-selected on distinct-word count, tested
identical):

* driver — the word table fits comfortably in driver memory
  (≤ ``max_driver_words``, deliberately conservative: the loop is an
  exact full recount per round — incremental pair-index updates are
  the known optimization if the bound ever needs raising).
* distributed — the word table stays a Dataset; each round is one
  ``map_batches`` partial pair-count + one tiny ``groupby`` reduce to
  pick the argmax pair (count desc, pair asc — fully deterministic),
  then one ``map_batches`` applying the merge.  Rounds cost O(table)
  passes, never a corpus pass; at a 10^9-word web vocabulary no
  process ever holds the table.

Merges are learned over character sequences with a ``</w>``
end-of-word marker (the paper's convention).  :func:`encode_counts`
applies learned merges (greedy by rank) and returns per-doc BPE token
counts — memoized per distinct word per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..analysis import SimpleAnalyzer

EOW = "</w>"


def word_counts(ds: ray.data.Dataset,
                text_col: str = "text") -> ray.data.Dataset:
    """(word, cnt) over the simple profile — partial counts per batch,
    one vocabulary-sized groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            SimpleAnalyzer.tokens_arrays(batch[text_col]).flatten())
        return pa.table({"word": vc.field(0).cast(pa.string()),
                         "cnt": vc.field(1).cast(pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").sum("cnt")
            .rename_columns({"sum(cnt)": "cnt"}))


def _syms(word: str) -> tuple:
    return tuple(word) + (EOW,)


def _pair_counts_df(syms: list, cnt: np.ndarray) -> pd.DataFrame:
    """Weighted adjacent-pair counts over a word list (vectorized per
    word list, not per occurrence)."""
    a, b, c = [], [], []
    for s, n in zip(syms, cnt):
        for i in range(len(s) - 1):
            a.append(s[i])
            b.append(s[i + 1])
            c.append(n)
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    return df.groupby(["a", "b"], as_index=False)["c"].sum()


def _best_pair(pairs: pd.DataFrame) -> tuple | None:
    if len(pairs) == 0:
        return None
    top = pairs.sort_values(["c", "a", "b"],
                            ascending=[False, True, True],
                            kind="stable").iloc[0]
    if top["c"] < 2:  # nothing repeats — further merges are noise
        return None
    return (top["a"], top["b"])


def _apply_merge(s: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == pair[0] and s[i + 1] == pair[1]:
            out.append(s[i] + s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return tuple(out)


def train_bpe(ds: ray.data.Dataset, n_merges: int = 200,
              text_col: str = "text",
              max_driver_words: int = 250_000) -> list[tuple]:
    """Learn ``n_merges`` merge rules from the corpus.  Returns the
    ordered merge list (rank = priority for encoding)."""
    counts = word_counts(ds, text_col).materialize()
    if counts.count() <= max_driver_words:
        t = counts.to_pandas()
        syms = [_syms(w) for w in t["word"]]
        cnt = t["cnt"].to_numpy(np.int64)
        merges: list[tuple] = []
        for _ in range(n_merges):
            pair = _best_pair(_pair_counts_df(syms, cnt))
            if pair is None:
                break
            merges.append(pair)
            # cheap containment precheck skips rebuilding the (vast)
            # majority of words the merged pair never occurs in
            syms = [_apply_merge(s, pair) if pair[0] in s else s
                    for s in syms]
        return merges
    return _train_distributed(counts, n_merges)


def _train_distributed(counts: ray.data.Dataset,
                       n_merges: int) -> list[tuple]:
    """Per round: one partial pair-count pass over the word table +
    one tiny reduce, one merge-application pass.  The table never
    gathers anywhere."""
    import ray

    def to_syms(batch: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array([list(_syms(w))
                              for w in batch["word"].to_pylist()],
                             pa.list_(pa.string())),
            "cnt": batch["cnt"],
        })

    table = counts.map_batches(to_syms, batch_format="pyarrow") \
        .materialize()
    merges: list[tuple] = []
    for _ in range(n_merges):
        def pair_partial(batch: pa.Table) -> pa.Table:
            df = _pair_counts_df(
                [tuple(s) for s in batch["syms"].to_pylist()],
                np.asarray(batch["cnt"].to_pylist(), np.int64))
            # explicit schema: an all-merged block yields an EMPTY
            # frame whose object columns would otherwise arrive as
            # double and break Ray's schema unification
            return pa.table({
                "a": pa.array(df["a"], pa.string()),
                "b": pa.array(df["b"], pa.string()),
                "c": pa.array(df["c"], pa.int64()),
            })

        pairs = (table.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["a", "b"]).sum("c").to_pandas()
                 .rename(columns={"sum(c)": "c"}))
        pair = _best_pair(pairs)
        if pair is None:
            break
        merges.append(pair)
        pair_ref = ray.put(pair)

        def apply(batch: pa.Table) -> pa.Table:
            p = ray.get(pair_ref)
            return pa.table({
                "syms": pa.array(
                    [list(_apply_merge(tuple(s), p))
                     for s in batch["syms"].to_pylist()],
                    pa.list_(pa.string())),
                "cnt": batch["cnt"],
            })

        table = table.map_batches(apply, batch_format="pyarrow") \
            .materialize()
    return merges


def encode_word(word: str, ranks: dict) -> tuple:
    """Greedy lowest-rank-first merge application (the paper's encode)."""
    s = _syms(word)
    while len(s) > 1:
        best, best_rank = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (s[i], s[i + 1]), r
        if best is None:
            break
        s = _apply_merge(s, best)
    return s


def encode_counts(ds: ray.data.Dataset, merges: list[tuple],
                  text_col: str = "text") -> ray.data.Dataset:
    """Per-doc BPE token counts under the learned merges — rows
    ``(doc_id, n_bpe)``.  Merge table broadcast once per worker;
    encoding memoized per distinct word per batch."""
    import ray

    from ._util import broadcast_cached

    ranks_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    def enc(batch: pa.Table) -> pa.Table:
        ranks = broadcast_cached(ranks_ref)
        lists = SimpleAnalyzer.tokens_arrays(batch[text_col])
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pylist()
        memo: dict[str, int] = {}
        lens = np.empty(len(flat), np.int64)
        for i, w in enumerate(flat):
            v = memo.get(w)
            if v is None:
                v = memo[w] = len(encode_word(w, ranks))
            lens[i] = v
        owner = np.repeat(np.arange(len(n)), n)
        tot = np.bincount(owner, weights=lens, minlength=len(n))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe": pa.array(tot.astype(np.int64)),
        })

    return ds.map_batches(enc, batch_format="pyarrow")
