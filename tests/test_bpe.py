"""BPE trainer tests: the Sennrich worked example, driver/distributed
engine identity, and encode consistency."""

import numpy as np
import pandas as pd
import pytest


def _corpus():
    # the classic BPE example: low*5 lower*2 newest*6 widest*3
    words = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
             + ["widest"] * 3)
    rng = np.random.default_rng(7)
    rng.shuffle(words)
    # spread across a few docs
    docs = [" ".join(words[i::4]) for i in range(4)]
    return pd.DataFrame({"doc_id": range(4), "text": docs})


class TestBpe:
    def test_sennrich_example_merges(self, ray_session):
        import ray.data

        from alix_ray.ops.bpe import train_bpe

        ds = ray.data.from_pandas(_corpus()).repartition(3)
        merges = train_bpe(ds, n_merges=5)
        # hand-computed: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
        assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                          ("l", "o"), ("lo", "w")]

    def test_distributed_engine_identical(self, ray_session):
        import ray.data

        from alix_ray.ops.bpe import train_bpe

        ds = ray.data.from_pandas(_corpus()).repartition(3)
        driver = train_bpe(ds, n_merges=6)
        dist = train_bpe(ds, n_merges=6, max_driver_words=0)
        assert [tuple(m) for m in dist] == [tuple(m) for m in driver]

    def test_encode_counts(self, ray_session):
        import ray.data

        from alix_ray.ops.bpe import encode_counts, encode_word, train_bpe

        ds = ray.data.from_pandas(_corpus()).repartition(2)
        merges = train_bpe(ds, n_merges=10)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        # after the est-merges the word's tail fuses through est</w>
        # (with enough merges the whole word becomes one symbol)
        assert encode_word("newest", ranks)[-1].endswith("st</w>")
        got = encode_counts(ds, merges).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # totals: sum over words of len(encode_word)
        df = _corpus()
        want = [sum(len(encode_word(w, ranks)) for w in t.split())
                for t in df["text"]]
        assert got["n_bpe"].tolist() == want
        # fewer merges -> more tokens (monotone sanity)
        got2 = encode_counts(ds, merges[:2]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert (got2["n_bpe"] >= got["n_bpe"]).all()
