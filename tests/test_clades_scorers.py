"""Tests for correspondence analysis (clades) and pluggable doc scorers."""

import numpy as np
import pytest


class TestClades:
    def test_contingency_and_coords(self, ray_session):
        import ray.data

        from alix_ray.ops.clades import contingency, correspondence_coords

        rows = []
        for i in range(40):
            cat = "A" if i % 2 == 0 else "B"
            word = "alpha" if cat == "A" else "beta"
            rows.append({"doc_id": i, "cat": cat,
                         "text": f"{word} {word} common word"})
        ds = ray.data.from_items(rows)
        cont = contingency(ds, "cat")
        # alpha only under A, beta only under B
        a = cont[(cont["term"] == "alpha")]
        assert set(a["category"]) == {"A"}
        terms_df, cats_df = correspondence_coords(cont, top_terms=10)
        # discriminating terms separate along dim1 with their categories
        ta = terms_df[terms_df["label"] == "alpha"]["dim1"].iloc[0]
        tb = terms_df[terms_df["label"] == "beta"]["dim1"].iloc[0]
        ca = cats_df[cats_df["label"] == "A"]["dim1"].iloc[0]
        cb = cats_df[cats_df["label"] == "B"]["dim1"].iloc[0]
        assert np.sign(ta) == np.sign(ca)
        assert np.sign(tb) == np.sign(cb)
        assert np.sign(ta) != np.sign(tb)


class TestDocScorers:
    @pytest.fixture(scope="class")
    def index(self, ray_session, tmp_path_factory):
        import ray.data

        from alix_ray.index.engine import BM25Index
        from alix_ray.stages.build import IndexBuilder

        out = str(tmp_path_factory.mktemp("scoreridx"))
        rows = [
            {"doc_id": 0, "text": "cat cat cat dog"},
            {"doc_id": 1, "text": "cat dog bird fish mouse"},
            {"doc_id": 2, "text": "bird bird bird bird"},
        ]
        b = IndexBuilder(out, analyzer="simple")
        b.build(ray.data.from_items(rows), input_kind="documents",
                fingerprint="scorers")
        return BM25Index(out)

    def test_freq_scorer_is_tf(self, index):
        res = index.search_exact(["cat"], 5, scorer="freq")
        assert res == [(0, 3.0), (1, 1.0)]

    def test_chi2_scorer_sign(self, index):
        # SimilarityChi2.java:52-68: expected = cf*dl/total
        res = dict(index.search_exact(["cat"], 5, scorer="chi2"))
        # doc0: tf=3, dl=4, cf=4, total=13 → e=1.23, over-represented → +
        assert res[0] > 0

    def test_gtest_runs(self, index):
        res = index.search_exact(["bird"], 5, scorer="gtest")
        assert res and res[0][0] == 2  # bird-heaviest doc first

    def test_bm25_default_unchanged(self, index):
        r1 = index.search_exact(["cat", "dog"], 5)
        r2 = index.search_wand(["cat", "dog"], 5)
        assert r1 == r2
