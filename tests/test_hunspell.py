"""Hunspell-analog sidecar compile + root lookup + folded suggest."""

import numpy as np
import pandas as pd
import pytest

from alix_ray.analysis.hunspell import (
    MINI_FR_AFF,
    MINI_FR_DIC,
    RootDictionary,
    compile_restricted,
    load_sidecars,
    unknowns,
)


@pytest.fixture()
def rd():
    return RootDictionary(MINI_FR_DIC.splitlines(), MINI_FR_AFF.splitlines())


class TestRootLookup:
    def test_plural_s(self, rd):
        assert rd.get_roots("chats") == ["chat"]

    def test_plural_x(self, rd):
        assert rd.get_roots("chevaux") == []  # stem change not covered
        assert rd.get_roots("beaux") == ["beau"]

    def test_feminine_e(self, rd):
        assert "grand" in rd.get_roots("grande")
        assert "petit" in rd.get_roots("petite")

    def test_verb_endings(self, rd):
        for form in ("parle", "parles", "parlent", "parlez"):
            assert rd.get_roots(form) == ["parler"], form

    def test_headword_is_own_root_first(self, rd):
        assert rd.get_roots("chat")[0] == "chat"

    def test_apostrophe_folding(self):
        rd2 = RootDictionary(["2", "l'eau/S"], MINI_FR_AFF.splitlines())
        assert rd2.is_headword("l’eau")  # curly apostrophe folds

    def test_condition_blocks_bad_root(self, rd):
        # 'analyses' → 'analyse' via [^sxz]; 'chases' has no headword
        assert rd.get_roots("analyses") == ["analyse"]
        assert rd.get_roots("xyzs") == []


class TestCompiler:
    def test_compile_restricted_and_load(self, tmp_path):
        term_cf = {"chat": 42, "parler": 7}
        kept = compile_restricted(
            MINI_FR_DIC.splitlines(), MINI_FR_AFF, term_cf, str(tmp_path)
        )
        assert kept == 2
        dic = (tmp_path / "text.dic").read_text().splitlines()
        assert dic[0] == "2"
        assert any(line.startswith("chat/S") and "fr:42" in line
                   for line in dic)
        rd = load_sidecars(str(tmp_path))
        assert rd is not None and rd.get_roots("chats") == ["chat"]

    def test_compile_empty_removes_sidecars(self, tmp_path):
        (tmp_path / "text.dic").write_text("x")
        (tmp_path / "text.aff").write_text("x")
        kept = compile_restricted(
            MINI_FR_DIC.splitlines(), MINI_FR_AFF, {"zzz": 1}, str(tmp_path)
        )
        assert kept == 0
        assert not (tmp_path / "text.dic").exists()
        assert load_sidecars(str(tmp_path)) is None

    def test_incomplete_pair_raises(self, tmp_path):
        (tmp_path / "text.dic").write_text("1\nchat/S\n")
        with pytest.raises(ValueError):
            load_sidecars(str(tmp_path))

    def test_unknowns_most_frequent_first(self):
        out = unknowns(MINI_FR_DIC.splitlines(),
                       {"chat": 5, "zebre": 9, "qux": 2})
        assert out == [("zebre", 9), ("qux", 2)]


class TestQuerySideRoots:
    def test_parser_prefers_indexed_roots(self, rd):
        from alix_ray.analysis import SimpleAnalyzer
        from alix_ray.query.parser import parse_query

        df = {"chat": 3, "parler": 2}
        # inflected forms resolve to their indexed roots
        assert parse_query("chats parlez", SimpleAnalyzer(), None,
                           root_dict=rd, df=df) == ["chat", "parler"]
        # unindexed root → surface form kept (engine drops it later)
        assert parse_query("beaux", SimpleAnalyzer(), None,
                           root_dict=rd, df=df) == ["beaux"]

    def test_index_sidecar_end_to_end(self, ray_session, tmp_path):
        import ray.data

        from alix_ray.index.engine import BM25Index
        from alix_ray.stages.build import IndexBuilder

        rows = [{"doc_id": 0, "text": "le chat dort"},
                {"doc_id": 1, "text": "un autre texte sans lui"}]
        b = IndexBuilder(
            str(tmp_path / "ix"), analyzer="simple",
            hunspell_resources=(MINI_FR_DIC.splitlines(), MINI_FR_AFF),
        )
        b.build(ray.data.from_items(rows), input_kind="documents",
                fingerprint="h")
        ix = BM25Index(str(tmp_path / "ix"))
        assert ix.root_dict() is not None
        # 'chats' is not indexed, but its root 'chat' is → doc 0 found
        res = ix.search("chats", 5)
        assert res and res[0][0] == 0


class TestFoldedSuggest:
    def test_ete_suggests_accented(self):
        from alix_ray.ops.analytics import suggest

        ts = pd.DataFrame({"term": ["été", "etage", "autre"],
                           "cf": [10, 5, 99]})
        got = suggest(ts, "et")["term"].tolist()
        assert got == ["été", "etage"]
        # infix, folded both sides
        got2 = suggest(ts, "éta")["term"].tolist()
        assert got2 == ["etage"]


class TestSpellSuggest:
    def test_ranked_by_distance_then_freq(self):
        from alix_ray.analysis.hunspell import spell_suggest

        cf = {"chat": 50, "chats": 10, "char": 99, "chose": 7, "xylo": 3}
        got = spell_suggest("chat", cf, k=4)
        # exact match first, then distance-1 by frequency desc
        assert got[0] == ("chat", 0, 50)
        assert [t for t, d, _ in got if d == 1] == ["char", "chats"]

    def test_diacritic_folding(self):
        from alix_ray.analysis.hunspell import spell_suggest

        got = spell_suggest("ete", {"été": 20, "state": 5}, k=2)
        assert got[0] == ("été", 0, 20)

    def test_distance_cap(self):
        from alix_ray.analysis.hunspell import spell_suggest

        assert spell_suggest("zzzzzz", {"chat": 5}, k=3) == []
