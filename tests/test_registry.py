"""Op-registry façade (AlixServlet.java:542-553 dispatch surface)."""

import json

import pytest
import ray.data


@pytest.fixture(scope="module")
def reg_index(ray_session, tmp_path_factory):
    from alix_ray.index.registry import IndexRegistry
    from alix_ray.stages.build import IndexBuilder

    out = str(tmp_path_factory.mktemp("reg") / "idx")
    def page(i):
        body = (f"alpha beta w{i} target gamma" if i % 3 else
                f"alpha target beta near{i}")
        return {"url": f"http://s/{i:03d}", "warc_ts": 1500000000 + i,
                "html": f"<html><body><p>{body}</p></body></html>".encode(),
                "lang": "fr", "text": ""}

    rows = [page(i) for i in range(40)]
    b = IndexBuilder(out, analyzer="simple", keep_positions=True)
    b.build(ray.data.from_items(rows), input_kind="pages", fingerprint="reg")
    reg = IndexRegistry()
    return reg.get("main", out)


class TestRegistry:
    def test_registered_op_set_matches_reference(self):
        from alix_ray.index.registry import OPS

        # AlixServlet.java:542-553 registers exactly these nine
        assert set(OPS) == {"chrono", "clades", "cooc-profile", "doc",
                            "freqlist", "results", "snippets", "suggest",
                            "terms"}

    def test_results_formats(self, reg_index):
        from alix_ray.index.registry import handle

        hits = handle(reg_index, "results", {"q": "target", "k": 5})
        assert len(hits) == 5 and hits[0][1] >= hits[-1][1]
        j = json.loads(handle(reg_index, "results.json",
                              {"q": "target", "k": 5}))
        assert j["total"] == 5 and j["hits"][0]["doc_id"] == hits[0][0]
        csv_out = handle(reg_index, "results.csv", {"q": "target", "k": 2})
        assert csv_out.splitlines()[0].startswith("rank,")
        html = handle(reg_index, "results.html", {"q": "target", "k": 2})
        assert "<ol" in html
        docx = handle(reg_index, "results.docx", {"q": "target", "k": 2})
        assert docx[:2] == b"PK"

    def test_results_pagination_and_sort(self, reg_index):
        from alix_ray.index.registry import handle

        all10 = handle(reg_index, "results", {"q": "target", "k": 10})
        page2 = handle(reg_index, "results",
                       {"q": "target", "k": 5, "start": 5})
        assert page2 == all10[5:]
        by_doc = handle(reg_index, "results",
                        {"q": "target", "k": 10, "sort": "doc"})
        assert [d for d, _ in by_doc] == sorted(d for d, _ in by_doc)

    def test_doc_suggest_freqlist(self, reg_index):
        from alix_ray.index.registry import handle

        d0 = handle(reg_index, "doc", {"id": 0})
        assert "target" in d0["text"]
        sugg = handle(reg_index, "suggest", {"q": "tar", "k": 3})
        assert sugg and sugg[0][0] == "target"
        fl = handle(reg_index, "freqlist", {"k": 3})
        assert len(fl) == 3 and fl[0][1] >= fl[1][1]

    def test_terms_and_snippets_and_chrono(self, reg_index):
        from alix_ray.index.registry import handle

        th = handle(reg_index, "terms", {"docs": [0, 3, 6], "k": 5})
        assert th and isinstance(th[0][0], str)
        sn = handle(reg_index, "snippets", {"q": "target", "id": 0})
        assert sn and "<mark>target</mark>" in sn[0][3]
        ch = handle(reg_index, "chrono", {"q": "target"})
        assert ch and all(n >= 1 for _y, n in ch)

    def test_unknown_op_and_format(self, reg_index):
        from alix_ray.index.registry import handle

        with pytest.raises(KeyError):
            handle(reg_index, "nope", {})
        with pytest.raises(ValueError):
            handle(reg_index, "results.xlsx", {"q": "x"})
        with pytest.raises(ValueError):
            handle(reg_index, "doc.json", {"id": 0})

    def test_user_extension_registration(self, reg_index):
        from alix_ray.index.registry import OPS, handle, op

        @op("ping")
        def op_ping(_ix, pars):
            return {"pong": pars.get("x", 1)}

        try:
            assert handle(reg_index, "ping", {"x": 7}) == {"pong": 7}
        finally:
            OPS.pop("ping", None)
