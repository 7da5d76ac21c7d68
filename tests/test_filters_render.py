"""Tests: permissive filter queries (Op.java rules) and result renderers."""

import numpy as np
import pytest


class TestYearRange:
    def test_open_both_is_no_filter(self):
        from alix_ray.query.filters import year_range

        assert year_range(None, None, 1800, 1900) is None

    def test_swap_inverted(self):
        from alix_ray.query.filters import year_range

        assert year_range(1880, 1850, 1800, 1900) == (1850, 1880)

    def test_clamp_and_collapse_to_none(self):
        from alix_ray.query.filters import year_range

        # covers whole corpus after clamping → not a filter
        assert year_range(1700, 2000, 1800, 1900) is None
        # collapsed out of corpus
        assert year_range(1950, 1990, 1800, 1900) is None

    def test_open_one_side(self):
        from alix_ray.query.filters import year_range

        assert year_range(None, 1850, 1800, 1900) == (1800, 1850)
        assert year_range(1850, None, 1800, 1900) == (1850, 1900)

    def test_masks_and_conjunction(self):
        from alix_ray.query.filters import conjoin, type_mask, year_mask

        years = np.array([1800, 1850, 1900])
        types = np.array(["article", "chapter", "article"])
        ym = year_mask(years, 1840, None)
        tm = type_mask(types, "article")
        both = conjoin(ym, tm)
        assert both.tolist() == [False, False, True]
        assert conjoin(None, None) is None


class TestFilteredSearch:
    def test_filter_mask_excludes(self, ray_session, tmp_path_factory):
        import ray.data

        from alix_ray.index.engine import BM25Index
        from alix_ray.stages.build import IndexBuilder

        out = str(tmp_path_factory.mktemp("fidx"))
        rows = [{"doc_id": i, "text": "needle haystack"} for i in range(6)]
        IndexBuilder(out, analyzer="simple").build(
            ray.data.from_items(rows), input_kind="documents",
            fingerprint="f")
        ix = BM25Index(out)
        mask = np.array([True, False, True, False, True, False])
        res = ix.search_exact(["needle"], 10, filter_mask=mask)
        assert [d for d, _ in res] == [0, 2, 4]


class TestRender:
    hits = [(3, 1.5), (1, 0.75)]
    urls = {3: "https://a/3", 1: "https://a/1"}
    snips = {3: "x <mark>needle</mark> y"}

    def test_json_and_jsonl(self):
        import json

        from alix_ray.ops.render import to_json, to_jsonl

        j = json.loads(to_json(self.hits, q="needle", urls=self.urls))
        assert j["total"] == 2 and j["hits"][0]["doc_id"] == 3
        lines = to_jsonl(self.hits).splitlines()
        assert len(lines) == 2 and json.loads(lines[1])["doc_id"] == 1

    def test_csv(self):
        from alix_ray.ops.render import to_csv

        out = to_csv(self.hits, urls=self.urls)
        assert out.splitlines()[0] == "rank,doc_id,score,url"
        assert "https://a/3" in out

    def test_html_embeds_snippets(self):
        from alix_ray.ops.render import to_html

        h = to_html(self.hits, q="needle", urls=self.urls, snippets=self.snips)
        assert "<mark>needle</mark>" in h and "https://a/1" in h


def test_order_hits_modes():
    import pytest

    from alix_ray.ops.render import order_hits

    hits = [(5, 2.0), (3, 2.0), (9, 7.5)]
    assert order_hits(hits) == [(9, 7.5), (3, 2.0), (5, 2.0)]
    assert order_hits(hits, "doc") == [(3, 2.0), (5, 2.0), (9, 7.5)]
    assert order_hits(hits, "doc_desc") == [(9, 7.5), (5, 2.0), (3, 2.0)]
    with pytest.raises(ValueError):
        order_hits(hits, "date?")


def test_to_docx_valid_package():
    import io
    import zipfile

    from alix_ray.ops.render import to_docx

    blob = to_docx([(3, 1.5), (7, 0.25)], q="test",
                   snippets={3: "a <mark>hit</mark> here"})
    z = zipfile.ZipFile(io.BytesIO(blob))
    names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels",
            "word/document.xml"} <= names
    doc = z.read("word/document.xml").decode()
    assert "Results: test" in doc and "score 1.5000" in doc
    assert "<mark>" not in doc and "a hit here" in doc
    # well-formed XML
    import xml.etree.ElementTree as ET

    ET.fromstring(doc)
