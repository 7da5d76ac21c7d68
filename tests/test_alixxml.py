"""Book/chapter compound-document protocol (AlixSaxHandler.java:380-600)."""

import pytest

from alix_ray.stages.alixxml import parse_alix_xml

NS = 'xmlns:alix="http://alix.casa"'


def test_book_with_chapters():
    xml = f"""<alix:set {NS}>
      <alix:book xml:id="b1">
        <alix:field name="title">The Book</alix:field>
        <alix:chapter>
          <alix:field name="text">chapter one text</alix:field>
        </alix:chapter>
        <alix:chapter xml:id="custom">
          <alix:field name="text">chapter two</alix:field>
        </alix:chapter>
      </alix:book>
    </alix:set>"""
    docs = parse_alix_xml(xml, "myfile")
    assert [d["doc_type"] for d in docs] == ["book", "chapter", "chapter"]
    book, ch1, ch2 = docs
    # book emitted BEFORE the first chapter with its book-level fields
    assert book["id"] == "b1" and book["fields"]["title"] == "The Book"
    assert book["filestem"] == "myfile"
    # default chapter id = bookId-NN zero-padded (padOrdinal)
    assert ch1["id"] == "b1-01" and ch1["ord"] == 1
    assert ch1["bookid"] == "b1"
    assert ch1["fields"]["text"] == "chapter one text"
    # explicit xml:id wins; ordinal still increments
    assert ch2["id"] == "custom" and ch2["ord"] == 2


def test_book_without_chapters_emitted_at_close():
    xml = f"""<alix:book {NS} xml:id="solo">
      <alix:field name="text">whole book body</alix:field>
    </alix:book>"""
    docs = parse_alix_xml(xml)
    assert len(docs) == 1
    assert docs[0]["doc_type"] == "book"
    assert docs[0]["fields"]["text"] == "whole book body"


def test_standalone_document():
    xml = f"""<alix:set {NS}>
      <alix:document xml:id="a1">
        <alix:field name="text">article</alix:field>
      </alix:document>
    </alix:set>"""
    docs = parse_alix_xml(xml)
    assert docs[0]["doc_type"] == "article" and docs[0]["id"] == "a1"


def test_pad_ordinal_two_digits_then_plain():
    chapters = "".join(
        "<alix:chapter><alix:field name='text'>x</alix:field></alix:chapter>"
        for _ in range(11)
    )
    xml = f'<alix:book {NS} xml:id="b">{chapters}</alix:book>'
    docs = parse_alix_xml(xml)
    ch_ids = [d["id"] for d in docs if d["doc_type"] == "chapter"]
    assert ch_ids[0] == "b-01" and ch_ids[8] == "b-09" and ch_ids[10] == "b-11"


def test_nesting_violations():
    with pytest.raises(ValueError):  # chapter outside book
        parse_alix_xml(
            f'<alix:set {NS}><alix:chapter/></alix:set>'
        )
    with pytest.raises(ValueError):  # book requires xml:id
        parse_alix_xml(f'<alix:book {NS}/>')
    with pytest.raises(ValueError):  # set not at root
        parse_alix_xml(
            f'<alix:book {NS} xml:id="b"><alix:set/></alix:book>'
        )


def test_ray_operator(ray_session):
    import ray.data

    from alix_ray.stages.alixxml import alix_documents

    xml = f"""<alix:book {NS} xml:id="bk">
      <alix:field name="title">T</alix:field>
      <alix:chapter><alix:field name="text">hello world</alix:field></alix:chapter>
    </alix:book>"""
    ds = ray.data.from_items([{"xml": xml, "filestem": "f0"}])
    out = alix_documents(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert set(out["doc_type"]) == {"book", "chapter"}
    ch = out[out["doc_type"] == "chapter"].iloc[0]
    assert ch["text"] == "hello world" and ch["bookid"] == "bk"
    bk = out[out["doc_type"] == "book"].iloc[0]
    assert '"title": "T"' in bk["meta_json"]


def test_alixxml_to_index_end_to_end(ray_session, tmp_path):
    """Book/chapter ingest feeds the flagship build: chapters become
    searchable documents, the book row keeps its metadata."""
    import ray.data

    from alix_ray.index.engine import BM25Index
    from alix_ray.stages.alixxml import alix_documents
    from alix_ray.stages.build import IndexBuilder

    xml = f"""<alix:book {NS} xml:id="bk1">
      <alix:field name="title">Corpus One</alix:field>
      <alix:chapter><alix:field name="text">alpha beta gamma</alix:field></alix:chapter>
      <alix:chapter><alix:field name="text">delta alpha</alix:field></alix:chapter>
    </alix:book>"""
    docs = alix_documents(
        ray.data.from_items([{"xml": xml, "filestem": "f"}])
    )
    # chapters only; dense doc ids by (bookid, ord)
    chapters = docs.filter(expr="doc_type == 'chapter'").to_pandas()
    chapters = chapters.sort_values(["bookid", "ord"]).reset_index(drop=True)
    rows = [{"doc_id": i, "text": t}
            for i, t in enumerate(chapters["text"])]
    b = IndexBuilder(str(tmp_path / "ix"), analyzer="simple")
    b.build(ray.data.from_items(rows), input_kind="documents",
            fingerprint="axml")
    ix = BM25Index(str(tmp_path / "ix"))
    res = ix.search("delta", 5)
    assert res and res[0][0] == 1  # second chapter
    res2 = ix.search("alpha", 5)
    assert {d for d, _ in res2} == {0, 1}
