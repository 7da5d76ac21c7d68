"""Alix-XML ingestion with the book/chapter compound-document protocol.

Reference parity: ``AlixSaxHandler.java:380-600`` — the logical
document hierarchy the round-1 flat ingester lacked:

- ``<alix:set>``: allowed only as the root element, groups documents.
- ``<alix:book xml:id=…>``: a compound document.  Fields declared
  before the first ``<alix:chapter>`` belong to the BOOK document,
  which is emitted when the first chapter starts (or at
  ``</alix:book>`` if there are no chapters).
- ``<alix:chapter>``: children of a book; get synthetic fields
  ``alix.filestem``, ``alix.type=chapter``, ``alix.bookid`` (the
  book's id) and ``alix.ord`` (1-based ordinal); a missing ``xml:id``
  defaults to ``bookId-NN`` with the ordinal zero-padded to at least
  two digits (``padOrdinal``, AlixSaxHandler.java:848-851).
- ``<alix:document xml:id=…>``: a standalone (article) document at
  root or set scope.
- ``<alix:field name=… >``: text content accumulates into the named
  field of the open logical document.

Nesting violations raise ``ValueError`` with messages mirroring the
reference's SAXExceptions (book inside book, chapter outside book,
set not at root…).

The Ray-side operator is a ``flat_map``-shaped ``map_batches``: one
input row (an XML file) → N logical document rows, so books split
into chapters in parallel across files, streaming.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

_ALIX_LOCAL = {"set", "book", "chapter", "document", "field"}


def _local(tag: str) -> str:
    """'{uri}name' or 'prefix:name' → 'name'."""
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[-1]
    return tag.rsplit(":", 1)[-1]


def _xml_id(attrib: dict) -> str | None:
    for k, v in attrib.items():
        if _local(k) == "id":
            return v
    return None


def _pad_ordinal(n: int) -> str:
    return f"0{n}" if n < 10 else str(n)


def parse_alix_xml(xml_text: str, filestem: str = "") -> list[dict]:
    """Parse one Alix-XML file into logical document dicts.

    Each dict: ``{id, doc_type, filestem, bookid, ord, fields}`` where
    ``fields`` maps field name → concatenated text content.
    """
    out: list[dict] = []
    scopes: list[str] = []  # "set" | "book" | "chapter" | "document"
    open_doc: dict | None = None
    book_id: str | None = None
    chapter_ord = 0
    book_emitted = False
    field_stack: list[str] = []

    def emit(doc):
        out.append(doc)

    parser = ET.XMLPullParser(["start", "end"])
    parser.feed(xml_text)
    root_seen = False
    for event, elem in parser.read_events():
        name = _local(elem.tag)
        if event == "start":
            if not root_seen:
                root_seen = True
                if name == "set":
                    scopes.append("set")
                    continue
            if name == "set":
                if scopes:
                    raise ValueError("alix:set allowed only as root element")
                scopes.append("set")
            elif name == "book":
                if scopes and scopes[-1] not in ("set",):
                    raise ValueError(
                        f"alix:book not allowed inside {scopes[-1]}"
                    )
                if open_doc is not None:
                    raise ValueError("alix:book while a document is open")
                bid = _xml_id(elem.attrib)
                if not bid:
                    raise ValueError("alix:book requires xml:id")
                book_id = bid
                chapter_ord = 0
                book_emitted = False
                open_doc = {
                    "id": bid, "doc_type": "book", "filestem": filestem,
                    "bookid": None, "ord": None, "fields": {},
                }
                scopes.append("book")
            elif name == "chapter":
                if not scopes or scopes[-1] != "book":
                    raise ValueError("alix:chapter outside alix:book")
                # emit the book-level document before the first chapter
                if open_doc is not None and open_doc["doc_type"] == "book" \
                        and not book_emitted:
                    emit(open_doc)
                    open_doc = None
                    book_emitted = True
                if open_doc is not None:
                    raise ValueError(
                        "cannot open alix:chapter while another logical "
                        "document is open"
                    )
                chapter_ord += 1
                cid = _xml_id(elem.attrib)
                if not cid:
                    cid = f"{book_id}-{_pad_ordinal(chapter_ord)}"
                open_doc = {
                    "id": cid, "doc_type": "chapter", "filestem": filestem,
                    "bookid": book_id, "ord": chapter_ord, "fields": {},
                }
                scopes.append("chapter")
            elif name == "document":
                if scopes and scopes[-1] not in ("set",):
                    raise ValueError(
                        f"alix:document not allowed inside {scopes[-1]}"
                    )
                if open_doc is not None:
                    raise ValueError("alix:document while a document is open")
                did = _xml_id(elem.attrib)
                if not did:
                    raise ValueError("alix:document requires xml:id")
                open_doc = {
                    "id": did, "doc_type": "article", "filestem": filestem,
                    "bookid": None, "ord": None, "fields": {},
                }
                scopes.append("document")
            elif name == "field":
                if open_doc is None:
                    raise ValueError("alix:field outside any document")
                fname = elem.attrib.get("name")
                if not fname:
                    raise ValueError("alix:field requires @name")
                field_stack.append(fname)
        else:  # end
            if name == "field" and field_stack:
                fname = field_stack.pop()
                if open_doc is not None:
                    text = "".join(elem.itertext())
                    cur = open_doc["fields"].get(fname, "")
                    open_doc["fields"][fname] = cur + text
            elif name == "chapter":
                if open_doc is not None:
                    emit(open_doc)
                    open_doc = None
                scopes.pop()
            elif name == "book":
                # a book with no chapters is emitted at </alix:book>
                if open_doc is not None and open_doc["doc_type"] == "book" \
                        and not book_emitted:
                    emit(open_doc)
                    open_doc = None
                book_id = None
                scopes.pop()
            elif name == "document":
                if open_doc is not None:
                    emit(open_doc)
                    open_doc = None
                scopes.pop()
            elif name == "set":
                scopes.pop()
    parser.close()
    return out


def alix_documents(ds, xml_col: str = "xml", stem_col: str | None = "filestem",
                   text_field: str = "text"):
    """Ray operator: rows of Alix-XML files → logical document rows.

    Output columns: ``(id, doc_type, filestem, bookid, ord, text,
    meta_json)`` where ``text`` is the named text field and
    ``meta_json`` the remaining fields as JSON.  One map_batches pass,
    no shuffle — files split into logical docs in parallel.
    """
    import json

    def explode(batch: pa.Table) -> pa.Table:
        xmls = batch[xml_col].to_pylist()
        stems = (
            batch[stem_col].to_pylist()
            if stem_col and stem_col in batch.column_names
            else [""] * len(xmls)
        )
        rows = []
        for xml_text, stem in zip(xmls, stems):
            rows.extend(parse_alix_xml(xml_text or "", stem or ""))
        return pa.table(
            {
                "id": pa.array([r["id"] for r in rows], pa.string()),
                "doc_type": pa.array(
                    [r["doc_type"] for r in rows], pa.string()
                ),
                "filestem": pa.array(
                    [r["filestem"] for r in rows], pa.string()
                ),
                "bookid": pa.array([r["bookid"] for r in rows], pa.string()),
                "ord": pa.array([r["ord"] for r in rows], pa.int32()),
                "text": pa.array(
                    [r["fields"].get(text_field, "") for r in rows],
                    pa.string(),
                ),
                "meta_json": pa.array(
                    [json.dumps(
                        {k: v for k, v in r["fields"].items()
                         if k != text_field},
                        sort_keys=True, ensure_ascii=False,
                    ) for r in rows],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
