"""TEI ingestion: TEI → alix-XML → logical documents.

Reference architecture parity (``TeiIngester.java:43-55``): the
reference streams TEI through an XSLT (``alix.xsl``) that rewrites it
into the alix-XML field protocol, which ``AlixSaxHandler`` then
accumulates.  This module is the XSLT stage re-expressed in Python
(no Saxon here): :func:`tei_to_alix_xml` maps the common TEI shapes
to the protocol, and ingestion composes it with the tested
:mod:`alix_ray.stages.alixxml` parser — same two-stage design, same
downstream semantics.

Mapping (the alix.xsl core, simplified to the structures the test
corpus exercises):

- ``TEI/@xml:id`` (or the filestem) → ``alix:book`` id
- ``teiHeader``: ``titleStmt/title`` → ``title`` field,
  ``titleStmt/author`` → ``author``, first ``publicationStmt/date``
  (``@when`` or text) → ``date``
- each top-level ``text/body/div`` → one ``alix:chapter`` whose
  ``text`` field is the div's flattened text (a ``head`` child also
  becomes the chapter's ``title`` field)
- a body without divs → the whole body text on the book document
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

from .alixxml import _local, _xml_id, parse_alix_xml


def _find_local(elem, *path):
    """Descend by LOCAL element names (TEI namespaces vary)."""
    cur = [elem]
    for name in path:
        nxt = []
        for e in cur:
            nxt.extend(c for c in e if _local(c.tag) == name)
        cur = nxt
        if not cur:
            return []
    return cur


def _text_of(elems) -> str:
    return " ".join(
        " ".join(t.strip() for t in e.itertext() if t.strip())
        for e in elems
    ).strip()


def xslt_transform(xsl: str):
    """Build a ``pre_transform`` callable from an XSLT 1.0 stylesheet —
    the reference's per-corpus Saxon slot (``TeiIngester.java:
    127-128,239-246``: each corpus may inject its own ``.xsl`` ahead
    of ``alix.xsl``), run here via lxml when importable.

    ``xsl``: stylesheet TEXT (starts with ``<``) or a path to a
    ``.xsl`` file.  The stylesheet compiles ONCE in this factory —
    call it per worker/actor and hand the returned callable to
    ``tei_documents(pre_transform=...)`` (or pass the ``.xsl`` path
    straight to ``tei_documents``, which calls this).

    Raises ImportError when lxml is absent (this container ships no
    XSLT engine; install lxml in the deployment image, or supply a
    plain Python ``xml_str -> xml_str`` callable instead)."""
    try:
        from lxml import etree
    except ImportError as e:
        raise ImportError(
            "xslt_transform requires lxml (an XSLT 1.0 engine). Install "
            "lxml in the deployment image, or pass a plain Python "
            "pre_transform callable."
        ) from e
    if not xsl.lstrip().startswith("<"):
        with open(xsl, "rb") as f:
            xsl_bytes = f.read()
    else:
        xsl_bytes = xsl.encode("utf-8")
    transform = etree.XSLT(etree.fromstring(xsl_bytes))

    def apply(xml_str: str) -> str:
        return str(transform(etree.fromstring(xml_str.encode("utf-8"))))

    return apply


def tei_to_alix_xml(tei_xml: str, filestem: str = "doc",
                    pre_transform=None) -> str:
    """One TEI file → the alix-XML protocol string (the alix.xsl
    stage).  Malformed TEI raises ``ET.ParseError`` — callers decide
    per-file skip (TeiIngester's per-file error policy).

    ``pre_transform``: per-corpus callable ``xml_str -> xml_str``
    applied to the RAW TEI before the alix mapping — the reference's
    user-stylesheet slot (``TeiIngester.java:127-128,239-246``: each
    corpus may inject its own XSLT ahead of ``alix.xsl``).  Build it
    once per worker (closure / actor ``__init__``)."""
    if pre_transform is not None:
        tei_xml = pre_transform(tei_xml)
    root = ET.fromstring(tei_xml)
    book_id = _xml_id(root.attrib) or filestem

    fields = []
    header = _find_local(root, "teiHeader")
    if header:
        h = header[0]
        title = _text_of(_find_local(h, "fileDesc", "titleStmt", "title"))
        author = _text_of(_find_local(h, "fileDesc", "titleStmt", "author"))
        dates = _find_local(h, "fileDesc", "publicationStmt", "date")
        date = ""
        if dates:
            date = dates[0].attrib.get("when") or _text_of(dates[:1])
        if title:
            fields.append(("title", title))
        if author:
            fields.append(("author", author))
        if date:
            fields.append(("date", date))

    body = _find_local(root, "text", "body")
    divs = _find_local(body[0], "div") if body else []

    out = [f'<alix:book xmlns:alix="http://alix.casa" xml:id="{escape(book_id)}">']
    for name, value in fields:
        out.append(f'<alix:field name="{name}">{escape(value)}</alix:field>')
    if divs:
        for div in divs:
            heads = [c for c in div if _local(c.tag) == "head"]
            div_id = _xml_id(div.attrib)
            attr = f' xml:id="{escape(div_id)}"' if div_id else ""
            out.append(f"<alix:chapter{attr}>")
            if heads:
                out.append(
                    f'<alix:field name="title">'
                    f"{escape(_text_of(heads[:1]))}</alix:field>"
                )
            out.append(
                f'<alix:field name="text">{escape(_text_of([div]))}'
                f"</alix:field>"
            )
            out.append("</alix:chapter>")
    elif body:
        out.append(
            f'<alix:field name="text">{escape(_text_of(body[:1]))}'
            f"</alix:field>"
        )
    out.append("</alix:book>")
    return "".join(out)


def tei_documents(ds, xml_col: str = "xml", stem_col: str | None = "filestem",
                  text_field: str = "text", pre_transform=None):
    """Ray operator: rows of TEI files → logical document rows (same
    output schema as :func:`alix_ray.stages.alixxml.alix_documents`).
    Per-file parse errors quarantine the file (error row, doc_type
    ``error``) instead of failing the task — TeiIngester.java:143-150
    per-file policy.

    ``pre_transform``: a callable ``xml_str -> xml_str``, or a STRING
    (stylesheet text / ``.xsl`` path) compiled through
    :func:`xslt_transform` — so a corpus with an existing stylesheet
    ingests unmodified: ``tei_documents(ds, pre_transform="my.xsl")``.
    """
    import json

    if isinstance(pre_transform, str):
        # read a path on the DRIVER (workers may not share it), ship
        # the stylesheet TEXT, and compile lazily per task — compiled
        # lxml XSLT objects do not pickle
        src = pre_transform
        if not src.lstrip().startswith("<"):
            with open(src) as f:
                src = f.read()
        _cache: dict = {}

        def _xslt_pre(xml_str: str, _src=src, _cache=_cache) -> str:
            fn = _cache.get("fn")
            if fn is None:
                fn = _cache["fn"] = xslt_transform(_src)
            return fn(xml_str)

        pre_transform = _xslt_pre

    def explode(batch: pa.Table) -> pa.Table:
        xmls = batch[xml_col].to_pylist()
        stems = (
            batch[stem_col].to_pylist()
            if stem_col and stem_col in batch.column_names
            else [""] * len(xmls)
        )
        rows = []
        for tei, stem in zip(xmls, stems):
            try:
                alix = tei_to_alix_xml(tei or "", stem or "doc",
                                       pre_transform=pre_transform)
                rows.extend(parse_alix_xml(alix, stem or ""))
            except Exception as e:  # per-FILE quarantine: parse errors
                # AND whatever a corpus pre_transform raises
                # (TeiIngester.java:143-150 — one bad file must not
                # fail the ingestion task)
                rows.append({
                    "id": stem or "?", "doc_type": "error",
                    "filestem": stem or "", "bookid": None, "ord": None,
                    "fields": {"error": f"tei:{type(e).__name__}:{e}"},
                })
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
