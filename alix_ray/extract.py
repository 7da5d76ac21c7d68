"""HTML/XML → text extraction kernel (the pipeline's pinned per-row invariant).

Semantics follow the reference's ``Detagger``
(``util/src/java/com/github/oeuvres/alix/util/Detagger.java:1-120``):

- a "tag" is any ``<`` … first following ``>`` span — **no quote
  awareness** (a ``>`` inside an attribute value closes the tag, exactly
  like the reference's scanner);
- comments / PIs are ordinary tags (scanned to the first ``>``);
- ASCII whitespace (space, tab, CR, LF) collapses to one space; tags are
  zero-width (``a<p>b`` → ``ab``); non-ASCII whitespace is untouched;
- broken excerpts tolerated: if the slice starts inside a tag (a ``>``
  precedes the first ``<``) the leading fragment is discarded; a
  trailing unterminated ``<…`` is discarded;
- entities are NOT decoded by ``detag`` (reference behavior); the
  pipeline-level :func:`extract_text` additionally decodes the five
  predefined XML entities, as the reference's tokenizer does
  (``MarkupTokenizer.java:83-86``).

``detag`` here is a regex formulation that is behavior-identical to the
reference's char loop for the include-nothing case (property-tested in
``tests/test_extract.py``).  It is a pure function of its input — output
is independent of batch boundaries and parallelism (BASELINE.json
per-row invariant).
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"<[^>]*>|<[^>]*\Z")
_WS_RE = re.compile(r"[ \t\r\n]+")
# reference decodes exactly the five predefined XML entities
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" → "&lt;" (no double decode)
]
_DROP_CONTENT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?(</\1[^>]*>|\Z)", re.IGNORECASE | re.DOTALL
)


def detag(xml: str) -> str:
    """Strip all element markup and collapse ASCII whitespace.

    Include-nothing ``Detagger.detag`` semantics (see module docstring).
    """
    if not xml:
        return ""
    gt = xml.find(">")
    if gt != -1:
        lt = xml.find("<")
        if lt == -1 or gt < lt:
            xml = xml[gt + 1 :]
    xml = _TAG_RE.sub("", xml)
    return _WS_RE.sub(" ", xml)


def decode_entities(text: str) -> str:
    """Decode the five predefined XML entities (and only those)."""
    if "&" not in text:
        return text
    for src, dst in _ENTITIES:
        text = text.replace(src, dst)
    return text


def extract_text(html, drop_script_style: bool = True) -> str:
    """The pinned extraction kernel: bytes/str HTML → normalized text.

    ``bytes`` input is decoded as UTF-8 with replacement.  Steps:
    optional removal of ``<script>``/``<style>`` element *content* (a
    web-corpus necessity the TEI-oriented reference never faces —
    documented extension), :func:`detag`, entity decode, strip of
    leading/trailing spaces.  Deterministic, row-local, batch-boundary
    independent.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if drop_script_style and "<" in html:
        html = _DROP_CONTENT_RE.sub(" ", html)
    return decode_entities(detag(html)).strip(" ")


def detag_reference(xml: str) -> str:
    """Character-loop transliteration of the reference scanner semantics.

    Used ONLY in tests as the oracle for :func:`detag` equivalence
    (``Detagger.java:120-215``, include-nothing configuration).
    """
    if not xml:
        return ""
    begin, end = 0, len(xml)
    for i in range(begin, end):
        c = xml[i]
        if c == "<":
            break
        if c == ">":
            begin = i + 1
            break
    out: list[str] = []
    last = "x"
    in_tag = False
    for i in range(begin, end):
        c = xml[i]
        if not in_tag:
            if c in " \t\r\n":
                if last != " ":
                    out.append(" ")
                    last = " "
            elif c == "<":
                in_tag = True
            else:
                out.append(c)
                last = c
        else:
            if c == ">":
                in_tag = False
    return "".join(out)
