import string

from hypothesis import given, settings
from hypothesis import strategies as st

from alix_ray.extract import decode_entities, detag, detag_reference, extract_text


def test_basic_strip():
    assert detag("<p>hello <i>world</i></p>") == "hello world"


def test_tags_zero_width():
    assert detag("a<p>b") == "ab"
    assert detag("a <p> b") == "a b"


def test_whitespace_collapse_ascii_only():
    assert detag("a \t\r\n b") == "a b"
    assert detag("a b") == "a b"  # NBSP untouched


def test_broken_leading_fragment():
    assert detag('attr="x">text<p>more') == "textmore"


def test_trailing_unterminated():
    assert detag("text<div unfinished") == "text"


def test_comment_scanned_to_first_gt():
    # reference scanner stops at the FIRST '>', even inside a comment
    assert detag("<!-- a > b -->x") == " b -->x"


def test_no_quote_awareness():
    assert detag('<a title="x>y">z') == 'y">z'


def test_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == (
        "a & b <c> \"d\" 'e'"
    )
    assert decode_entities("&amp;lt;") == "&lt;"  # no double decode


def test_extract_text_script_style_dropped():
    h = b"<html><style>p{}</style><script>var x=1<2;</script><p>keep</p></html>"
    assert extract_text(h) == "keep"


def test_extract_text_bytes_and_strip():
    assert extract_text(b"  <p> hi </p>  ") == "hi"


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=string.ascii_letters + " \t\r\n<>/!?=\"'-&;" + "éà'«»",
        max_size=200,
    )
)
def test_detag_equivalent_to_reference_loop(s):
    assert detag(s) == detag_reference(s)
