import numpy as np

from alix_ray.corpus import DUP_EVERY, make_page, pages_batch
from alix_ray.extract import extract_text


def test_deterministic():
    a = make_page(17)
    b = make_page(17)
    assert a == b


def test_text_is_extraction_oracle():
    from alix_ray.stages.analyze import MAX_HTML_BYTES

    for i in [0, 1, 3, 50, 101, 211 + 3]:
        r = make_page(i)
        assert r["text"] == extract_text(r["html"])
    # oversized rows exceed the quarantine threshold and expect the
    # quarantined empty string, not the raw extraction
    for i in [5, 997 + 5]:
        r = make_page(i)
        assert len(r["html"]) > MAX_HTML_BYTES
        assert r["text"] == ""


def test_duplicate_urls_distinct_ts():
    base = make_page(DUP_EVERY)
    dup = make_page(DUP_EVERY + 1)
    assert dup["url"] == base["url"]
    assert dup["warc_ts"] > base["warc_ts"]


def test_batch_independent_of_batching():
    whole = pages_batch(np.arange(0, 20))
    parts = [pages_batch(np.arange(0, 7)), pages_batch(np.arange(7, 20))]
    import pyarrow as pa

    joined = pa.concat_tables(parts)
    assert joined.equals(whole)
