"""Percolator (standing-query monitor) tests."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


def test_conjunctive_matching(ray_session):
    from alix_ray.index.monitor import percolate

    docs = _docs({
        "doc_id": [0, 1, 2, 3],
        "text": ["Scan the JOIN table now",   # scan+join
                 "scan only here",            # scan, no join
                 "join and scan and join",    # both (dup join)
                 ""]})                        # empty
    queries = {"sj": ["scan", "join"], "s": ["scan"],
               "rare": ["zzz"]}
    got = (percolate(docs, queries).to_pandas()
           .sort_values(["doc_id", "query"]).reset_index(drop=True))
    want = pd.DataFrame({
        "doc_id": [0, 0, 1, 2, 2],
        "query": ["s", "sj", "s", "s", "sj"]})
    pd.testing.assert_frame_equal(got, want)


def test_partition_independence_and_registry_prefilter(ray_session):
    from alix_ray.index.monitor import Percolator, percolate

    rng = np.random.RandomState(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.randint(1, 6)))
             for _ in range(60)]
    docs = _docs({"doc_id": np.arange(60), "text": texts})
    queries = {"ab": ["alpha", "beta"], "g": ["gamma"]}
    key = ["doc_id", "query"]
    a = (percolate(docs, queries).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (percolate(docs.repartition(7), queries).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # tokens outside the registry never reach the merge
    p = Percolator(queries)
    out = p(pa.table({"doc_id": pa.array([9], pa.int64()),
                      "text": pa.array(["unregistered words only"])}))
    assert out.num_rows == 0


def test_string_ids_and_custom_id_col(ray_session):
    from alix_ray.index.monitor import percolate

    docs = _docs({"page": ["u1", "u2"],
                  "text": ["scan join", "nothing"]})
    got = (percolate(docs, {"sj": ["scan", "join"]}, id_col="page")
           .to_pandas())
    assert list(got.columns) == ["page", "query"]
    assert got["page"].tolist() == ["u1"]
