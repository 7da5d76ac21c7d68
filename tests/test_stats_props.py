"""Property tests: the distributed scan/quantile/split operators vs
DuckDB on randomized inputs (semantics locked beyond the fixed driver
fixtures)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50),
                  min_size=1, max_size=200),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.55, 0.9, 0.99, 1.0]),
)
def test_exact_quantiles_matches_duckdb_rank(ray_session, vals, q):
    import ray.data

    from alix_ray.ops.stats import exact_quantiles

    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(3)
    got = exact_quantiles(ds, "x", (q,))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(f"""
        WITH ranked AS (SELECT x, row_number() OVER (ORDER BY x) rn,
                        count(*) OVER () n FROM t)
        SELECT max(x) FROM ranked WHERE rn <= ceil({q} * n)
    """).fetchone()[0]
    assert int(got["value"].iloc[0]) == int(want)


@settings(max_examples=15, deadline=None)
@given(
    n_docs=st.integers(min_value=1, max_value=60),
    seq_len=st.integers(min_value=1, max_value=16),
    shard_size=st.sampled_from([1, 3, 1000]),
)
def test_pack_offsets_matches_cumsum(ray_session, n_docs, seq_len,
                                     shard_size):
    import ray.data

    from alix_ray.ops.packing import pack_offsets

    rng = np.random.default_rng(n_docs * 131 + seq_len)
    texts = [" ".join(["w"] * int(rng.integers(0, 9)))
             for _ in range(n_docs)]
    df = pd.DataFrame({"doc_id": range(n_docs), "text": texts})
    got = pack_offsets(ray.data.from_pandas(df).repartition(2),
                       seq_len=seq_len, shard_size=shard_size) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    n_tok = df["text"].str.split().map(len).to_numpy()
    off = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    assert got["offset"].tolist() == off.tolist()
    assert (got["chunk_id"] == got["offset"] // seq_len).all()
    assert (got["chunk_pos"] == got["offset"] % seq_len).all()


@settings(max_examples=10, deadline=None)
@given(frac=st.sampled_from([0.0157, 0.1, 0.33, 0.5, 0.875]))
def test_hash_split_bound_matches_oracle_expression(ray_session, frac):
    import ray.data

    from alix_ray.ops.mixing import hash_split

    df = pd.DataFrame({"doc_id": range(3000)})
    got = hash_split(ray.data.from_pandas(df),
                     {"a": frac, "b": 1.0 - frac}).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    # the oracle writes the bound as DECIMAL weight * resolution —
    # round()ed on the Ray side so both are the same integer
    want = con.execute(f"""
        SELECT CASE WHEN md5_number_lower('split:' || doc_id) % 1000000
                         < round({frac} * 1000000) THEN 'a' ELSE 'b' END
        FROM t ORDER BY doc_id
    """).df().iloc[:, 0].tolist()
    assert got["split"].tolist() == want
