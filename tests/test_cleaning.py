"""Unit tests for the web-corpus cleaning operators
(alix_ray/ops/cleaning.py): PII redaction, repetition metrics,
decontamination, global line dedup.  Each op is also full-oracle
checked by the driver (pipelines/queries.py); these tests cover the
shapes the sf tables can't (newline-y text, nulls, within-doc dups)
against hand-computed expectations or an inline DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
    )


class TestPiiRedact:
    def test_all_families_and_order(self, ray_session):
        from alix_ray.ops.cleaning import pii_redact

        ds = _ds([
            (1, "write a@b.co or c.d-e@sub.domain.org now"),
            (2, "srv 10.0.255.3 and 192.168.1.1, call 555-123-4567"),
            (3, "dot phone 800.555.1234 end"),
            (4, None),
            (5, "no pii here"),
        ])
        df = pii_redact(ds).to_pandas().set_index("doc_id").sort_index()
        assert df.loc[1, "text"] == "write <EMAIL> or <EMAIL> now"
        assert df.loc[1, "n_emails"] == 2
        assert df.loc[2, "text"] == "srv <IP> and <IP>, call <PHONE>"
        assert (df.loc[2, "n_ips"], df.loc[2, "n_phones"]) == (2, 1)
        assert df.loc[3, "text"] == "dot phone <PHONE> end"
        assert df.loc[4, "text"] == ""
        assert df.loc[5, "text"] == "no pii here"
        assert df[["n_emails", "n_ips", "n_phones"]].to_numpy().sum() == 6

    def test_counts_match_staged_oracle(self, ray_session):
        # counts are per stage of the redaction cascade: the IP count
        # is measured AFTER emails are gone (an email containing an
        # ip-like host must not double-count)
        from alix_ray.ops.cleaning import pii_redact

        df = pii_redact(_ds([(1, "x@1.2.3.44 stop")])).to_pandas()
        assert df.loc[0, "n_emails"] == 0  # TLD must be alphabetic
        assert df.loc[0, "n_ips"] == 1


class TestRepetition:
    def test_hand_values(self, ray_session):
        from alix_ray.ops.cleaning import repetition_metrics

        ds = _ds([
            (1, "a b a b a b c"),     # bigram (a,b) x3 / 6 slots
            (2, "x\ny\nx\nz z z z"),  # dup line + run of 4
            (3, ""),
            (4, "solo"),
        ])
        df = repetition_metrics(ds).to_pandas().set_index("doc_id")
        assert df.loc[1, "top_bigram_frac"] == pytest.approx(0.5)
        assert df.loc[1, "max_run"] == 1
        assert df.loc[2, "max_run"] == 4
        assert df.loc[2, "dup_line_frac"] == pytest.approx(0.25)
        assert df.loc[3, "n_tokens"] == 0
        assert df.loc[4, "top_bigram_frac"] == 0.0
        assert df.loc[4, "max_run"] == 1

    def test_matches_duckdb_oracle_on_newline_text(self, ray_session):
        from alix_ray.ops.cleaning import repetition_metrics
        from alix_ray.pipelines.queries import SQL_REPETITION

        rng = np.random.default_rng(7)
        words = ["aa", "bb", "cc", "dd"]
        rows = []
        for i in range(40):
            toks = rng.choice(words, size=rng.integers(0, 30))
            # sprinkle newlines to exercise the line metrics
            s = " ".join(toks).replace(" bb ", "\nbb\n")
            rows.append((i, s))
        mine = (repetition_metrics(_ds(rows)).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(rows, columns=["doc_id", "text"]),
        )
        want = con.execute(SQL_REPETITION).fetchdf()
        pd.testing.assert_frame_equal(
            mine.astype({"n_tokens": "int64", "max_run": "int64"}),
            want.astype({"n_tokens": "int64", "max_run": "int64"}),
        )


class TestDecontaminate:
    def test_known_overlap(self, ray_session):
        from alix_ray.ops.cleaning import decontaminate

        bench = _ds([(100, "the quick brown fox jumps")])
        scan = _ds([
            (1, "lazy the quick brown fox here"),   # 2 distinct 3-grams
            (2, "quick brown dog"),                  # none
            (3, "the quick brown fox jumps again"),  # 3 distinct
            (4, None),
        ])
        df = decontaminate(scan, bench, n=3).to_pandas() \
            .set_index("doc_id").sort_index()
        assert df["n_contaminated"].to_dict() == {1: 2, 3: 3}

    def test_short_docs_emit_no_grams(self, ray_session):
        from alix_ray.ops.cleaning import decontaminate

        bench = _ds([(9, "a b")])  # < n tokens → empty benchmark set
        scan = _ds([(1, "a b c d")])
        assert len(decontaminate(scan, bench, n=3).to_pandas()) == 0


class TestLineDedup:
    def test_keep_first_including_within_doc(self, ray_session):
        from alix_ray.ops.cleaning import line_dedup

        ds = _ds([
            (1, "shared line\nown one"),
            (2, "shared line\nown two\nown two"),  # within-doc dup too
            (3, "shared line"),                    # loses everything
        ])
        df = line_dedup(ds).to_pandas().set_index("doc_id")["text"]
        assert df.to_dict() == {
            1: "shared line\nown one",
            2: "own two",
        }  # doc 3 drops out entirely

    def test_matches_duckdb_keep_first(self, ray_session):
        from alix_ray.ops.cleaning import line_dedup

        rng = np.random.default_rng(11)
        pool = [f"line {i}" for i in range(12)]
        rows = [
            (i, "\n".join(rng.choice(pool, size=rng.integers(1, 6))))
            for i in range(60)
        ]
        mine = (line_dedup(_ds(rows)).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = con.execute("""
WITH lines AS (
  SELECT doc_id, i AS line_no, arr[i] AS line FROM
    (SELECT doc_id, list_filter(string_split(text, chr(10)),
                                x -> x <> '') arr FROM docs),
    LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) s),
kept AS (SELECT doc_id, line_no, line FROM (
  SELECT *, row_number() OVER (PARTITION BY line
    ORDER BY doc_id, line_no) rn FROM lines) WHERE rn = 1)
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
FROM kept GROUP BY doc_id ORDER BY doc_id
        """).fetchdf()
        pd.testing.assert_frame_equal(mine, want)

    def test_pkey_hash_is_process_stable(self):
        # the groupby key must not depend on Python's per-process
        # str-hash salt; pd.util.hash_array uses a fixed key
        h1 = pd.util.hash_array(np.asarray(["abc", "def"], dtype=object))
        assert h1.tolist() == [
            pd.util.hash_array(np.asarray(["abc"], dtype=object))[0],
            pd.util.hash_array(np.asarray(["def"], dtype=object))[0],
        ]


class TestSubstringDupSpans:
    def test_keep_first_across_and_within_docs(self, ray_session):
        from alix_ray.ops.cleaning import substring_dup_spans

        ds = _ds([
            (1, "a b c d e"),       # windows: "a b c"@1 "b c d"@2 "c d e"@3
            (2, "x a b c d y"),     # repeats "a b c"@2, "b c d"@3
            (3, "a b c a b c a"),   # self-repeat: "a b c"@4; also "b c a"@2,5...
            (4, "zz"),              # < w tokens → no windows
        ])
        df = substring_dup_spans(ds, w=3).to_pandas() \
            .sort_values(["doc_id", "pos"]).reset_index(drop=True)
        got = set(zip(df["doc_id"], df["pos"]))
        # "a b c" first occurs at (1,1): redundant at (2,2), (3,1)?? no —
        # (1,1) is first in global order, then (2,2), (3,1), (3,4)
        assert (2, 2) in got and (2, 3) in got
        assert (3, 1) in got and (3, 4) in got
        assert (1, 1) not in got and (1, 2) not in got and (1, 3) not in got
        assert not any(d == 4 for d, _ in got)

    def test_matches_duckdb_window_oracle(self, ray_session):
        from alix_ray.ops.cleaning import substring_dup_spans

        rows = [(i, " ".join(
            f"t{(i * 7 + j) % 5}" for j in range(12))) for i in range(30)]
        mine = substring_dup_spans(_ds(rows), w=4).to_pandas() \
            .sort_values(["doc_id", "pos"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows,
                                               columns=["doc_id", "text"]))
        want = con.execute("""
WITH arr AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
    '[^a-z0-9]+'), x -> x <> '') AS a FROM documents),
win AS (SELECT doc_id, i AS pos,
    array_to_string(a[i : i + 3], ' ') AS w
  FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a) - 3)) AS i) s),
ranked AS (SELECT doc_id, pos, row_number() OVER (
    PARTITION BY w ORDER BY doc_id, pos) AS rn FROM win)
SELECT doc_id, pos FROM ranked WHERE rn > 1 ORDER BY doc_id, pos
        """).fetchdf()
        want["pos"] = want["pos"].astype("int64")
        pd.testing.assert_frame_equal(mine, want)
