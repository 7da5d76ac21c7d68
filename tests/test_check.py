"""Index integrity verification (the CheckIndex analog)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


@pytest.fixture(scope="module")
def healthy_index(ray_session, tmp_path_factory):
    from alix_ray.index.incremental import IndexWriter

    root = str(tmp_path_factory.mktemp("chk"))
    w = IndexWriter(root, analyzer="simple", shard_range=32, num_buckets=4)
    rows = [(i, f"alpha beta w{i % 9} x{i} alpha") for i in range(90)]
    w.add_documents(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    })), input_kind="documents")
    w.add_documents(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100 + i for i in range(30)], pa.int64()),
        "text": pa.array([f"alpha gamma y{i}" for i in range(30)]),
    })), input_kind="documents")
    w.delete_documents(doc_ids=[4, 105])
    return root


def test_healthy_index_checks_clean(healthy_index):
    from alix_ray.index.check import check_index

    report = check_index(healthy_index)
    assert report["ok"], report["errors"]
    assert report["generations"] == 2
    assert report["n_docs"] == 120 and report["n_deleted"] == 2
    assert report["postings_rows"] > 0 and report["vocab"] > 0


def _corrupt_copy(src_root, dst_root, mutate):
    shutil.copytree(src_root, dst_root)
    mutate(dst_root)


def test_detects_term_stats_mismatch(healthy_index, tmp_path):
    from alix_ray.index.check import check_index
    from alix_ray.stages.store import resolve_stage

    dst = str(tmp_path / "bad_ts")

    def mutate(root):
        ts_dir = resolve_stage(os.path.join(root, "gen-00000"),
                               "term_stats")
        f = next(os.path.join(ts_dir, n) for n in os.listdir(ts_dir)
                 if n.endswith(".parquet"))
        t = pq.read_table(f)
        df = t["df"].to_pylist()
        df[0] += 1  # inflate one term's df
        t = t.set_column(t.schema.get_field_index("df"), "df",
                         pa.array(df, t["df"].type))
        pq.write_table(t, f)

    _corrupt_copy(healthy_index, dst, mutate)
    report = check_index(dst)
    assert not report["ok"]
    assert any("term_stats[" in e and "!= postings" in e
               for e in report["errors"])


def test_detects_blob_corruption(healthy_index, tmp_path):
    from alix_ray.index.check import check_index
    from alix_ray.stages.store import resolve_stage

    dst = str(tmp_path / "bad_post")

    def mutate(root):
        p_dir = resolve_stage(os.path.join(root, "gen-00000"), "postings")
        f = next(os.path.join(p_dir, n) for n in os.listdir(p_dir)
                 if n.endswith(".parquet"))
        t = pq.read_table(f)
        tfs = t["tfs"].to_pylist()
        # zero out one shard's tf blob → cf mismatch + bad decode
        tfs[0] = b"\x00" * len(tfs[0])
        t = t.set_column(t.schema.get_field_index("tfs"), "tfs",
                         pa.array(tfs, t["tfs"].type))
        pq.write_table(t, f)

    _corrupt_copy(healthy_index, dst, mutate)
    report = check_index(dst)
    assert not report["ok"]
    assert any("postings[" in e for e in report["errors"])


def test_detects_config_drift(healthy_index, tmp_path):
    from alix_ray.index.check import check_index

    dst = str(tmp_path / "bad_cfg")

    def mutate(root):
        p = os.path.join(root, "gen-00000", "config.json")
        cfg = json.load(open(p))
        cfg["n_docs"] += 5
        json.dump(cfg, open(p, "w"))

    _corrupt_copy(healthy_index, dst, mutate)
    report = check_index(dst)
    assert not report["ok"]
    assert any("config.n_docs" in e for e in report["errors"])


def test_cli_check(healthy_index, capsys):
    from alix_ray.__main__ import main

    assert main(["check", "--index", healthy_index]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["n_deleted"] == 2
