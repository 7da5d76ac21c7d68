"""CLI entry points (python -m alix_ray …, SURVEY §3.3 tool set)."""

import json
import os

import pytest
import ray.data


def test_cli_end_to_end(ray_session, tmp_path, capsys):
    from alix_ray.__main__ import main

    src = tmp_path / "docs.parquet"
    rows = [{"doc_id": i, "text": f"alpha beta w{i} gamma"} for i in range(20)]
    ray.data.from_items(rows).write_parquet(str(src))

    idx = str(tmp_path / "idx")
    assert main(["build", "--input", str(src), "--out", idx,
                 "--analyzer", "simple"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["config"]["n_docs"] == 20

    assert main(["search", "--index", idx, "--q", "alpha", "-k", "3"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["total"] == 3 and res["hits"][0]["score"] > 0

    assert main(["doc", "--index", idx, "--id", "7"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["doc_id"] == 7 and "w7" in doc["text"]

    assert main(["suggest", "--index", idx, "--prefix", "alp"]) == 0
    assert "alpha" in capsys.readouterr().out

    assert main(["spell", "--index", idx, "--word", "alpah"]) == 0
    assert "alpha" in capsys.readouterr().out

    toks = str(tmp_path / "toks.parquet")
    assert main(["tokens", "--input", str(src), "--out", toks]) == 0
    capsys.readouterr()
    t = ray.data.read_parquet(toks).to_pandas()
    assert {"doc_id", "pos", "term"} <= set(t.columns)
    assert len(t) == 20 * 4


def test_cli_incremental_lifecycle(ray_session, tmp_path, capsys):
    """add → delete → compact subcommands (IndexWriter protocol)."""
    from alix_ray.__main__ import main

    base = tmp_path / "base.parquet"
    delta = tmp_path / "delta.parquet"
    ray.data.from_items(
        [{"doc_id": i, "text": f"alpha beta w{i}"} for i in range(12)]
    ).write_parquet(str(base))
    ray.data.from_items(
        [{"doc_id": 100 + i, "text": f"alpha delta d{i}"} for i in range(6)]
    ).write_parquet(str(delta))

    idx = str(tmp_path / "incr")
    assert main(["add", "--index", idx, "--input", str(base),
                 "--kind", "documents", "--analyzer", "simple"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generation"] == "gen-00000"
    assert main(["add", "--index", idx, "--input", str(delta),
                 "--kind", "documents", "--analyzer", "simple"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generations"] == ["gen-00000", "gen-00001"]

    assert main(["delete", "--index", idx, "--ids", "3,100"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == 2

    assert main(["compact", "--index", idx, "--prune"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generation"] == "gen-00002"
    assert set(out["pruned"]) == {"gen-00000", "gen-00001"}

    assert main(["search", "--index", idx, "--q", "alpha", "-k", "20"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["total"] == 16  # 18 docs - 2 deleted
    assert not {3, 100} & {h["doc_id"] for h in res["hits"]}

    assert main(["info", "--index", idx]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n_live"] == 16 and len(info["generations"]) == 1

    snap = str(tmp_path / "snap")
    assert main(["snapshot", "--index", idx, "--out", snap]) == 0
    capsys.readouterr()
    assert main(["search", "--index", snap, "--q", "alpha", "-k", "3"]) == 0
    assert json.loads(capsys.readouterr().out)["total"] == 3


@pytest.mark.slow
def test_build_job_submit_and_resume(tmp_path):
    """ray-job entrypoint smoke (north rule deploy path): the job runs
    in its OWN process/session (as `ray job submit` would), produces
    artifacts + one JSON line, and a re-submission against the same
    --out resumes (all stages skipped, much faster)."""
    import json
    import subprocess
    import sys
    import time

    import ray.data

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages_dir = str(tmp_path / "pages")
    from alix_ray.corpus import pages_dataset

    pages_dataset(300).write_parquet(pages_dir)
    out = str(tmp_path / "idx")

    def submit():
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "build_job.py"),
             "--input", pages_dir, "--out", out, "--kind", "pages",
             "--analyzer", "simple"],
            capture_output=True, text=True, timeout=600,
            env={k: v for k, v in os.environ.items()
                 if k != "RAY_ADDRESS"},
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1]), time.time() - t0

    first, t_first = submit()
    assert os.path.exists(os.path.join(out, "postings"))
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))
    second, t_second = submit()
    # resumed run does no stage work (fingerprints all match)
    stage_walls = [v for k, v in second.items()
                   if k.startswith("stage_") and isinstance(v, (int, float))]
    assert second.get("resumed") or t_second < t_first


def test_curate_to_dir_resume(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from alix_ray.pipelines.curate import curate_to_dir

    df = pd.DataFrame({
        "doc_id": range(40),
        "text": ["alpha beta gamma delta " * 12] * 40,  # one survivor
    })
    # distinct docs so dedup keeps them all
    df["text"] = df["text"] + df["doc_id"].astype(str).radd("doc ")
    ds = ray.data.from_pandas(df).repartition(4)
    out = str(tmp_path / "cur")
    c1 = curate_to_dir(ds, out, seq_len=8, min_tokens=10, min_alpha=0.5)
    assert c1["train"] > 0 and (tmp_path / "cur" / "train").is_dir()
    assert (tmp_path / "cur" / "train_offsets").is_dir()
    # rerun: every published split is SKIPPED (-1), nothing rewritten
    before = sorted((tmp_path / "cur" / "train").iterdir())
    c2 = curate_to_dir(ds, out, seq_len=8, min_tokens=10, min_alpha=0.5)
    assert all(v == -1 for v in c2.values())
    assert sorted((tmp_path / "cur" / "train").iterdir()) == before
