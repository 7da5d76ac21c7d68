"""CLI entry points (python -m alix_ray …, SURVEY §3.3 tool set)."""

import json

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
