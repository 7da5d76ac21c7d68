"""HTTP façade over the op registry (the AlixServlet container layer).

Drives a real ``ThreadingHTTPServer`` on a loopback port with
``http.client`` — route parsing, format content types, param passing,
and error mapping."""

import http.client
import json

import pytest
import ray.data


@pytest.fixture(scope="module")
def http_server(ray_session, tmp_path_factory):
    from alix_ray.index.http import AlixHTTPServer
    from alix_ray.stages.build import IndexBuilder

    out = str(tmp_path_factory.mktemp("httpidx") / "idx")

    def page(i):
        body = (f"alpha beta w{i} target gamma" if i % 3 else
                f"alpha target beta near{i}")
        return {"url": f"http://s/{i:03d}", "warc_ts": 1500000000 + i,
                "html": f"<html><body><p>{body}</p></body></html>".encode(),
                "lang": "fr", "text": ""}

    b = IndexBuilder(out, analyzer="simple", keep_positions=True)
    b.build(ray.data.from_items([page(i) for i in range(40)]),
            input_kind="pages", fingerprint="http")
    with AlixHTTPServer({"main": out}) as srv:
        yield srv


def _get(srv, path):
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=10)
    try:
        conn.request("GET", path)
        r = conn.getresponse()
        return r.status, r.getheader("Content-Type"), r.read()
    finally:
        conn.close()


def test_root_lists_indexes_and_ops(http_server):
    status, ctype, body = _get(http_server, "/")
    assert status == 200 and ctype.startswith("application/json")
    j = json.loads(body)
    assert j["indexes"] == ["main"]
    assert "results" in j["ops"] and "suggest" in j["ops"]


def test_results_data_and_formats(http_server):
    status, _t, body = _get(http_server, "/main/results?q=target&k=5")
    assert status == 200
    hits = json.loads(body)
    assert len(hits) == 5 and hits[0][1] >= hits[-1][1]
    # rendered json format has the render hook's envelope
    status, ctype, body = _get(http_server, "/main/results.json?q=target&k=5")
    assert status == 200 and ctype.startswith("application/json")
    j = json.loads(body)
    assert j["total"] == 5 and j["hits"][0]["doc_id"] == hits[0][0]
    status, ctype, body = _get(http_server, "/main/results.csv?q=target&k=2")
    assert status == 200 and ctype.startswith("text/csv")
    assert body.decode().splitlines()[0].startswith("rank,")
    status, ctype, body = _get(http_server, "/main/results.docx?q=target&k=2")
    assert status == 200 and body[:2] == b"PK"
    assert "wordprocessingml" in ctype


def test_doc_suggest_freqlist_terms(http_server):
    status, _t, body = _get(http_server, "/main/results?q=target&k=1")
    doc_id = json.loads(body)[0][0]
    status, _t, body = _get(http_server, f"/main/doc?id={doc_id}")
    assert status == 200
    d = json.loads(body)
    assert d["doc_id"] == doc_id and d["url"].startswith("http://s/")
    status, _t, body = _get(http_server, "/main/suggest?q=tar&k=3")
    assert status == 200
    assert any(t == "target" for t, _c in json.loads(body))
    status, _t, body = _get(http_server, "/main/freqlist?k=5")
    assert status == 200 and len(json.loads(body)) == 5
    status, _t, body = _get(http_server,
                            f"/main/terms?docs={doc_id}&k=5&mode=BM25")
    assert status == 200 and len(json.loads(body)) > 0


def test_error_mapping(http_server):
    status, _t, body = _get(http_server, "/nope/results?q=x")
    assert status == 404 and "unknown index" in json.loads(body)["error"]
    status, _t, body = _get(http_server, "/main/bogus?q=x")
    assert status == 400 and "unknown op" in json.loads(body)["error"]
    status, _t, body = _get(http_server, "/main/suggest.csv?q=tar")
    assert status == 400  # format rendering is results-only
    status, _t, body = _get(http_server, "/only-one-part")
    assert status == 404
