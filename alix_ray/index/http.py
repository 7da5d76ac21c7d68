"""Thin HTTP façade over the op registry — the servlet container layer.

Reference: ``AlixServlet.java:109-146`` (path routing ``/{base}/{op}``)
and ``:283`` (``{op}.{format}`` split).  The engine work all lives in
:mod:`alix_ray.index.registry`; this module only maps HTTP to
``registry.handle`` with stdlib ``http.server`` (no web framework in
the container, and none needed — the handler is ~stateless dispatch
over frozen :class:`BM25Index` handles).

Routes::

    GET /                         → {"indexes": [...], "ops": [...]}
    GET /{index}/{op}             → op result as JSON (".data" dispatch)
    GET /{index}/{op}.{format}    → rendered hit list (json/jsonl/csv/
                                    html/docx — ops/render.py hooks)

Query params pass through as the op's ``pars`` (single-valued); the
``docs`` param (op ``terms``) is comma-separated ints.

Scale shape: one process serves one replica set of frozen handles.
The handles' artifacts are immutable, but their LAZY caches
(posting row groups, doc-stat slices, top-k memos) mutate on read and
are not lock-free — so dispatch is serialized behind one per-server
lock (``ThreadingHTTPServer`` threads only overlap on network I/O).
Horizontal scale = more processes behind any TCP balancer, exactly
the reference's servlet-container deployment; index swap = new
process generation (handles are snapshots, like ``DirectoryReader``)."""

from __future__ import annotations

import datetime as _dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import numpy as np

from .registry import OPS, IndexRegistry, handle

_CONTENT_TYPES = {
    "data": "application/json; charset=utf-8",
    "json": "application/json; charset=utf-8",
    "jsonl": "application/x-ndjson; charset=utf-8",
    "csv": "text/csv; charset=utf-8",
    "html": "text/html; charset=utf-8",
    "docx": ("application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document"),
}


def _jsonable(x):
    """Python value → JSON-encodable (numpy scalars/arrays, DataFrames,
    timestamps; the op handlers return engine-native types)."""
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, np.integer):
        return int(x)
    if isinstance(x, np.floating):
        return float(x)
    if isinstance(x, np.ndarray):
        return [_jsonable(v) for v in x.tolist()]
    if isinstance(x, (_dt.datetime, _dt.date)):
        return str(x)
    if isinstance(x, bytes):
        return x.decode("utf-8", "replace")
    try:  # pandas without importing it eagerly
        import pandas as pd

        if isinstance(x, pd.DataFrame):
            return [_jsonable(r) for r in x.to_dict("records")]
        if isinstance(x, pd.Timestamp):
            return str(x)
    except ImportError:  # pragma: no cover
        pass
    return x


class _Handler(BaseHTTPRequestHandler):
    # set by serve(): registry, default_pars, lock
    registry: IndexRegistry = None  # type: ignore[assignment]
    default_pars: dict = {}
    lock: threading.Lock = None  # type: ignore[assignment]

    def log_message(self, *a):  # quiet by default (tests/servers)
        pass

    def _send(self, code: int, body, ctype: str) -> None:
        data = body if isinstance(body, bytes) else str(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send_json(self, code: int, obj) -> None:
        self._send(code, json.dumps(_jsonable(obj)),
                   _CONTENT_TYPES["data"])

    def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
        try:
            split = urlsplit(self.path)
            parts = [p for p in split.path.split("/") if p]
            if not parts:
                self._send_json(200, {
                    "indexes": sorted(self.registry._dirs),
                    "ops": sorted(OPS),
                })
                return
            if len(parts) != 2:
                self._send_json(404, {"error": "use /{index}/{op}[.fmt]"})
                return
            name, op_fmt = parts
            try:
                ix = self.registry.get(name)
            except KeyError:
                self._send_json(404, {"error": f"unknown index {name!r}"})
                return
            pars = dict(self.default_pars)
            for k, vs in parse_qs(split.query).items():
                pars[k] = vs[0]
            if "docs" in pars and isinstance(pars["docs"], str):
                pars["docs"] = [int(v) for v in pars["docs"].split(",") if v]
            fmt = op_fmt.partition(".")[2] or "data"
            # the frozen handles' lazy caches are not thread-safe —
            # serialize engine work; threads overlap on socket I/O only
            with self.lock:
                result = handle(ix, op_fmt, pars)
            if fmt == "data":
                self._send_json(200, result)
            else:
                self._send(200, result, _CONTENT_TYPES[fmt])
        except (KeyError, ValueError) as e:
            self._send_json(400, {"error": str(e)})
        except Exception as e:  # defensive: one bad request ≠ dead server
            self._send_json(500, {"error": f"{type(e).__name__}: {e}"})


class AlixHTTPServer:
    """Owning wrapper: background-thread ``ThreadingHTTPServer`` over a
    registry of frozen index handles.  ``port=0`` picks a free port
    (``.port`` reports it)."""

    def __init__(self, indexes: dict[str, str], host: str = "127.0.0.1",
                 port: int = 0, sf_dir: str | None = None):
        self.registry = IndexRegistry()
        for name, d in indexes.items():
            self.registry.get(name, d)  # open (and validate) upfront
        handler = type("BoundHandler", (_Handler,), {
            "registry": self.registry,
            "default_pars": {"sf_dir": sf_dir} if sf_dir else {},
            "lock": threading.Lock(),
        })
        self._srv = ThreadingHTTPServer((host, port), handler)
        self.host, self.port = self._srv.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "AlixHTTPServer":
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._srv.serve_forever()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "AlixHTTPServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
