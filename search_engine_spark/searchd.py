"""HTTP search daemon — the reference ``searchd`` surface, stdlib-only.

The reference serves POST ``/search`` on port 8921 (searchd/config.h:1-2)
over libevent (searchd/httpd.c), parsing request JSON
``{"page": N, "kw": [{"type": "term"|"tex", "str": ...}]}``
(searchd/utils.c:65-150 parse_json_qry) and answering with the paginated
hit JSON that ``engine.SearchEngine.query_json`` already renders
(searchd/utils.c:173-389). This module is the listener: a
``http.server.ThreadingHTTPServer`` handler that translates the reference
request shape onto the engine facade. Spark driver-side concurrency note:
requests are serialized through one engine lock — the batch path
(``plans.serve.shard_search`` with a many-query workload) is the
throughput surface; the daemon is the reference-compatible interactive
surface.

Run: ``python -m search_engine_spark.searchd --index <path> [--port 8921]``
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_PORT = 8921  # searchd/config.h:1
DEFAULT_URI = "/search"  # searchd/config.h:2


def keywords_to_qtext(kw_list) -> str:
    """Reference keyword array -> the engine's query text: term keywords
    join as plain text; tex keywords wrap in [imath] tags (the inverse of
    math.search.split_query)."""
    parts = []
    for kw in kw_list:
        t, s = kw.get("type"), kw.get("str", "")
        if t == "tex":
            parts.append(f"[imath]{s}[/imath]")
        elif t == "term":
            parts.append(s)
        else:
            raise ValueError(f"unknown keyword type: {t!r}")
    return " ".join(parts)


def make_handler(engine, lock: threading.Lock):
    class SearchHandler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (http.server API)
            from .engine import RET_BAD_JSON, RET_BAD_PAGE, RET_EMPTY_QRY, errcode_json

            if self.path != DEFAULT_URI:
                self._reply(404, errcode_json(RET_BAD_JSON))
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                page = int(req.get("page", 0))
                qtext = keywords_to_qtext(req.get("kw", []))
            except (ValueError, json.JSONDecodeError):
                # searchd/run/searchd.c:53-59 malformed request JSON
                self._reply(200, errcode_json(RET_BAD_JSON))
                return
            if page < 1:  # parse_json_qry signals failure with page 0
                self._reply(200, errcode_json(RET_BAD_PAGE))
                return
            if not qtext.strip():
                self._reply(200, errcode_json(RET_EMPTY_QRY))
                return
            with lock:  # one Spark action at a time on the shared session
                out = engine.query_json(qtext, page=page)
            self._reply(200, out)

    return SearchHandler


def serve(engine, port: int = DEFAULT_PORT, block: bool = True):
    """Start the daemon; returns the server object (non-blocking callers
    shut it down with ``server.shutdown()``)."""
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine, threading.Lock()))
    if block:
        srv.serve_forever()
    else:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def main() -> None:
    import argparse

    from .engine import SearchEngine
    from .session import get_spark

    ap = argparse.ArgumentParser(description="approach0-shape search daemon")
    ap.add_argument("--index", required=True, help="save_index output path")
    ap.add_argument("--port", type=int, default=DEFAULT_PORT)
    ap.add_argument("--cache-mb", type=int, default=32,
                    help="posting-cache budget (reference postcache default)")
    args = ap.parse_args()
    spark = get_spark("searchd")
    eng = SearchEngine.load(spark, args.index).warm(args.cache_mb << 20)
    print(f"searchd: serving POST {DEFAULT_URI} on 127.0.0.1:{args.port}")
    serve(eng, port=args.port)


if __name__ == "__main__":
    main()
