#!/usr/bin/env python3
"""Minimal REST serving example for STL results — the engine twin of the
reference's demo server (ref: examples/StlDemoRestServer/StlDemoRestServer.java:27-60),
which decomposes the CO2 series once at startup (period 12, seasonal width
35, non-robust) and serves the StlResults JSON at GET /stldemo with CORS
enabled.  Stdlib-only (http.server); the JSON shape comes from
sources/timeseries.decomposition_to_json (StlResults.java:8-15).

Usage: python jobs/stl_rest_server.py [--port 4567] [--one-shot]
"""
from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stl_decomp_4j_spark.sources.timeseries import decomposition_to_json  # noqa: E402
from stl_decomp_4j_spark.stl import decompose  # noqa: E402


def build_results_json() -> str:
    import numpy as np

    fx = json.load(open(Path(__file__).resolve().parent.parent / "tests/fixtures/co2_golden.json"))
    data = np.array(fx["data"])
    d = decompose(data, 12, seasonal_width=35, robust=False)
    return decomposition_to_json(d)


class _Handler(BaseHTTPRequestHandler):
    results_json = ""

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        if self.path != "/stldemo":
            self.send_error(404)
            return
        body = self.results_json.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        # ref enableCORS("*", "*", "*")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Methods", "*")
        self.send_header("Access-Control-Allow-Headers", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet
        pass


def serve(port: int = 4567, one_shot: bool = False) -> HTTPServer:
    _Handler.results_json = build_results_json()
    httpd = HTTPServer(("127.0.0.1", port), _Handler)
    if one_shot:
        httpd.handle_request()
    else:
        print(f"serving STL results at http://127.0.0.1:{httpd.server_port}/stldemo")
        httpd.serve_forever()
    return httpd


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=4567)
    ap.add_argument("--one-shot", action="store_true")
    args = ap.parse_args()
    serve(args.port, args.one_shot)
