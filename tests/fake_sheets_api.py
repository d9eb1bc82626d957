"""In-process fake of the Google Sheets v4 REST endpoints the connector
uses — stdlib http.server only, so the integration test runs air-gapped.

Implements the reference workflow's behavior matrix
(``google_cloud_client.py:44-197``): worksheet-title listing, A1-range
reads with the real API's trailing-empty trimming, batchClear, and RAW
value updates that grow the grid. State is one in-memory dict of
``(spreadsheet_key, worksheet_title) -> grid`` (list of row lists).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlparse

_CELL = re.compile(r"([A-Z]+)([0-9]+)")


def _col_to_idx(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def parse_a1(a1: str, grid_rows: int, grid_cols: int) -> tuple[int, int, int, int]:
    """'A1:C5' / 'A1' / 'A:C' -> (r0, c0, r1, c1) inclusive 0-based,
    unbounded edges clamped to the grid."""
    parts = a1.split(":")
    bounds = []
    for p in parts:
        m = _CELL.fullmatch(p)
        if m:
            bounds.append((int(m.group(2)) - 1, _col_to_idx(m.group(1))))
        elif p.isalpha():  # full column like 'A'
            bounds.append((None, _col_to_idx(p)))
        else:  # full row like '3'
            bounds.append((int(p) - 1, None))
    (r0, c0) = bounds[0]
    (r1, c1) = bounds[-1] if len(bounds) > 1 else bounds[0]
    return (
        0 if r0 is None else r0,
        0 if c0 is None else c0,
        grid_rows - 1 if r1 is None else r1,
        grid_cols - 1 if c1 is None else c1,
    )


class FakeSheetsState:
    def __init__(self):
        self.grids: dict[tuple[str, str], list[list]] = {}

    def seed(self, key: str, title: str, grid: list[list]) -> None:
        self.grids[(key, title)] = [list(r) for r in grid]


def _split_range(qualified: str) -> tuple[str, str]:
    title, _, rng = qualified.partition("!")
    return title, rng


class _Handler(BaseHTTPRequestHandler):
    state: FakeSheetsState  # set by make_server

    def log_message(self, *a):  # silence test output
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _grid(self, key: str, title: str):
        g = self.state.grids.get((key, title))
        if g is None:
            self._send(404, {"error": {"message": f"no sheet {title}"}})
        return g

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length", "0"))
        return json.loads(self.rfile.read(n)) if n else {}

    def do_GET(self):
        u = urlparse(self.path)
        segs = [unquote(s) for s in u.path.split("/") if s]
        # /v4/spreadsheets/{key}  (metadata: worksheet titles)
        if len(segs) == 3 and segs[0] == "v4":
            key = segs[2]
            titles = sorted(t for k, t in self.state.grids if k == key)
            self._send(
                200,
                {"sheets": [{"properties": {"title": t}} for t in titles]},
            )
            return
        # /v4/spreadsheets/{key}/values/{range}
        if len(segs) == 5 and segs[3] == "values":
            key, qualified = segs[2], segs[4]
            title, rng = _split_range(qualified)
            g = self._grid(key, title)
            if g is None:
                return
            rows = len(g)
            cols = max((len(r) for r in g), default=0)
            r0, c0, r1, c1 = parse_a1(rng, rows, cols)
            out = []
            for r in range(r0, min(r1, rows - 1) + 1):
                row = [
                    g[r][c] if c < len(g[r]) else ""
                    for c in range(c0, min(c1, cols - 1) + 1)
                ]
                # the real values API trims trailing empty cells per row
                while row and (row[-1] == "" or row[-1] is None):
                    row.pop()
                out.append(row)
            # ... and trailing all-empty rows
            while out and not out[-1]:
                out.pop()
            payload = {"range": qualified, "majorDimension": "ROWS"}
            if out:
                payload["values"] = out
            self._send(200, payload)
            return
        self._send(404, {"error": {"message": f"bad path {self.path}"}})

    def do_POST(self):
        u = urlparse(self.path)
        segs = [unquote(s) for s in u.path.split("/") if s]
        # /v4/spreadsheets/{key}/values:batchClear
        if len(segs) == 4 and segs[3] == "values:batchClear":
            key = segs[2]
            for qualified in self._read_body().get("ranges", []):
                title, rng = _split_range(qualified)
                g = self._grid(key, title)
                if g is None:
                    return
                rows = len(g)
                cols = max((len(r) for r in g), default=0)
                r0, c0, r1, c1 = parse_a1(rng, rows, cols)
                for r in range(r0, min(r1, rows - 1) + 1):
                    for c in range(c0, min(c1, len(g[r]) - 1) + 1):
                        g[r][c] = ""
            self._send(200, {"clearedRanges": True})
            return
        self._send(404, {"error": {"message": f"bad path {self.path}"}})

    def do_PUT(self):
        u = urlparse(self.path)
        segs = [unquote(s) for s in u.path.split("/") if s]
        # /v4/spreadsheets/{key}/values/{range}?valueInputOption=RAW
        if len(segs) == 5 and segs[3] == "values":
            key, qualified = segs[2], segs[4]
            title, rng = _split_range(qualified)
            if (key, title) not in self.state.grids:
                self.state.grids[(key, title)] = []
            g = self.state.grids[(key, title)]
            values = self._read_body().get("values", [])
            r0, c0, _, _ = parse_a1(rng, len(g), 0)
            for i, row in enumerate(values):
                while len(g) <= r0 + i:
                    g.append([])
                target = g[r0 + i]
                for j, v in enumerate(row):
                    while len(target) <= c0 + j:
                        target.append("")
                    target[c0 + j] = v
            self._send(
                200, {"updatedRange": qualified, "updatedRows": len(values)}
            )
            return
        self._send(404, {"error": {"message": f"bad path {self.path}"}})


def make_server(state: FakeSheetsState) -> tuple[ThreadingHTTPServer, str]:
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
