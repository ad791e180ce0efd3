#!/usr/bin/env python3
"""Browser demo — the reference's wasm compressor page equivalent
(reference: wasm/divans_wrapper.js + wasm.html; ours is a tiny HTTP API
over the native engine, since a TPU runtime has no wasm story).

Usage: python research/demo_server.py [port]   (default 8780)
Then open http://localhost:<port>/ — paste text or choose a file,
see compressed size / ratio side by side with zlib, and verify the
round trip.
"""
from __future__ import annotations

import json
import os
import sys
import zlib
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE = """<!doctype html><meta charset="utf-8"><title>divans-tpu demo</title>
<style>body{font-family:sans-serif;max-width:48rem;margin:2rem auto}
textarea{width:100%;height:10rem}table{border-collapse:collapse}
td,th{border:1px solid #999;padding:.3rem .7rem;text-align:right}
th:first-child,td:first-child{text-align:left}</style>
<h1>divans-tpu</h1>
<p>Compress text with the divans-tpu codec (native engine) and compare.</p>
<textarea id=t placeholder="paste text here"></textarea><br>
<label><input type=checkbox id=d checked> deferred profile (chunk=256)</label>
<button onclick="go()">compress</button>
<div id=out></div>
<script>
async function go(){
  const txt = document.getElementById('t').value;
  const r = await fetch('/compress?deferred=' +
      (document.getElementById('d').checked ? '256' : '0'),
      {method:'POST', body: txt});
  const j = await r.json();
  let h = '<table><tr><th>codec</th><th>bytes</th><th>ratio</th></tr>';
  for (const row of j.rows)
    h += `<tr><td>${row.name}</td><td>${row.bytes}</td>` +
         `<td>${row.ratio.toFixed(4)}</td></tr>`;
  h += `</table><p>round trip: ${j.roundtrip ? 'OK' : 'FAILED'}</p>`;
  document.getElementById('out').innerHTML = h;
}
</script>"""


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(PAGE.encode())

    def do_POST(self):
        import divans_tpu
        from divans_tpu.options import DivansOptions

        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        chunk = 0
        if "deferred=" in self.path:
            chunk = int(self.path.split("deferred=")[1].split("&")[0])
        opts = DivansOptions(chunk_nibbles=chunk)
        blob = divans_tpu.compress(data, opts)
        ok = divans_tpu.decompress(blob) == data
        z = zlib.compress(data, 9)
        rows = [
            {"name": "divans-tpu" + (" (deferred)" if chunk else ""),
             "bytes": len(blob), "ratio": len(blob) / max(1, len(data))},
            {"name": "zlib -9", "bytes": len(z),
             "ratio": len(z) / max(1, len(data))},
            {"name": "raw", "bytes": len(data), "ratio": 1.0},
        ]
        body = json.dumps({"rows": rows, "roundtrip": ok}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8780
    print(f"demo on http://localhost:{port}/")
    HTTPServer(("127.0.0.1", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
