"""Studio backend: the reference's HTTP surface, stdlib-only.

Parity surface: server/py/bp_server/__main__.py:45-109 — four POST
endpoints with the same routes and request fields:

  /gen_bp_doc   {google_ocr | tesseract_ocr}        → {doc}
  /run_bp_model {doc, model}                        → {results}
  /synthesis    {doc, target_extraction, schema}    → {node}
  /wiif         {doc, node, target_extraction}      → {wiif_node}

Errors return 500 with {error, traceback} like the reference.  Flask is
not available in this environment, so this uses http.server
(ThreadingHTTPServer); CORS headers are emitted for Studio-style
frontends.  Response payload shapes: `doc` is reference Document JSON
(round-trips through bp.document.load_doc_from_json), `node` is our
model-JSON (loads in the reference via the shared model format),
`results` carries top-20 extractions per the reference's NUM_SAMPLES=20
Studio config (the reference's per-BoundNode results tree is a GUI
detail of its pump machinery and is not reproduced).
"""

from __future__ import annotations

import json
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

from .engine.doc_json import (
    doc_json_from_pool, pool_from_doc_json,
    target_assign_from_json as _load_target_assign,
)


def _handle(route: str, payload: Dict[str, Any]) -> Dict[str, Any]:
  from .engine.solver import top_extractions
  from .engine.synthesis import SchemaEntry, synthesize_pattern_node
  from .engine.wiif import why_is_it_failing
  from .model.json_io import dump_model, load_model_from_json
  from .spark.sources import parse_google_ocr, parse_hocr

  if route == '/gen_bp_doc':
    from .engine.entity_gen import build_doc_pool
    google = payload.get('google_ocr')
    hocr = payload.get('tesseract_ocr')
    if google is not None:
      pages = parse_google_ocr(google)
    elif hocr is not None:
      pages = parse_hocr(hocr)
    else:
      raise ValueError('need google_ocr or tesseract_ocr')
    pool = build_doc_pool('random_document_name', pages)
    return {'doc': doc_json_from_pool(pool)}

  if route == '/run_bp_model':
    import time

    from .engine.solver import set_deadline
    pool = pool_from_doc_json(payload['doc'])
    root = load_model_from_json(payload['model'])
    # Per-request solve budget (the Spark pipeline's per-doc default):
    # one pathological request must not pin a server thread forever.
    # set_deadline is thread-local, so concurrent requests don't
    # interfere under ThreadingHTTPServer.
    set_deadline(time.monotonic() + 45.0)
    try:
      tops = top_extractions(root, pool, k=20)  # Studio NUM_SAMPLES=20
    finally:
      set_deadline(None)
    return {'results': {
        'doc_name': pool.name,
        'top_extractions': [
            {'fields': {f: pool.etext[e] for f, e in assign.items()},
             'assignment': dict(assign),
             'score': score}
            for assign, score in tops],
    }}

  if route == '/synthesis':
    pool = pool_from_doc_json(payload['doc'])
    assign = _load_target_assign(payload['target_extraction'], pool)
    schema = tuple(SchemaEntry(e['field'], e['type'], bool(e['is_label']))
                   for e in payload['schema'])
    node = synthesize_pattern_node(assign, schema, pool)
    return {'node': dump_model(node)}

  if route == '/wiif':
    pool = pool_from_doc_json(payload['doc'])
    node = load_model_from_json(payload['node'])
    assign = _load_target_assign(payload['target_extraction'], pool)
    return {'wiif_node': why_is_it_failing(assign, node, pool)}

  raise ValueError(f'unknown route {route}')


class _Handler(BaseHTTPRequestHandler):
  def log_message(self, *args) -> None:  # quiet
    pass

  def _send(self, code: int, blob: Dict[str, Any]) -> None:
    body = json.dumps(blob).encode('utf-8')
    self.send_response(code)
    self.send_header('Content-Type', 'application/json')
    self.send_header('Access-Control-Allow-Origin', '*')
    self.send_header('Content-Length', str(len(body)))
    self.end_headers()
    self.wfile.write(body)

  def do_OPTIONS(self) -> None:  # CORS preflight
    self.send_response(204)
    self.send_header('Access-Control-Allow-Origin', '*')
    self.send_header('Access-Control-Allow-Methods', 'POST, OPTIONS')
    self.send_header('Access-Control-Allow-Headers', 'Content-Type')
    self.end_headers()

  def do_POST(self) -> None:
    try:
      n = int(self.headers.get('Content-Length') or 0)
      payload = json.loads(self.rfile.read(n) or b'{}')
      self._send(200, _handle(self.path, payload))
    except Exception as e:  # noqa: BLE001 — mirror reference handler
      self._send(500, {
          'error': str(e),
          'traceback': traceback.format_exception(
              None, e, e.__traceback__),
      })


def make_server(host: str = '127.0.0.1',
                port: int = 5000) -> ThreadingHTTPServer:
  # Loopback by default: the server has CORS * and no auth (mirroring
  # the reference dev server) — exposing it needs an explicit --host.
  return ThreadingHTTPServer((host, port), _Handler)


def main(argv: Optional[Tuple[str, ...]] = None) -> int:
  import argparse
  ap = argparse.ArgumentParser(prog='blueprint_oss_spark.server')
  ap.add_argument('--host', default='127.0.0.1')
  ap.add_argument('--port', type=int, default=5000)
  args = ap.parse_args(argv)
  srv = make_server(args.host, args.port)
  print(f'serving on {args.host}:{args.port}')
  srv.serve_forever()
  return 0


if __name__ == '__main__':
  raise SystemExit(main())
