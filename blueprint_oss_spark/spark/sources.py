"""OCR source loaders: Google Cloud Vision JSON, IBOCR JSON, hOCR → the
engine's page/word structure, plus Spark readers that fan extraction out
over OCR file collections.

Semantics mirror the reference loaders:
  Google Vision  bp/google_ocr_file.py:16-59 (blocks→paragraphs→words,
                 vertices[0].x/[1].x and [0].y/[2].y span the bbox)
  IBOCR          bp/ibocr_file.py:16-57 (first blob's lines + metadata
                 layouts)
  hOCR           bp/hocr_file.py (via the hocr_parser lib there; here a
                 minimal stdlib parser of ocr_page / ocrx_word nodes)

Pages are emitted with page-local word coordinates; vertical stacking
happens in the engine (bp/build_document.py:49-69 semantics).
"""

from __future__ import annotations

import json
import re
from itertools import chain
from typing import Any, Dict, Iterator, List, Optional

import pandas as pd


def parse_google_ocr(raw: Dict[str, Any]) -> List[dict]:
  pages = []
  for page_number, page in enumerate(raw['fullTextAnnotation']['pages']):
    words = []
    for block in page['blocks']:
      for paragraph in block['paragraphs']:
        for word in paragraph['words']:
          v = word['boundingBox']['vertices']
          if len(v) != 4:
            raise ValueError(f'invalid vertices {v}, must be length 4')
          x0, x1 = sorted([v[0]['x'], v[1]['x']])
          y0, y1 = sorted([v[0]['y'], v[2]['y']])
          text = ''.join(s['text'] for s in word['symbols'])
          words.append((text, float(x0), float(x1), float(y0),
                        float(y1)))
    pages.append({'page_number': page_number + 1,
                  'width': float(page['width']),
                  'height': float(page['height']),
                  'words': words})
  return pages


def parse_ibocr(raw: Any) -> List[dict]:
  blob = raw[0]
  layouts = blob['metadata_list']
  all_words = list(chain.from_iterable(blob['lines']))
  pages = []
  for page_number in range(len(layouts)):
    layout = layouts[page_number]['layout']
    words = [(w['word'],
              float(min(w['start_x'], w['end_x'])),
              float(max(w['start_x'], w['end_x'])),
              float(min(w['start_y'], w['end_y'])),
              float(max(w['start_y'], w['end_y'])))
             for w in all_words if w['page'] == page_number]
    pages.append({'page_number': page_number + 1,
                  'width': float(layout['width']),
                  'height': float(layout['height']),
                  'words': words})
  return pages


_HOCR_BBOX = re.compile(r'bbox (\d+) (\d+) (\d+) (\d+)')


def parse_hocr(text: str) -> List[dict]:
  """General-Tesseract hOCR parser (reference loader:
  bp/hocr_file.py:38-80 via the hocr_parser lib).

  Handles the full format, not just the MIDV-2020 subset:
    * multi-class attributes (`class="ocrx_word highlight"`);
    * arbitrary block nesting (ocr_carea / ocr_par / ocr_line wrappers
      are transparent — only pages and words carry geometry we need);
    * markup INSIDE a word (`<span class=ocrx_word>a<strong>b</strong>
      c</span>` → one word "abc", tracked by tag depth);
    * text split across parser chunks / entity references;
    * a word with no bbox in its title is skipped (the reference
      raises; for a bulk 100 TB ingest a malformed word must not kill
      the file);
    * a page with no bbox gets its extent from its words' hull.
  """
  from html.parser import HTMLParser

  class P(HTMLParser):
    def __init__(self):
      super().__init__(convert_charrefs=True)
      self.pages: List[dict] = []
      self._word_bbox: Optional[tuple] = None
      self._word_parts: List[str] = []
      self._depth = 0

    def _finish_word(self):
      textv = ' '.join(''.join(self._word_parts).split())
      if textv and self._word_bbox is not None:
        x0, y0, x1, y1 = self._word_bbox
        self.pages[-1]['words'].append(
            (textv, float(x0), float(x1), float(y0), float(y1)))
      self._word_bbox = None
      self._word_parts = []
      self._depth = 0

    def handle_starttag(self, tag, attrs):
      a = dict(attrs)
      classes = (a.get('class') or '').split()
      if self._word_bbox is not None:
        self._depth += 1  # markup nested inside the word
        return
      m = _HOCR_BBOX.search(a.get('title') or '')
      if 'ocr_page' in classes:
        bbox = tuple(map(int, m.groups())) if m else None
        self.pages.append({
            'page_number': len(self.pages) + 1,
            'width': float(bbox[2] - bbox[0]) if bbox else 0.0,
            'height': float(bbox[3] - bbox[1]) if bbox else 0.0,
            'words': []})
      elif 'ocrx_word' in classes and m and self.pages:
        self._word_bbox = tuple(map(int, m.groups()))
        self._word_parts = []
        self._depth = 0

    def handle_startendtag(self, tag, attrs):
      # self-closing tags inside a word must not pop the word; a <br/>
      # is itself a word-internal break → one space
      if tag == 'br' and self._word_bbox is not None:
        self._word_parts.append(' ')

    def handle_data(self, data):
      if self._word_bbox is not None:
        self._word_parts.append(data)

    def handle_endtag(self, tag):
      if self._word_bbox is not None:
        if self._depth:
          self._depth -= 1
        else:
          self._finish_word()

    def close(self):
      super().close()
      if self._word_bbox is not None and self.pages:
        self._finish_word()  # truncated file: flush the open word
      for pg in self.pages:
        if (pg['width'] == 0.0 or pg['height'] == 0.0) and pg['words']:
          pg['width'] = max(w[2] for w in pg['words'])
          pg['height'] = max(w[4] for w in pg['words'])

  p = P()
  p.feed(text)
  p.close()
  return p.pages


def _parse_pdf_bytes(b: bytes):
  from .pdf import parse_pdf
  return parse_pdf(b)


PARSERS = {
    'google': lambda b: parse_google_ocr(
        json.loads(b.decode('utf-8', errors='ignore'))),
    'ibocr': lambda b: parse_ibocr(json.loads(b.decode('utf-8'))),
    'hocr': lambda b: parse_hocr(b.decode('utf-8', errors='ignore')),
    'pdf': _parse_pdf_bytes,
}


def extract_from_ocr_files(spark, path_glob: str, root, *,
                           ocr_format: str = 'google'):
  """Bulk extraction over a collection of OCR files: binaryFile scan →
  mapInPandas(parse + solve).  Same zero-shuffle shape as the spans
  pipeline; the `content` column stays inside Arrow buffers until the
  parse call."""
  parser = PARSERS[ocr_format]

  def pool_builder(doc_id: str, content: bytes):
    from ..engine.entity_gen import build_doc_pool
    return build_doc_pool(doc_id, parser(content))

  return _extract_files(spark, path_glob, root, pool_builder)


def extract_from_doc_json_files(spark, path_glob: str, root):
  """Bulk extraction over reference-format Document JSON files
  (bp/document.py:188-207 round-trip format): binaryFile scan →
  mapInPandas(load pool + solve), zero-shuffle."""

  def pool_builder(doc_id: str, content: bytes):
    from ..engine.doc_json import pool_from_doc_json
    pool = pool_from_doc_json(json.loads(content.decode('utf-8')))
    pool.name = doc_id
    return pool

  return _extract_files(spark, path_glob, root, pool_builder)


def _extract_files(spark, path_glob: str, root, pool_builder):
  import pickle

  from .pipeline import OUTPUT_SCHEMA, compile_blueprint

  payload = compile_blueprint(root)
  bc = spark.sparkContext.broadcast(payload)

  df = (spark.read.format('binaryFile').load(path_glob)
        .select('path', 'content'))

  def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..engine.solver import best_extraction
    from .pipeline import tree_from_payload
    tree = tree_from_payload(bc.value)
    for pdf in batches:
      rows = []
      for path, content in zip(pdf['path'], pdf['content']):
        import time as _time
        t0 = _time.monotonic()
        doc_id = path.rsplit('/', 1)[-1]
        row = {'doc_id': doc_id, 'out_spans': [], 'fields': {},
               'score': 0.0, 'n_entities': 0, 'n_words': 0,
               'error': None, 'elapsed_ms': 0.0}
        try:
          pool = pool_builder(doc_id, bytes(content))
          assign, _, score = best_extraction(tree, pool)
          fields = {f: pool.etext[e] for f, e in assign.items()}
          row.update(
              out_spans=[{'kind': 'text', 'text': fields[f],
                          'media_ref': '', 'order': i}
                         for i, f in enumerate(sorted(fields))],
              fields=fields, score=float(score),
              n_entities=pool.n_entities, n_words=pool.n_words)
        except Exception as e:  # noqa: BLE001 — per-doc isolation
          row['error'] = f'{type(e).__name__}: {e}'
        row['elapsed_ms'] = (_time.monotonic() - t0) * 1000.0
        rows.append(row)
      yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA])

  return df.mapInPandas(run, OUTPUT_SCHEMA)
