"""AZE passport model parity on the reference's own MIDV-2020 hOCR
samples (examples/passports/aze_passports.py + hocr/*.jpg.hocr).

The reference's hOCR loader needs the uninstalled hocr_parser lib, so
both engines consume OUR stdlib hOCR parse — word-level parity between
the loaders is covered separately; here the model semantics are under
test."""

import pathlib

import pytest

from blueprint_oss_spark.bp_examples.aze_passports import root as our_root
from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.solver import best_extraction
from blueprint_oss_spark.spark.sources import parse_hocr

from .refshim import load_reference_example

SAMPLES = sorted(pathlib.Path(
    '/root/reference/examples/passports/hocr').glob('*.hocr'))


def _ref_doc_from_pages(pages, name):
  from bp.build_document import InputPage, build_document
  from bp.entity import Page
  from bp.geometry import BBox, Interval
  from bp.ocr import InputWord

  input_pages = []
  offset = 0.0
  for pg in pages:
    page = Page(BBox(Interval(0, pg['width']),
                     Interval(offset, offset + pg['height'])),
                pg['page_number'])
    words = tuple(
        InputWord(BBox(Interval(x0, x1), Interval(y0, y1)), t, None,
                  None, None)
        for (t, x0, x1, y0, y1) in pg['words'])
    input_pages.append(InputPage(page, words))
    offset += pg['height']
  return build_document(tuple(input_pages), name)


def test_aze_extraction_matches_reference():
  from bp.config import Config
  from bp.run import run_model

  ns = load_reference_example(
      '/root/reference/examples/passports/aze_passports.py')
  ref_root = ns['aze']

  assert SAMPLES, 'passport hOCR samples missing'
  nonempty = 0
  for path in SAMPLES:
    pages = parse_hocr(path.read_text(errors='ignore'))
    ref_doc = _ref_doc_from_pages(pages, path.stem)
    # the model's own CLI config is num_samples=100
    res = run_model(ref_doc, ref_root, Config(num_samples=100,
                                              timeout=-1))
    tops = res.root.top_20_extractions
    best_score = tops[0].score
    ref_best_fields = []
    for se in tops:
      if se.score != best_score:
        break
      ref_best_fields.append(
          {p.field: (p.entity.entity_text or '')
           for p in se.extraction.points()})

    pool = build_doc_pool(path.stem, pages)
    assign, _, score = best_extraction(our_root, pool)
    ours = {f: pool.etext[e] for f, e in assign.items()}
    assert score >= best_score - 1e-9, (path.stem, ours,
                                        ref_best_fields[0])
    if abs(score - best_score) <= 1e-9 and len(ref_best_fields) == 1:
      assert ours == ref_best_fields[0], (path.stem, ours,
                                          ref_best_fields[0])
    if ours:
      nonempty += 1
  assert nonempty > 0, 'model extracted nothing from any sample'
