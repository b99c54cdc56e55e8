"""Doc JSON round-trip parity (SURVEY.md §2.A "Doc JSON load/save";
reference surface bp/document.py:188-207 + bp/instantiate.py:10-155).

Directions covered:
  1. reference dump → our load: pool bit-equal to building from spans.
  2. our save → reference load: the reference engine runs on our JSON and
     produces its native extraction.
  3. our save → our load: exact round trip.
  4. Spark source: extraction over a directory of doc JSON files equals
     the spans pipeline.
"""

import json
import math

import pytest

from blueprint_oss_spark.engine.doc_json import (
    doc_json_from_pool, pool_from_doc_json,
)
from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.runner import spans_to_pages
from blueprint_oss_spark.fixtures import (
    labelvalue_corpus, readme_blueprint, readme_corpus,
)

from .refshim import reference_doc_from_spans
from .test_entity_gen import _our_entity_rows


def _pool_rows(pool):
  return _our_entity_rows(pool)


CORPORA = [
    ('readme', readme_corpus(6, seed=521)),
    ('labelvalue', labelvalue_corpus(6, seed=531)),
]


@pytest.mark.parametrize('name,docs', CORPORA, ids=[c[0] for c in CORPORA])
def test_reference_dump_to_our_load(name, docs):
  from bp.document import dump_to_json
  for doc_id, spans in docs:
    ref_doc = reference_doc_from_spans(doc_id, spans)
    loaded = pool_from_doc_json(json.loads(dump_to_json(ref_doc)))
    built = build_doc_pool(doc_id, spans_to_pages(spans))
    assert _pool_rows(loaded) == _pool_rows(built)
    assert loaded.median_line_height == pytest.approx(
        ref_doc.median_line_height(), abs=1e-12)
    assert sorted(loaded.page_number) == sorted(built.page_number)
    assert (loaded.dx0, loaded.dx1, loaded.dy0, loaded.dy1) == \
        (built.dx0, built.dx1, built.dy0, built.dy1)


@pytest.mark.parametrize('name,docs', CORPORA, ids=[c[0] for c in CORPORA])
def test_our_save_to_reference_load(name, docs):
  from bp.document import load_doc_from_json
  for doc_id, spans in docs:
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    ref_doc = load_doc_from_json(doc_json_from_pool(pool))
    assert ref_doc.name == doc_id
    # entity pools agree with a natively-built reference document
    native = reference_doc_from_spans(doc_id, spans)
    def rows(doc):
      out = []
      for e in doc.entities:
        t = type(e).__name__
        if t == 'Page':
          continue
        out.append((t, e.entity_text,
                    round(e.bbox.ix.a, 9), round(e.bbox.ix.b, 9),
                    round(e.bbox.iy.a, 9), round(e.bbox.iy.b, 9)))
      return sorted(out)
    assert rows(ref_doc) == rows(native)
    assert ref_doc.median_line_height() == pytest.approx(
        native.median_line_height(), abs=1e-12)


def test_reference_runs_model_on_our_json():
  """End-to-end: the reference engine extracts from a document we saved
  exactly what it extracts from its natively-built document."""
  from bp.config import Config
  from bp.document import load_doc_from_json
  from bp.run import run_model
  from .refshim import ref_readme_blueprint

  docs = readme_corpus(4, seed=541)
  root = ref_readme_blueprint()
  for doc_id, spans in docs:
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    ours = load_doc_from_json(doc_json_from_pool(pool))
    native = reference_doc_from_spans(doc_id, spans)

    def best_fields(doc):
      res = run_model(doc, root, Config(num_samples=-1, timeout=-1))
      tops = res.root.top_20_extractions
      return ({p.field: (p.entity.entity_text or '')
               for p in tops[0].extraction.points()},
              tops[0].score)
    f1, s1 = best_fields(ours)
    f2, s2 = best_fields(native)
    assert f1 == f2
    assert s1 == pytest.approx(s2, abs=1e-12)


def test_exact_round_trip_ours():
  for doc_id, spans in readme_corpus(4, seed=551):
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    rt = pool_from_doc_json(doc_json_from_pool(pool))
    assert rt.name == pool.name
    # word ids are assigned in entity-traversal order on load (reading
    # order is not stored in the JSON) — compare per-entity word
    # text+geometry tuples, which is what every predicate consumes
    def ent_words(p):
      return [tuple((p.word_text[w], float(p.wx0[w]), float(p.wy0[w]))
                    for w in tup) for tup in p.ewords]
    assert ent_words(rt) == ent_words(pool)
    assert sorted(rt.word_text) == sorted(pool.word_text)
    assert rt.etype == pool.etype
    assert rt.etext == pool.etext
    assert list(rt.ex0) == list(pool.ex0)
    assert list(rt.ey1) == list(pool.ey1)
    for a, b in zip(rt.maximality, pool.maximality):
      assert (math.isnan(a) and math.isnan(b)) or a == b
    assert rt.median_line_height == pytest.approx(
        pool.median_line_height, abs=1e-12)


def test_spark_doc_json_source(spark, tmp_path):
  from blueprint_oss_spark.spark.pipeline import (
      SPANS_SCHEMA, extract_documents)
  from blueprint_oss_spark.spark.sources import extract_from_doc_json_files

  docs = readme_corpus(6, seed=561)
  for doc_id, spans in docs:
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    (tmp_path / f'{doc_id}.json').write_text(
        json.dumps(doc_json_from_pool(pool)))

  root = readme_blueprint()
  out = extract_from_doc_json_files(
      spark, str(tmp_path / '*.json'), root).collect()
  got = {r['doc_id'].removesuffix('.json'): (r['fields'], round(r['score'], 9))
         for r in out}
  assert all(r['error'] is None for r in out)

  rows = [(doc_id,
           [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
            for (k, t, m, o) in spans])
          for doc_id, spans in docs]
  df = spark.createDataFrame(rows, SPANS_SCHEMA)
  want = {r['doc_id']: (r['fields'], round(r['score'], 9))
          for r in extract_documents(df, root).collect()}
  assert got == want
