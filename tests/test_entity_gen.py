"""Stage-B parity: entity pools vs the reference build_document
(FIXTURES.md §3 — intermediate-stage oracle)."""

import math

import pytest

from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.runner import spans_to_pages
from blueprint_oss_spark.fixtures import (
    adversarial_corpus, labelvalue_corpus, multipage_corpus, readme_corpus,
    table_corpus,
)

from .refshim import reference_doc_from_spans


def _ref_entity_rows(doc):
  rows = []
  for e in doc.entities:
    t = type(e).__name__
    if t == 'Page':
      continue
    ms = getattr(e, 'maximality_score', None)
    ls = getattr(e, 'likeness_score', None)
    rows.append((
        t, e.entity_text,
        round(e.bbox.ix.a, 9), round(e.bbox.ix.b, 9),
        round(e.bbox.iy.a, 9), round(e.bbox.iy.b, 9),
        round(ms if ms is not None else -1.0, 9) if t == 'Text' else -1.0,
        round(ls if ls is not None else -1.0, 9)
        if t in ('Date', 'DollarAmount') else -1.0,
    ))
  return sorted(rows)


def _our_entity_rows(pool):
  rows = []
  for i in range(pool.n_entities):
    t = pool.etype[i]
    m = pool.maximality[i]
    lik = pool.likeness[i]
    rows.append((
        t, pool.etext[i],
        round(float(pool.ex0[i]), 9), round(float(pool.ex1[i]), 9),
        round(float(pool.ey0[i]), 9), round(float(pool.ey1[i]), 9),
        round(m if not math.isnan(m) else -1.0, 9)
        if t == 'Text' else -1.0,
        round(lik if not math.isnan(lik) else -1.0, 9)
        if t in ('Date', 'DollarAmount') else -1.0,
    ))
  return sorted(rows)


CORPORA = [
    ('readme', readme_corpus(8, seed=421)),
    ('labelvalue', labelvalue_corpus(8, seed=431)),
    ('table', table_corpus(5, seed=441)),
    ('multipage', multipage_corpus(5, seed=451)),
    ('adversarial', adversarial_corpus(5, seed=461)),
]


@pytest.mark.parametrize('name,docs', CORPORA, ids=[c[0] for c in CORPORA])
def test_entity_pool_parity(name, docs):
  for doc_id, spans in docs:
    ref_doc = reference_doc_from_spans(doc_id, spans)
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    ref_rows = _ref_entity_rows(ref_doc)
    our_rows = _our_entity_rows(pool)
    assert our_rows == ref_rows, (
        f'{doc_id}: entity pool mismatch\n'
        f'ours-only: {[r for r in our_rows if r not in ref_rows][:5]}\n'
        f'ref-only:  {[r for r in ref_rows if r not in our_rows][:5]}')
    # median line height — the global spatial unit
    assert pool.median_line_height == pytest.approx(
        ref_doc.median_line_height(), abs=1e-12)
