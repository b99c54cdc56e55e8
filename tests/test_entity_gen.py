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


def test_line_segmentation_and_multiline_score_parity():
  """sort_word_cluster + compute_multiline_cluster_score vs the
  reference's own functions (clustering.py:82-123, 332-391).  These are
  the two SURVEY §2 rows the reference's live path never executes
  (multiline clusters disabled at build_document.py:143-144;
  sort_word_cluster serves only synthesis) — parity is asserted
  directly at the function level on randomized word clusters."""
  import random

  from bp.entity import Text, Word
  from bp.entity_gen import clustering as refc
  from bp.geometry import BBox, Interval

  from blueprint_oss_spark.engine.entity_gen import (
      compute_multiline_cluster_score, sort_word_cluster)

  rng = random.Random(991)
  for _ in range(60):
    n = rng.randrange(2, 9)
    words = []
    for i in range(n):
      x0 = rng.uniform(0, 50)
      width = rng.uniform(3, 20)
      h = rng.uniform(0.8, 1.6)
      if words and rng.random() < 0.5:
        y0 = words[rng.randrange(len(words))][3]  # share a line
      else:
        y0 = rng.uniform(0, 30)
      txt = 'x' * rng.randrange(1, 9)
      words.append((txt, x0, x0 + width, y0, y0 + h))
    ref_words = [Word(BBox(Interval(w[1], w[2]), Interval(w[3], w[4])),
                      w[0]) for w in words]
    by_id = {id(e): i for i, e in enumerate(ref_words)}

    ref_lines = [[by_id[id(e)] for e in line]
                 for line in refc.sort_word_cluster(ref_words)]
    our_lines = sort_word_cluster([w[1:] for w in words])
    assert our_lines == ref_lines, (words, our_lines, ref_lines)

    cluster = Text.from_words(tuple(ref_words))
    ref_score = refc.compute_multiline_cluster_score(cluster)
    our_score = compute_multiline_cluster_score(words)
    assert our_score == ref_score, (words, our_score, ref_score)
