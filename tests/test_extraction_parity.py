"""End-to-end parity: best extraction per doc vs the reference engine run
to exhaustion (Config(num_samples=-1)), compared under span-sequence
equality (kind, text, media_ref, order) — the driver BASELINE.json
invariant."""

import pytest

from blueprint_oss_spark.engine.runner import run_doc
from blueprint_oss_spark.fixtures import ALL_CORPORA

from .refshim import REF_BLUEPRINTS, reference_best_set

SIZES = {'readme': 12, 'labelvalue': 12, 'table': 8, 'multipage': 8,
         'adversarial': 8}


@pytest.mark.parametrize('name', sorted(ALL_CORPORA))
def test_best_extraction_matches_reference(name):
  corpus_fn, bp_fn = ALL_CORPORA[name]
  docs = corpus_fn(SIZES[name])
  ours_root = bp_fn()
  ref_root = REF_BLUEPRINTS[name]()
  mismatches = []
  for doc_id, spans in docs:
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root)
    result = run_doc(doc_id, spans, ours_root)
    if result['out_spans'] not in ref_outs:
      mismatches.append((doc_id, result['fields'], ref_fields,
                         result['score'], ref_score))
  assert not mismatches, (
      f'{len(mismatches)}/{len(docs)} docs mismatched; first: '
      f'{mismatches[0]}')
