"""Flagship parity: the full paystubs model (5 vendor templates +
long-tail + business-logic rules) — our DSL port vs the reference's own
examples/paystubs/paystubs.py, both run to exhaustion."""

import pytest

from blueprint_oss_spark.bp_examples.paystub_fixtures import paystub_corpus
from blueprint_oss_spark.engine.runner import run_doc

from .refshim import load_reference_example, reference_best_set


@pytest.fixture(scope='module')
def ref_root():
  ns = load_reference_example(
      '/root/reference/examples/paystubs/paystubs.py')
  return ns['root']


def test_paystubs_best_extraction_parity(ref_root):
  from blueprint_oss_spark.bp_examples.paystubs import root as our_root
  docs = paystub_corpus(9, seed=52)
  mismatches = []
  for doc_id, spans in docs:
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root)
    result = run_doc(doc_id, spans, our_root)
    if result['out_spans'] not in ref_outs:
      mismatches.append((doc_id, result['fields'], ref_fields,
                         result['score'], ref_score))
  assert not mismatches, (
      f'{len(mismatches)}/{len(docs)} docs mismatched; first: '
      f'{mismatches[0]}')
