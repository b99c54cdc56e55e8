"""Flagship parity: the paystubs model — our DSL port vs the reference's
own examples/paystubs/paystubs.py.

Two layers:
  1. Sub-blueprint exhaustive parity: each long-tail family and template
     is exhausted in both engines (fast — small field counts) and the
     best extraction must match.
  2. Full-root comparison at the model's own production config
     (Config(num_samples=100), examples/paystubs/paystubs.py:790): our
     global best must score at least the reference's best-of-100, and
     when scores agree the extraction must be one of the reference's
     tied bests.
"""

import pytest

from blueprint_oss_spark.bp_examples.paystub_fixtures import paystub_corpus
from blueprint_oss_spark.engine.runner import run_doc, spans_to_pages
from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.solver import best_extraction

from .refshim import load_reference_example, reference_best_set

DOCS = paystub_corpus(6, seed=52)


@pytest.fixture(scope='module')
def ref_ns():
  return load_reference_example(
      '/root/reference/examples/paystubs/paystubs.py')


SUBTREES = [
    # (reference namespace symbol, our module attribute)
    'ltr_period_gross_pay',
    'ltr_period_net_pay',
    'ltr_ytd_gross_pay',
    'ltr_ytd_net_pay',
    'top_down_period_gross_pay',
    'top_down_ytd_gross_pay',
    'ltr_pay_date',
    'top_down_pay_date',
    'pay_period_date_range',
    'simple_earnings_table',
    'headed_earnings_table',
    'double_headed_period_earnings_table',
    'period_gross_pay_triple',
    'long_tail_period_gross_pay',
    'long_tail_pay_date',
    'paychex',
    'intuit',
]


@pytest.mark.parametrize('name', SUBTREES)
def test_paystub_subtree_parity(ref_ns, name):
  import blueprint_oss_spark.bp_examples.paystubs as ours_mod
  ref_root = ref_ns[name]
  our_root = getattr(ours_mod, name)
  for doc_id, spans in DOCS:
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root)
    result = run_doc(doc_id, spans, our_root)
    assert result['out_spans'] in ref_outs, (
        name, doc_id, result['fields'], ref_fields, result['score'],
        ref_score)


def test_paystub_full_root_vs_reference_production_config(ref_ns):
  from blueprint_oss_spark.bp_examples.paystubs import root as our_root
  ref_root = ref_ns['root']
  for doc_id, spans in DOCS:
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root, num_samples=100)
    pool = build_doc_pool(doc_id, spans_to_pages(spans))
    assign, _, score = best_extraction(our_root, pool)
    ours = {f: pool.etext[e] for f, e in assign.items()}
    # Our solver exhausts; the reference pumps 100 best-first samples.
    # The global best can only be >= the reference's best-of-100.
    assert score >= ref_score - 1e-9, (doc_id, ours, ref_fields)
    if abs(score - ref_score) <= 1e-9:
      from blueprint_oss_spark.engine.runner import canonical_out_spans
      assert canonical_out_spans(ours, spans) in ref_outs, (
          doc_id, ours, ref_fields)
