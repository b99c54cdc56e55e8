"""Synthesis parity: a labeled example produces the same rule-set as the
reference synthesizer, and the synthesized model extracts the target on
fresh same-layout documents."""

import pytest

from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.runner import run_doc, spans_to_pages
from blueprint_oss_spark.engine.synthesis import (
    SchemaEntry, synthesize_model, synthesize_pattern_node)
from blueprint_oss_spark.fixtures import labelvalue_corpus

from .refshim import reference_doc_from_spans


def _label_value_example(docs, idx):
  """Build a labeled example (field→entity) for the labelvalue corpus:
  total_label is the 'Total due' phrase, total_due the amount below."""
  doc_id, spans = docs[idx]
  pool = build_doc_pool(doc_id, spans_to_pages(spans))
  assign = {}
  for i in range(pool.n_entities):
    if pool.etype[i] == 'Text' and pool.etext[i] == 'Total due':
      assign['total_label'] = i
    if pool.etype[i] == 'Text' and pool.etext[i] == 'Issue date':
      assign['issue_label'] = i
  # the dollar amount right-aligned under 'Total due'
  lbl = assign['total_label']
  best = None
  for i in range(pool.n_entities):
    if pool.etype[i] != 'DollarAmount':
      continue
    if pool.ey0[i] > pool.ey1[lbl] - 0.5 and \
        abs(pool.ex0[i] - pool.ex0[lbl]) < 4:
      if best is None or pool.ey0[i] < pool.ey0[best]:
        best = i
  assert best is not None
  assign['total_due'] = best
  return doc_id, spans, pool, assign


SCHEMA = (SchemaEntry('total_label', 'Text', True),
          SchemaEntry('issue_label', 'Text', True),
          SchemaEntry('total_due', 'DollarAmount', False))


def test_synthesized_rules_match_reference():
  from bp.synthesis.synthesize import synthesize_pattern_node as ref_syn
  from bp.targets import Entry
  from bp.extraction import Extraction, ExtractionPoint

  docs = labelvalue_corpus(4, seed=310, with_media=False)
  doc_id, spans, pool, assign = _label_value_example(docs, 0)

  ours = synthesize_pattern_node(assign, SCHEMA, pool)

  # reference side: map our entity ids to reference entities
  ref_doc = reference_doc_from_spans(doc_id, spans)
  from .test_predicate_parity import _match_entities
  matched = dict(_match_entities(pool, ref_doc))
  ref_extraction = Extraction(tuple(
      ExtractionPoint(f, matched[e]) for f, e in sorted(assign.items())))
  ref_schema = tuple(Entry(e.field, e.type, e.is_label) for e in SCHEMA)
  ref_node = ref_syn(ref_extraction, ref_schema, ref_doc)

  def rule_sig(rules):
    out = []
    for r in rules:
      pred = getattr(r, 'predicate', None)
      name = getattr(pred, 'name', None) or type(r).__name__.lower()
      if hasattr(r, 'rules'):
        out.append((type(r).__name__.lower(), tuple(sorted(
            (getattr(x.predicate, 'name', ''), tuple(x.fields))
            for x in r.rules))))
      else:
        out.append((name, tuple(r.fields)))
    return sorted(map(repr, out))

  ours_sig = rule_sig(ours.rules)
  ref_sig = rule_sig(ref_node.rules)
  assert ours_sig == ref_sig, (ours_sig, ref_sig)


def test_synthesized_model_extracts_on_fresh_docs():
  docs = labelvalue_corpus(8, seed=310, with_media=False)
  examples = []
  for idx in (0, 1):
    _, _, pool, assign = _label_value_example(docs, idx)
    examples.append((assign, pool))
  model = synthesize_model(examples, SCHEMA)

  hits = 0
  for doc_id, spans in docs[2:]:
    r = run_doc(doc_id, spans, model)
    if r['fields'].get('total_label') == 'Total due' \
        and 'total_due' in r['fields']:
      hits += 1
  assert hits >= 4  # layouts vary slightly; most must extract
