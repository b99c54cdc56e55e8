"""Model JSON interop: models saved by the reference load into our specs
and score identically; our saved models load in the reference."""

import json

import pytest

from blueprint_oss_spark.engine.runner import run_doc
from blueprint_oss_spark.model.json_io import (
    dump_model, load_model_from_json)

from .refshim import reference_best_set


def _ref_model():
  from bp.tree import extract
  from bp.rules.label import is_top_down_label_value_pair
  from bp.rules.semantic import is_date
  from bp.rules.spatial import BottomAligned
  from bp.rules.textual import text_equals
  return extract(
      text_equals('Issue date')('lbl'),
      is_date('d'),
      is_top_down_label_value_pair('lbl', 'd'))


def test_reference_saved_model_loads_and_matches(tmp_path):
  # The label composite uses AllHold which is NOT in the reference's
  # closed model-JSON registry, so build a registry-only model instead.
  from bp.tree import extract as ref_extract
  from bp.rules.semantic import is_dollar_amount as ref_is_dollar
  from bp.rules.spatial import BottomAligned, RightAligned
  from bp.rules.textual import text_equals as ref_text_equals
  import bp.model as ref_model_mod

  ref_root = ref_extract(
      ref_text_equals('Neil Patel')('patel_label'),
      ref_is_dollar('patel_revenue'),
      BottomAligned()('patel_label', 'patel_revenue'),
      ref_text_equals('Annual $')('annual_revenue_label'),
      RightAligned()('annual_revenue_label', 'patel_revenue'))
  path = tmp_path / 'model.json'
  ref_model_mod.save_model(ref_root, path)

  ours = load_model_from_json(json.loads(path.read_text()))

  from blueprint_oss_spark.fixtures import readme_corpus
  for doc_id, spans in readme_corpus(6, seed=99):
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root)
    result = run_doc(doc_id, spans, ours)
    assert result['out_spans'] in ref_outs, (doc_id, result['fields'],
                                             ref_fields)


def test_our_saved_model_loads_in_reference(tmp_path):
  from blueprint_oss_spark.model.nodes import extract
  from blueprint_oss_spark.model.rules import (
      bottom_aligned, is_dollar_amount, right_aligned, text_equals)
  ours = extract(
      text_equals('Neil Patel')('patel_label'),
      is_dollar_amount('patel_revenue'),
      bottom_aligned('patel_label', 'patel_revenue'),
      text_equals('Annual $')('annual_revenue_label'),
      right_aligned('annual_revenue_label', 'patel_revenue'))
  blob = dump_model(ours)

  import bp.model as ref_model_mod
  ref_root = ref_model_mod.load_model_from_json(blob)

  from blueprint_oss_spark.fixtures import readme_corpus
  for doc_id, spans in readme_corpus(6, seed=101):
    ref_fields, ref_score, ref_outs = reference_best_set(
        doc_id, spans, ref_root)
    result = run_doc(doc_id, spans, ours)
    assert result['out_spans'] in ref_outs, (doc_id, result['fields'],
                                             ref_fields)
