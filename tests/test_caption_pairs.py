"""caption_pairs — media↔adjacent-text training-pair mining over the
north-rule main-content output (the M3W/MMC4 pair-extraction shape).

Verified by: a full semantics matrix on hand-built span frames (head /
tail / consecutive-media / empty-span / out-of-order cases), exact-K
truncation, a FULL python recomputation over the gate corpus driven by
the same main_content_doc kernel the pipeline runs, a zero-Exchange
plan pin, and partitioning-determinism.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from blueprint_oss_spark.ops.multimodal import caption_pairs
from blueprint_oss_spark.spark.pipeline import OUT_SPAN_STRUCT

SF_DIR = '/root/testdata/sf0.001'

SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('out_spans', ArrayType(OUT_SPAN_STRUCT)),
])


def t(text, order):
  return {'kind': 'text', 'text': text, 'media_ref': None, 'order': order}


def m(ref, order):
  return {'kind': 'media', 'text': None, 'media_ref': ref, 'order': order}


@pytest.fixture(scope='module')
def matrix(spark):
  rows = [
      ('d1', [t('alpha beta gamma delta', 0), m('m/1/0', 1),
              t('epsilon zeta', 2)]),
      ('d2', [m('m/2/0', 0), t('head only after', 1)]),
      ('d3', [t('only before text', 0), m('m/3/0', 1)]),
      ('d4', [t('x', 0), m('m/4/0', 1), m('m/4/1', 2),
              t('shared after', 3)]),
      ('d5', [t('', 0), m('m/5/0', 1), t('   ', 2),
              t('real text here', 3)]),
      ('d6', [m('m/6/0', 0)]),
      # out-of-order input: operator must sort by `order`, so the
      # media span (order 1) precedes the text span (order 2)
      ('d7', [t('one two three four five six', 2), m('m/7/0', 1)]),
  ]
  df = spark.createDataFrame(rows, SCHEMA)
  out = caption_pairs(df, max_caption_tokens=3)
  return {(r['doc_id'], r['media_ref']): r.asDict()
          for r in out.collect()}


def test_nearest_before_and_after(matrix):
  r = matrix[('d1', 'm/1/0')]
  assert r['caption_before'] == 'beta gamma delta'   # last 3 of 4 tokens
  assert r['n_before_tokens'] == 3
  assert r['before_order'] == 0
  assert r['caption_after'] == 'epsilon zeta'
  assert r['n_after_tokens'] == 2
  assert r['after_order'] == 2


def test_head_media_has_null_before(matrix):
  r = matrix[('d2', 'm/2/0')]
  assert r['caption_before'] is None
  assert r['n_before_tokens'] is None
  assert r['before_order'] is None
  assert r['caption_after'] == 'head only after'


def test_tail_media_has_null_after(matrix):
  r = matrix[('d3', 'm/3/0')]
  assert r['caption_before'] == 'only before text'
  assert r['caption_after'] is None
  assert r['after_order'] is None


def test_consecutive_media_share_neighbors(matrix):
  a, b = matrix[('d4', 'm/4/0')], matrix[('d4', 'm/4/1')]
  for r in (a, b):
    assert r['caption_before'] == 'x'
    assert r['n_before_tokens'] == 1
    assert r['caption_after'] == 'shared after'


def test_empty_and_whitespace_spans_are_not_captions(matrix):
  # d5: the empty span at order 0 and the whitespace span at order 2
  # are skipped; the nearest AFTER non-empty text is order 3
  r = matrix[('d5', 'm/5/0')]
  assert r['caption_before'] is None
  assert r['caption_after'] == 'real text here'
  assert r['after_order'] == 3


def test_media_only_doc_keeps_row_with_nulls(matrix):
  r = matrix[('d6', 'm/6/0')]
  assert r['caption_before'] is None and r['caption_after'] is None


def test_input_span_order_is_respected_not_array_position(matrix):
  r = matrix[('d7', 'm/7/0')]
  assert r['caption_before'] is None
  assert r['caption_after'] == 'one two three'   # first 3 of 6
  assert r['n_after_tokens'] == 3


def test_truncation_is_exactly_k(spark):
  words = ' '.join(f'w{i}' for i in range(10))
  df = spark.createDataFrame(
      [('d', [t(words, 0), m('m/0', 1), t(words, 2)])], SCHEMA)
  r = caption_pairs(df, max_caption_tokens=4).collect()[0]
  assert r['caption_before'] == 'w6 w7 w8 w9'     # LAST 4
  assert r['caption_after'] == 'w0 w1 w2 w3'      # FIRST 4
  assert r['n_before_tokens'] == r['n_after_tokens'] == 4


def test_k_must_be_positive():
  with pytest.raises(ValueError):
    caption_pairs(None, max_caption_tokens=0)


def test_plan_has_no_shuffle(spark):
  df = spark.createDataFrame([('d', [m('m/0', 0)])], SCHEMA)
  plan = (caption_pairs(df)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'Exchange' not in plan


@pytest.fixture(scope='module')
def gate_content(spark):
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  return main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()


def test_full_python_recomputation_on_gate_corpus(spark, gate_content):
  """Every (doc, media) caption recomputed sequentially in python from
  the SAME main-content span sequences the operator consumes."""
  k = 8
  got = {(r['doc_id'], r['media_ref']): r.asDict()
         for r in caption_pairs(gate_content,
                                max_caption_tokens=k).collect()}
  n_checked = 0
  for row in gate_content.collect():
    spans = sorted((s.asDict() for s in row['out_spans']),
                   key=lambda s: s['order'])
    texts = [s for s in spans
             if s['kind'] == 'text' and s['text'] and s['text'].strip()]
    for s in spans:
      if s['kind'] != 'media':
        continue
      before = [x for x in texts if x['order'] < s['order']]
      after = [x for x in texts if x['order'] > s['order']]
      exp_b = ' '.join(before[-1]['text'].split()[-k:]) if before else None
      exp_a = ' '.join(after[0]['text'].split()[:k]) if after else None
      r = got.pop((row['doc_id'], s['media_ref']))
      assert r['caption_before'] == exp_b, (row['doc_id'], s)
      assert r['caption_after'] == exp_a, (row['doc_id'], s)
      assert r['media_order'] == s['order']
      n_checked += 1
  assert not got            # no extra rows
  assert n_checked >= 100   # the gate corpus has media spans in bulk


def test_deterministic_under_repartitioning(spark, gate_content):
  a = caption_pairs(gate_content).orderBy('doc_id', 'media_order')
  b = caption_pairs(gate_content.repartition(13)) \
      .orderBy('doc_id', 'media_order')
  assert [r.asDict() for r in a.collect()] == \
         [r.asDict() for r in b.collect()]
