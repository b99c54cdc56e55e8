"""span_token_offsets / resolve_media_refs — the span->token alignment
table and the loader-side media-dimension join over the north-rule
main-content output.

Verified by: hand-built semantics matrices (empty spans, out-of-order
arrays, media-only docs), the render-consistency invariant
(sum(n_tokens) per doc == render_interleaved.n_render_tokens and
media-span token_starts land exactly on sentinel positions), a FULL
python recomputation over the gate corpus, zero-shuffle plan pins
(no hashpartitioning Exchange on the corpus side of the broadcast
join), and missing-ref accounting.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from blueprint_oss_spark.ops.multimodal import (
    render_interleaved,
    resolve_media_refs,
    span_token_offsets,
)
from blueprint_oss_spark.spark.pipeline import OUT_SPAN_STRUCT

SF_DIR = '/root/testdata/sf0.001'

SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('out_spans', ArrayType(OUT_SPAN_STRUCT)),
])

DIM_SCHEMA = StructType([
    StructField('media_ref', StringType()),
    StructField('n_bytes', IntegerType()),
    StructField('mime', StringType()),
])


def t(text, order):
  return {'kind': 'text', 'text': text, 'media_ref': None, 'order': order}


def m(ref, order):
  return {'kind': 'media', 'text': None, 'media_ref': ref, 'order': order}


@pytest.fixture(scope='module')
def offsets(spark):
  rows = [
      ('d1', [t('alpha beta', 0), m('m/1/0', 1), t('gamma', 2)]),
      # empty text spans occupy zero tokens but still get a row
      ('d2', [t('', 0), m('m/2/0', 1), t('  ', 2), t('x y', 3)]),
      # out-of-order array: offsets follow `order`, not array position
      ('d3', [t('two three', 2), m('m/3/0', 1), t('one', 0)]),
      ('d4', []),
  ]
  df = spark.createDataFrame(rows, SCHEMA)
  out = span_token_offsets(df)
  return {(r['doc_id'], r['span_order']): r.asDict()
          for r in out.collect()}


def test_offsets_basic_prefix_sum(offsets):
  assert (offsets[('d1', 0)]['token_start'],
          offsets[('d1', 0)]['n_tokens']) == (0, 2)
  assert (offsets[('d1', 1)]['token_start'],
          offsets[('d1', 1)]['n_tokens']) == (2, 1)
  assert (offsets[('d1', 2)]['token_start'],
          offsets[('d1', 2)]['n_tokens']) == (3, 1)


def test_offsets_empty_spans_are_zero_width(offsets):
  assert (offsets[('d2', 0)]['token_start'],
          offsets[('d2', 0)]['n_tokens']) == (0, 0)
  assert (offsets[('d2', 1)]['token_start'],
          offsets[('d2', 1)]['n_tokens']) == (0, 1)
  assert (offsets[('d2', 2)]['n_tokens']) == 0
  assert (offsets[('d2', 3)]['token_start'],
          offsets[('d2', 3)]['n_tokens']) == (1, 2)


def test_offsets_respect_span_order(offsets):
  assert (offsets[('d3', 0)]['token_start'],
          offsets[('d3', 0)]['n_tokens']) == (0, 1)
  assert (offsets[('d3', 1)]['token_start'],
          offsets[('d3', 1)]['n_tokens']) == (1, 1)
  assert (offsets[('d3', 2)]['token_start'],
          offsets[('d3', 2)]['n_tokens']) == (2, 2)


def test_offsets_empty_doc_has_no_rows(offsets):
  assert not any(k[0] == 'd4' for k in offsets)


def test_offsets_plan_has_no_shuffle(spark):
  df = spark.createDataFrame([('d', [m('m/0', 0)])], SCHEMA)
  plan = (span_token_offsets(df)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'Exchange' not in plan


@pytest.fixture(scope='module')
def gate_content(spark):
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  return main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()


def test_offsets_full_python_recomputation(gate_content):
  docs = {r['doc_id']: sorted((s.asDict() for s in r['out_spans']),
                              key=lambda s: s['order'])
          for r in gate_content.collect()}
  got = {}
  for r in span_token_offsets(gate_content).collect():
    got.setdefault(r['doc_id'], []).append(r.asDict())
  for doc_id, spans in docs.items():
    rows = sorted(got[doc_id], key=lambda r: r['span_order'])
    off = 0
    assert len(rows) == len(spans)
    for s, r in zip(spans, rows):
      if s['kind'] == 'media':
        n = 1
      elif s['text'] and s['text'].strip():
        n = len(s['text'].strip().split())
      else:
        n = 0
      assert (r['token_start'], r['n_tokens']) == (off, n)
      assert (r['kind'], r['media_ref']) == (s['kind'], s['media_ref'])
      off += n


def test_offsets_agree_with_render(gate_content):
  """The two views of the same token sequence must agree: per-doc
  token totals, and every media span's token_start must be a sentinel
  position in the rendered text."""
  rend = {r['doc_id']: r.asDict()
          for r in render_interleaved(gate_content).collect()}
  per_doc = {}
  for r in span_token_offsets(gate_content).collect():
    per_doc.setdefault(r['doc_id'], []).append(r.asDict())
  for doc_id, rows in per_doc.items():
    toks = rend[doc_id]['rendered_text'].split()
    assert sum(r['n_tokens'] for r in rows) == len(toks)
    for r in rows:
      if r['kind'] == 'media':
        assert toks[r['token_start']] == '<|image|>'


# --------------------------------------------------------- resolution


@pytest.fixture(scope='module')
def resolved(spark):
  rows = [
      ('d1', [t('x', 0), m('a', 1), m('missing', 2), m('b', 3)]),
      # out-of-order: sentinel_idx follows `order`
      ('d2', [m('b', 4), m('a', 0), t('mid', 2)]),
      ('d3', [t('no media', 0)]),
  ]
  dim = [('a', 11, 'image/png'), ('b', 22, 'audio/wav'),
         ('unused', 33, 'video/raw')]
  content = spark.createDataFrame(rows, SCHEMA)
  out = resolve_media_refs(
      content, spark.createDataFrame(dim, DIM_SCHEMA))
  return {(r['doc_id'], r['sentinel_idx']): r.asDict()
          for r in out.collect()}


def test_resolve_manifest_order_and_payload(resolved):
  assert resolved[('d1', 0)]['media_ref'] == 'a'
  assert resolved[('d1', 0)]['found'] == 1
  assert resolved[('d1', 0)]['n_bytes'] == 11
  assert resolved[('d1', 2)]['mime'] == 'audio/wav'


def test_resolve_missing_ref_is_explicit(resolved):
  r = resolved[('d1', 1)]
  assert r['media_ref'] == 'missing'
  assert r['found'] == 0
  assert r['n_bytes'] is None and r['mime'] is None


def test_resolve_sentinel_idx_follows_order(resolved):
  assert resolved[('d2', 0)]['media_ref'] == 'a'
  assert resolved[('d2', 1)]['media_ref'] == 'b'


def test_resolve_docs_without_media_emit_nothing(resolved):
  assert not any(k[0] == 'd3' for k in resolved)


def test_resolve_broadcast_plan_never_shuffles_corpus(spark):
  content = spark.createDataFrame([('d', [m('a', 0)])], SCHEMA)
  dim = spark.createDataFrame([('a', 1, 'x')], DIM_SCHEMA)
  plan = (resolve_media_refs(content, dim)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'hashpartitioning' not in plan
  assert 'BroadcastHashJoin' in plan


def test_resolve_matches_render_manifest(gate_content, spark):
  """sentinel_idx is exactly the media_manifest array index."""
  dim = spark.createDataFrame(
      [(f'media/{i}/0', i, 'image/png') for i in range(0, 500, 7)],
      DIM_SCHEMA)
  rend = {r['doc_id']: r['media_manifest']
          for r in render_interleaved(gate_content).collect()}
  dim_refs = {row[0] for row in dim.collect()}
  for r in resolve_media_refs(gate_content, dim).collect():
    manifest = rend[r['doc_id']]
    assert manifest[r['sentinel_idx']] == r['media_ref']
    assert r['found'] == int(r['media_ref'] in dim_refs)


def test_resolve_sum_matches_sentinel_count(gate_content, spark):
  dim = spark.createDataFrame([('none', 0, 'x')], DIM_SCHEMA)
  n_rows = resolve_media_refs(gate_content, dim).count()
  n_sent = (render_interleaved(gate_content)
            .agg(F.sum('n_sentinels')).collect()[0][0])
  assert n_rows == n_sent
