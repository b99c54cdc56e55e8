"""caption_image_alignment — CLIP-score-style caption↔image alignment
filtering (DataComp/LAION selection) over the north-rule caption pairs,
with the deterministic signed-feature-hashing text projection.

Verified by: a FULL python recomputation over the gate corpus (md5
buckets/signs, exact signed counts, in-order cosine, verdicts — every
cell of every row), miss/degenerate contracts (unresolved media,
empty captions, sign-cancelled zero vectors — NULL score, keep 0,
never a division), threshold semantics, repartition stability, and
the broadcast_emb plan pin.
"""

import hashlib
import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from blueprint_oss_spark.ops.multimodal import (
    caption_image_alignment,
    caption_pairs,
)
from blueprint_oss_spark.spark.pipeline import OUT_SPAN_STRUCT

SF_DIR = '/root/testdata/sf0.001'
DIM = 64

SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('out_spans', ArrayType(OUT_SPAN_STRUCT)),
])


def t(text, order):
  return {'kind': 'text', 'text': text, 'media_ref': None, 'order': order}


def m(ref, order):
  return {'kind': 'media', 'text': None, 'media_ref': ref, 'order': order}


def _bucket(w):
  return int(hashlib.md5(('cia:' + w).encode()).hexdigest()[:8],
             16) % DIM


def _sign(w):
  return 1 - 2 * (int(hashlib.md5(
      ('cias:' + w).encode()).hexdigest()[:8], 16) % 2)


def _py_score(caption_tokens, emb):
  v = [0] * DIM
  for w in caption_tokens:
    v[_bucket(w)] += _sign(w)
  if emb is None or not caption_tokens:
    return None
  dp = nv = ne = 0.0
  for a, b in zip((float(x) for x in v),
                  (float(x) for x in emb)):
    dp += a * b
  for x in v:
    nv += float(x) * float(x)
  for x in emb:
    ne += float(x) * float(x)
  if nv <= 0 or ne <= 0:
    return None
  return dp / (math.sqrt(nv) * math.sqrt(ne))


def test_full_python_recomputation(spark):
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  content = main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()
  emb = {f"media/{r['vec_id']}/0": [float(x) for x in r['embedding']]
         for r in spark.read.parquet(
             f'{SF_DIR}/embeddings.parquet').collect()}
  caps = {(r['doc_id'], r['media_order']): r.asDict()
          for r in caption_pairs(
              content, max_caption_tokens=8).collect()}
  got = {(r['doc_id'], r['media_order']): r.asDict()
         for r in caption_image_alignment(
             spark, SF_DIR, content=content).collect()}
  assert set(got) == set(caps) and len(got) > 0
  n_found = n_keep = 0
  for key, g in got.items():
    c = caps[key]
    toks = ' '.join(x for x in (c['caption_before'], c['caption_after'])
                    if x is not None).split()
    e = emb.get(g['media_ref'])
    want = _py_score(toks, e)
    assert g['n_cap_tokens'] == len(toks)
    assert g['found'] == int(e is not None)
    if want is None or e is None:
      assert g['clip_r'] is None and g['keep'] == 0, (key, g)
    else:
      assert g['clip_r'] == pytest.approx(round(want, 4), abs=1e-9), \
          (key, g, want)
      assert g['keep'] == int(round(want, 6) >= 0.2), (key, g, want)
    n_found += g['found']
    n_keep += g['keep']
  # the default embedding mapping resolves first media spans and
  # misses media/{id}/1 refs; the threshold splits the resolved set
  assert 0 < n_found < len(got)
  assert 0 < n_keep < n_found


def test_missing_and_degenerate_contracts(spark):
  content = spark.createDataFrame(
      [
          # media with a caption but no embedding row
          ('d1', [t('alpha beta', 0), m('gone', 1), t('gamma', 2)]),
          # media-only doc: caption NULL on both sides
          ('d2', [m('media/1/0', 0)]),
      ], SCHEMA)
  emb = spark.createDataFrame(
      [('media/1/0', [1.0, 2.0] + [0.0] * 62)],
      'media_ref string, embedding array<float>')
  got = {r['doc_id']: r.asDict()
         for r in caption_image_alignment(
             spark, '', content=content, media_emb=emb).collect()}
  g1 = got['d1']
  assert (g1['found'], g1['clip_r'], g1['keep']) == (0, None, 0)
  assert g1['n_cap_tokens'] == 3
  g2 = got['d2']
  assert (g2['found'], g2['n_cap_tokens'], g2['clip_r'],
          g2['keep']) == (1, 0, None, 0)


def test_sign_cancellation_zero_vector_is_null(spark):
  """Two tokens hashing to the same bucket with opposite signs cancel
  to the zero vector: NULL score, keep 0, no division."""
  pos = [w for w in (f'w{i}' for i in range(4000)) if _sign(w) == 1]
  w1 = pos[0]
  w2 = next(w for w in (f'v{i}' for i in range(40000))
            if _sign(w) == -1 and _bucket(w) == _bucket(w1))
  content = spark.createDataFrame(
      [('d', [t(f'{w1} {w2}', 0), m('media/1/0', 1)])], SCHEMA)
  emb = spark.createDataFrame(
      [('media/1/0', [1.0] * 64)],
      'media_ref string, embedding array<float>')
  r = caption_image_alignment(
      spark, '', content=content, media_emb=emb).collect()[0]
  assert (r['found'], r['n_cap_tokens'], r['clip_r'], r['keep']) == \
      (1, 2, None, 0)


def test_threshold_semantics(spark):
  """A caption whose hashed vector aligns exactly with the embedding
  scores cosine 1.0: kept at threshold 1.0, dropped above via a
  negative-sign embedding."""
  w = next(x for x in (f'w{i}' for i in range(4000)) if _sign(x) == 1)
  j = _bucket(w)
  e_pos = [0.0] * 64
  e_pos[j] = 3.0
  e_neg = [0.0] * 64
  e_neg[j] = -3.0
  content = spark.createDataFrame(
      [('a', [t(w, 0), m('p', 1)]), ('b', [t(w, 0), m('n', 1)])],
      SCHEMA)
  emb = spark.createDataFrame(
      [('p', e_pos), ('n', e_neg)],
      'media_ref string, embedding array<float>')
  got = {r['doc_id']: r.asDict()
         for r in caption_image_alignment(
             spark, '', content=content, media_emb=emb,
             threshold=1.0).collect()}
  assert (got['a']['clip_r'], got['a']['keep']) == (1.0, 1)
  assert (got['b']['clip_r'], got['b']['keep']) == (-1.0, 0)


def test_repartition_stability(spark):
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  content = main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()
  base = [tuple(r) for r in caption_image_alignment(
      spark, SF_DIR, content=content).collect()]
  again = [tuple(r) for r in caption_image_alignment(
      spark, SF_DIR, content=content.repartition(13)).collect()]
  assert base == again and len(base) > 0


def test_broadcast_emb_plan_never_shuffles_corpus(spark):
  content = spark.createDataFrame(
      [('d', [t('x y', 0), m('a', 1)])], SCHEMA)
  emb = spark.createDataFrame(
      [('a', [1.0] * 64)], 'media_ref string, embedding array<float>')
  plan = (caption_image_alignment(
      spark, '', content=content, media_emb=emb, broadcast_emb=True)
      ._jdf.queryExecution().executedPlan().toString())
  assert 'hashpartitioning' not in plan
  assert 'BroadcastHashJoin' in plan
