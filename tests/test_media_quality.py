"""media_quality_verdicts — metadata-only media quality filtering at
the resolution step (the OBELICS / DataComp image-filter shape: drop
dead links, disallowed formats, tiny thumbnails, banner aspect
ratios — judged from the media dimension, no pixel decode).

Verified by: a hand-built rule-semantics matrix (one row per reject
reason, first-failure ordering, NULL-metadata rejection, zero-height
guard, require_found vacuous pass), active-rule column validation, a
FULL python recomputation over the gate corpus against a
deterministic dimension, and the broadcast plan pin inherited from
resolve_media_refs (the corpus side never shuffles).
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from blueprint_oss_spark.ops.multimodal import (
    media_quality_verdicts,
    resolve_media_refs,
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
    StructField('width', IntegerType()),
    StructField('height', IntegerType()),
])


def t(text, order):
  return {'kind': 'text', 'text': text, 'media_ref': None, 'order': order}


def m(ref, order):
  return {'kind': 'media', 'text': None, 'media_ref': ref, 'order': order}


RULES = dict(allowed_mime=('image/png', 'image/jpeg'), min_bytes=100,
             min_width=32, min_height=32, min_aspect=0.25,
             max_aspect=4.0)

# (ref, n_bytes, mime, width, height) -> expected (keep, reason)
MATRIX = [
    (('ok', 5000, 'image/png', 640, 480), (1, None)),
    (('ok2', 100, 'image/jpeg', 32, 128), (1, None)),  # boundaries pass
    (('badmime', 5000, 'image/gif', 640, 480), (0, 'mime')),
    (('smallbytes', 99, 'image/png', 640, 480), (0, 'bytes')),
    (('narrow', 5000, 'image/png', 31, 480), (0, 'width')),
    (('short', 5000, 'image/png', 640, 31), (0, 'height')),
    (('banner', 5000, 'image/png', 640, 100), (0, 'aspect')),  # 6.4
    (('pole', 5000, 'image/png', 100, 640), (0, 'aspect')),    # 0.15625
    (('zeroh', 5000, 'image/png', 640, 0), (0, 'height')),
    # zero height with min_height unset must hit the aspect guard, not
    # divide — covered in test_zero_height_guard below
    # NULL metadata on a RESOLVED row fails the rule that needs it
    ((
        'nullmime', 5000, None, 640, 480), (0, 'mime')),
    (('nullbytes', None, 'image/png', 640, 480), (0, 'bytes')),
    (('nullw', 5000, 'image/png', None, 480), (0, 'width')),
    # first-failure ordering: fails mime AND bytes AND width -> 'mime'
    (('multi', 1, 'image/gif', 1, 1), (0, 'mime')),
]


@pytest.fixture(scope='module')
def verdicts(spark):
  refs = [row[0][0] for row in MATRIX] + ['missing']
  content = spark.createDataFrame(
      [('d1', [t('x', 0)] + [m(r, i + 1) for i, r in enumerate(refs)])],
      SCHEMA)
  dim = spark.createDataFrame([row[0] for row in MATRIX], DIM_SCHEMA)
  out = media_quality_verdicts(content, dim, **RULES)
  return {r['media_ref']: r.asDict() for r in out.collect()}


def test_matrix_semantics(verdicts):
  for (ref, *_), (keep, reason) in MATRIX:
    r = verdicts[ref]
    assert (r['keep_media'], r['reject_reason']) == (keep, reason), ref


def test_missing_ref_rejects_first(verdicts):
  r = verdicts['missing']
  assert (r['found'], r['keep_media'], r['reject_reason']) == \
      (0, 0, 'missing')


def test_schema_is_resolve_plus_verdict(verdicts):
  r = verdicts['ok']
  assert set(r) == {'doc_id', 'sentinel_idx', 'media_ref', 'found',
                    'n_bytes', 'mime', 'width', 'height',
                    'keep_media', 'reject_reason'}


def test_require_found_false_is_vacuous_pass(spark):
  content = spark.createDataFrame([('d', [m('gone', 0)])], SCHEMA)
  dim = spark.createDataFrame(
      [('other', 1, 'image/png', 1, 1)], DIM_SCHEMA)
  r = media_quality_verdicts(
      content, dim, require_found=False, **RULES).collect()[0]
  assert (r['found'], r['keep_media'], r['reject_reason']) == (0, 1, None)


def test_zero_height_guard(spark):
  """height <= 0 fails 'aspect' (never divides) when only aspect rules
  are active — the guard, not the min_height rule, catches it."""
  content = spark.createDataFrame([('d', [m('zh', 0)])], SCHEMA)
  dim = spark.createDataFrame(
      [('zh', 5000, 'image/png', 640, 0)], DIM_SCHEMA)
  r = media_quality_verdicts(
      content, dim, min_aspect=0.25, max_aspect=4.0).collect()[0]
  assert (r['keep_media'], r['reject_reason']) == (0, 'aspect')


def test_inactive_rules_need_no_columns(spark):
  """A dim without width/height is fine when no geometric rule is on."""
  content = spark.createDataFrame([('d', [m('a', 0)])], SCHEMA)
  dim = spark.createDataFrame(
      [('a', 5000, 'image/png')],
      'media_ref string, n_bytes int, mime string')
  r = media_quality_verdicts(
      content, dim, allowed_mime=('image/png',),
      min_bytes=10).collect()[0]
  assert (r['keep_media'], r['reject_reason']) == (1, None)


def test_active_rule_missing_column_raises(spark):
  content = spark.createDataFrame([('d', [m('a', 0)])], SCHEMA)
  dim = spark.createDataFrame(
      [('a', 5000, 'image/png')],
      'media_ref string, n_bytes int, mime string')
  with pytest.raises(ValueError, match='width'):
    media_quality_verdicts(content, dim, min_width=32)
  with pytest.raises(ValueError, match='height'):
    media_quality_verdicts(content, dim, max_aspect=4.0)


def test_verdict_column_collision_raises(spark):
  content = spark.createDataFrame([('d', [m('a', 0)])], SCHEMA)
  dim = spark.createDataFrame(
      [('a', 1)], 'media_ref string, keep_media int')
  with pytest.raises(ValueError, match='keep_media'):
    media_quality_verdicts(content, dim)


def test_no_rules_keeps_resolved_rejects_missing(spark):
  content = spark.createDataFrame(
      [('d', [m('a', 0), m('b', 1)])], SCHEMA)
  dim = spark.createDataFrame(
      [('a', 1, 'x', 1, 1)], DIM_SCHEMA)
  got = {r['media_ref']: r.asDict()
         for r in media_quality_verdicts(content, dim).collect()}
  assert (got['a']['keep_media'], got['a']['reject_reason']) == (1, None)
  assert (got['b']['keep_media'], got['b']['reject_reason']) == \
      (0, 'missing')


def test_broadcast_plan_never_shuffles_corpus(spark):
  content = spark.createDataFrame([('d', [m('a', 0)])], SCHEMA)
  dim = spark.createDataFrame([('a', 1, 'x', 1, 1)], DIM_SCHEMA)
  plan = (media_quality_verdicts(content, dim, **RULES)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'hashpartitioning' not in plan
  assert 'BroadcastHashJoin' in plan


# ------------------------------------------------- gate-corpus sweep


def test_full_python_recomputation_on_gate_corpus(spark):
  """Every verdict over the gate corpus + the gate's deterministic
  dimension (even ids resolved, widths/heights formula-derived)
  recomputed in plain python from the resolve rows."""
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  content = main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()
  docs = (spark.read.parquet(f'{SF_DIR}/documents.parquet')
          .select(F.col('doc_id').cast('long').alias('did')))
  dim = (docs.where(F.pmod('did', F.lit(2)) == 0)
         .select(F.concat(F.lit('media/'), F.col('did'),
                          F.lit('/0')).alias('media_ref'),
                 (F.pmod('did', F.lit(997)) + 1).cast('int')
                 .alias('n_bytes'),
                 F.lit('image/png').alias('mime'),
                 ((F.pmod('did', F.lit(7)) + 1) * 10).cast('int')
                 .alias('width'),
                 ((F.pmod('did', F.lit(5)) + 1) * 10).cast('int')
                 .alias('height')))
  rules = dict(allowed_mime=('image/png',), min_bytes=100,
               min_width=20, max_aspect=3.0)
  base = {(r['doc_id'], r['sentinel_idx']): r.asDict()
          for r in resolve_media_refs(content, dim).collect()}
  got = {(r['doc_id'], r['sentinel_idx']): r.asDict()
         for r in media_quality_verdicts(content, dim,
                                         **rules).collect()}
  assert set(base) == set(got) and len(got) > 0
  n_kept = 0
  for k, r in got.items():
    if r['found'] == 0:
      want = 'missing'
    elif r['mime'] != 'image/png':
      want = 'mime'
    elif r['n_bytes'] < 100:
      want = 'bytes'
    elif r['width'] < 20:
      want = 'width'
    elif r['height'] <= 0 or r['width'] / r['height'] > 3.0:
      want = 'aspect'
    else:
      want = None
    assert r['reject_reason'] == want, (k, r)
    assert r['keep_media'] == int(want is None)
    n_kept += r['keep_media']
    # resolve columns pass through untouched
    assert {c: r[c] for c in base[k]} == base[k]
  # the formula dimension exercises keep and at least bytes-rejection
  assert 0 < n_kept < len(got)
  reasons = {r['reject_reason'] for r in got.values()}
  assert {'missing', 'bytes', None} <= reasons
