"""interleaved_doc_stats / render_interleaved / dedup_media_spans —
the document-level composition gate, the training-text renderer, and
the corpus-level boilerplate-media removal over the north-rule
main-content output (OBELICS/MMC4 post-extraction passes).

Verified by: hand-built semantics matrices (lead/trail media, media
runs, empty spans, out-of-order spans, within-doc duplicate refs,
threshold boundaries), FULL python recomputations over the gate
corpus (the planted-asset frame the gate row uses), zero-Exchange
plan pins for the two scan-shaped ops, and repartition-determinism
for the join-shaped one.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from blueprint_oss_spark.ops.multimodal import (
    dedup_media_spans,
    interleaved_doc_stats,
    render_interleaved,
)
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


# ---------------------------------------------------------------- stats


@pytest.fixture(scope='module')
def stats_matrix(spark):
  rows = [
      # plain interleave: 2 text, 1 media, run 1
      ('d1', [t('alpha beta gamma', 0), m('m/1/0', 1), t('delta', 2)]),
      # leading media + trailing media + a 3-run in the middle
      ('d2', [m('m/2/0', 0), t('one two', 1), m('m/2/1', 2),
              m('m/2/2', 3), m('m/2/3', 4), t('three', 5),
              m('m/2/4', 6)]),
      # empty/whitespace text spans count in n_text but not n_tokens
      ('d3', [t('', 0), m('m/3/0', 1), t('   ', 2), t('x y z', 3)]),
      # out-of-order array: the run must be computed on `order`, where
      # the two media spans are adjacent (orders 1,2)
      ('d4', [m('m/4/0', 2), t('tail', 3), m('m/4/1', 1), t('head', 0)]),
      # media-only doc
      ('d5', [m('m/5/0', 0), m('m/5/1', 1)]),
      # empty doc
      ('d6', []),
  ]
  df = spark.createDataFrame(rows, SCHEMA)
  out = interleaved_doc_stats(df, min_images=1, max_images=3,
                              min_text_tokens=2, max_media_run=2)
  return {r['doc_id']: r.asDict() for r in out.collect()}


def test_stats_plain_interleave(stats_matrix):
  r = stats_matrix['d1']
  assert (r['n_spans'], r['n_text'], r['n_media']) == (3, 2, 1)
  assert r['n_tokens'] == 4
  assert r['media_run'] == 1
  assert (r['lead_media'], r['trail_media']) == (0, 0)
  assert r['keep'] == 1


def test_stats_runs_and_edges(stats_matrix):
  r = stats_matrix['d2']
  assert r['n_media'] == 5
  assert r['media_run'] == 3
  assert (r['lead_media'], r['trail_media']) == (1, 1)
  assert r['keep'] == 0          # n_media > max AND run > max


def test_stats_empty_text_spans(stats_matrix):
  r = stats_matrix['d3']
  assert r['n_text'] == 3        # empty spans still count as spans
  assert r['n_tokens'] == 3      # only 'x y z' contributes
  assert r['keep'] == 1


def test_stats_respects_span_order_not_array_position(stats_matrix):
  r = stats_matrix['d4']
  assert r['media_run'] == 2     # orders 1,2 are adjacent media
  assert (r['lead_media'], r['trail_media']) == (0, 0)
  # n_media=2 <= 3, n_tokens=2 >= 2, run=2 <= 2 -> keep
  assert r['keep'] == 1


def test_stats_media_only_and_empty_docs(stats_matrix):
  r5 = stats_matrix['d5']
  assert (r5['n_text'], r5['n_tokens'], r5['media_run']) == (0, 0, 2)
  assert (r5['lead_media'], r5['trail_media']) == (1, 1)
  assert r5['keep'] == 0         # n_tokens < min_text_tokens
  r6 = stats_matrix['d6']
  assert (r6['n_spans'], r6['n_media'], r6['media_run']) == (0, 0, 0)
  assert (r6['lead_media'], r6['trail_media']) == (0, 0)
  assert r6['keep'] == 0         # n_media < min_images


def test_stats_validates_thresholds():
  with pytest.raises(ValueError):
    interleaved_doc_stats(None, min_images=3, max_images=2)
  with pytest.raises(ValueError):
    interleaved_doc_stats(None, min_images=-1)


def test_stats_plan_has_no_shuffle(spark):
  df = spark.createDataFrame([('d', [m('m/0', 0)])], SCHEMA)
  plan = (interleaved_doc_stats(df)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'Exchange' not in plan


# --------------------------------------------------------------- render


@pytest.fixture(scope='module')
def render_matrix(spark):
  rows = [
      ('d1', [t('alpha beta', 0), m('m/1/0', 1), t('gamma', 2)]),
      # empty/whitespace text spans are dropped from the rendering
      ('d2', [t('', 0), m('m/2/0', 1), t('  ', 2), t('real', 3)]),
      # out-of-order array renders in `order` order
      ('d3', [t('two', 2), m('m/3/1', 3), m('m/3/0', 1), t('one', 0)]),
      # media-only and empty docs
      ('d4', [m('m/4/0', 0)]),
      ('d5', []),
      # text with internal multi-space: tokens counted on \s+
      ('d6', [t('a  b\tc', 0)]),
  ]
  df = spark.createDataFrame(rows, SCHEMA)
  out = render_interleaved(df, media_token='<|image|>')
  return {r['doc_id']: r.asDict() for r in out.collect()}


def test_render_sentinel_placement(render_matrix):
  r = render_matrix['d1']
  assert r['rendered_text'] == 'alpha beta <|image|> gamma'
  assert r['media_manifest'] == ['m/1/0']
  assert r['n_sentinels'] == 1
  assert r['n_render_tokens'] == 4


def test_render_drops_empty_text_spans(render_matrix):
  r = render_matrix['d2']
  assert r['rendered_text'] == '<|image|> real'
  assert r['n_render_tokens'] == 2


def test_render_respects_span_order(render_matrix):
  r = render_matrix['d3']
  assert r['rendered_text'] == 'one <|image|> two <|image|>'
  assert r['media_manifest'] == ['m/3/0', 'm/3/1']


def test_render_media_only_and_empty(render_matrix):
  assert render_matrix['d4']['rendered_text'] == '<|image|>'
  assert render_matrix['d4']['n_render_tokens'] == 1
  assert render_matrix['d5']['rendered_text'] == ''
  assert render_matrix['d5']['n_render_tokens'] == 0
  assert render_matrix['d5']['media_manifest'] == []


def test_render_token_count_on_whitespace_runs(render_matrix):
  assert render_matrix['d6']['n_render_tokens'] == 3


def test_render_validates_media_token():
  with pytest.raises(ValueError):
    render_interleaved(None, media_token='')
  with pytest.raises(ValueError):
    render_interleaved(None, media_token='<img >')


def test_render_plan_has_no_shuffle(spark):
  df = spark.createDataFrame([('d', [m('m/0', 0)])], SCHEMA)
  plan = (render_interleaved(df)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'Exchange' not in plan


# ----------------------------------------------------------- media dedup


@pytest.fixture(scope='module')
def dedup_out(spark):
  # hot ref on 3 docs, boundary ref on exactly 2 (== max_media_df,
  # kept), unique refs kept; d1 carries the hot ref TWICE (both
  # occurrences removed and counted)
  rows = [
      ('d1', [m('logo', 0), t('keep me', 1), m('logo', 2),
              m('u/1', 3)]),
      ('d2', [m('logo', 0), m('pair', 1), t('text', 2)]),
      ('d3', [m('logo', 0), m('pair', 1), m('u/3', 2)]),
      ('d4', [t('no media', 0)]),
  ]
  df = spark.createDataFrame(rows, SCHEMA)
  out = dedup_media_spans(df, max_media_df=2)
  return {r['doc_id']: r.asDict() for r in out.collect()}


def test_dedup_removes_hot_ref_everywhere(dedup_out):
  for doc in ('d1', 'd2', 'd3'):
    refs = [s['media_ref'] for s in dedup_out[doc]['out_spans']
            if s['kind'] == 'media']
    assert 'logo' not in refs


def test_dedup_boundary_df_equal_to_cap_is_kept(dedup_out):
  for doc in ('d2', 'd3'):
    refs = [s['media_ref'] for s in dedup_out[doc]['out_spans']
            if s['kind'] == 'media']
    assert 'pair' in refs        # df == max_media_df -> kept


def test_dedup_counts_within_doc_occurrences(dedup_out):
  assert dedup_out['d1']['n_media_removed'] == 2
  assert dedup_out['d2']['n_media_removed'] == 1
  assert dedup_out['d4']['n_media_removed'] == 0


def test_dedup_preserves_text_and_order(dedup_out):
  spans = dedup_out['d1']['out_spans']
  assert [(s['kind'], s['order']) for s in spans] == [
      ('text', 1), ('media', 3)]
  assert spans[0]['text'] == 'keep me'


def test_dedup_null_media_ref_survives_hot_set(spark):
  """array_contains against a non-empty hot array returns NULL for a
  NULL media_ref; an unguarded predicate silently dropped such spans
  (uncounted) whenever the corpus had ANY hot asset."""
  rows = [(f'd{i}', [m(None, 0), t('text', 1), m('hot', 2)])
          for i in range(4)]
  out = {r['doc_id']: r.asDict()
         for r in dedup_media_spans(
             spark.createDataFrame(rows, SCHEMA),
             max_media_df=2).collect()}
  for doc_id, r in out.items():
    kinds = [(s['kind'], s['media_ref']) for s in r['out_spans']]
    assert ('media', None) in kinds        # NULL-ref span kept
    assert ('media', 'hot') not in kinds   # hot span removed
    assert r['n_media_removed'] == 1


def test_dedup_validates_cap():
  with pytest.raises(ValueError):
    dedup_media_spans(None, max_media_df=0)


def test_dedup_deterministic_under_repartition(spark):
  rows = [(f'd{i}',
           [m('hot', 0), m(f'u/{i}', 1), t(f'text {i}', 2)])
          for i in range(40)]
  df = spark.createDataFrame(rows, SCHEMA)
  a = dedup_media_spans(df, max_media_df=5).collect()
  b = dedup_media_spans(df.repartition(13), max_media_df=5).collect()
  key = lambda r: r['doc_id']
  assert sorted([r.asDict() for r in a], key=key) == \
      sorted([r.asDict() for r in b], key=key)


# ------------------------------------------- gate-corpus recomputation


@pytest.fixture(scope='module')
def planted(spark):
  """The exact planted-asset frame the gate row uses — built by the
  gate's own _plant_site_assets so the python recomputations here can
  never drift from what the oracle verifies."""
  from __spark_entry__ import _plant_site_assets
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  out = main_content_from_spans(
      interleaved_html_table(spark, SF_DIR)).localCheckpoint()
  return _plant_site_assets(out)


def _py_docs(planted):
  return {r['doc_id']: sorted(
      (s.asDict() for s in r['out_spans']), key=lambda s: s['order'])
      for r in planted.collect()}


def test_stats_full_python_recomputation(planted):
  docs = _py_docs(planted)
  got = {r['doc_id']: r.asDict()
         for r in interleaved_doc_stats(
             planted, min_images=1, max_images=4,
             min_text_tokens=8, max_media_run=3).collect()}
  assert set(got) == set(docs)
  for doc_id, spans in docs.items():
    n_media = sum(1 for s in spans if s['kind'] == 'media')
    n_text = sum(1 for s in spans if s['kind'] == 'text')
    n_tokens = sum(len(s['text'].split()) for s in spans
                   if s['kind'] == 'text' and s['text']
                   and s['text'].strip())
    run = best = 0
    for s in spans:
      run = run + 1 if s['kind'] == 'media' else 0
      best = max(best, run)
    exp_keep = int(1 <= n_media <= 4 and n_tokens >= 8 and best <= 3)
    r = got[doc_id]
    assert r['n_spans'] == len(spans)
    assert (r['n_text'], r['n_media']) == (n_text, n_media)
    assert r['n_tokens'] == n_tokens
    assert r['media_run'] == best
    assert r['lead_media'] == int(bool(spans)
                                  and spans[0]['kind'] == 'media')
    assert r['trail_media'] == int(bool(spans)
                                   and spans[-1]['kind'] == 'media')
    assert r['keep'] == exp_keep


def test_render_full_python_recomputation(planted):
  docs = _py_docs(planted)
  got = {r['doc_id']: r.asDict()
         for r in render_interleaved(planted).collect()}
  for doc_id, spans in docs.items():
    parts, manifest = [], []
    for s in spans:
      if s['kind'] == 'media':
        parts.append('<|image|>')
        manifest.append(s['media_ref'])
      elif s['text'] and s['text'].strip():
        parts.append(s['text'].strip())
    r = got[doc_id]
    assert r['rendered_text'] == ' '.join(parts)
    assert r['media_manifest'] == manifest
    assert r['n_sentinels'] == len(manifest)
    assert r['n_render_tokens'] == len(r['rendered_text'].split())


def test_dedup_full_python_recomputation(planted):
  docs = _py_docs(planted)
  cap = 20
  from collections import Counter
  df_count = Counter()
  for spans in docs.values():
    for ref in {s['media_ref'] for s in spans if s['kind'] == 'media'}:
      df_count[ref] += 1
  hot = {ref for ref, c in df_count.items() if c > cap}
  got = {r['doc_id']: r.asDict()
         for r in dedup_media_spans(planted, max_media_df=cap)
         .collect()}
  for doc_id, spans in docs.items():
    surviving = [s for s in spans
                 if not (s['kind'] == 'media' and s['media_ref'] in hot)]
    removed = len(spans) - len(surviving)
    r = got[doc_id]
    assert r['n_media_removed'] == removed
    got_spans = sorted((s.asDict() for s in r['out_spans']),
                       key=lambda s: s['order'])
    assert got_spans == surviving
  # the plant guarantees both verdicts are exercised at this scale:
  # logo (df = n_docs) and banners (df = n/10) are hot, tiles
  # (df = n/100 = 5) and per-doc refs are kept
  assert 'media/logo' in hot
  assert any(ref.startswith('media/banner/') for ref in hot)
  assert not any(ref.startswith('media/tile/') for ref in hot)


# ------------------------------------------------- curation capstone


def test_passthrough_preserves_columns(spark):
  df = spark.createDataFrame(
      [('d', [t('a b c', 0), m('m/0', 1)])], SCHEMA) \
      .withColumn('extra', F.lit(7))
  s = interleaved_doc_stats(df, passthrough=('out_spans', 'extra'))
  r = s.collect()[0]
  assert r['extra'] == 7 and len(r['out_spans']) == 2
  rend = render_interleaved(df, passthrough=('extra',)).collect()[0]
  assert rend['extra'] == 7


def test_curation_pipeline_full_python_recomputation(spark, planted):
  """End-to-end verdict + rendering equality against a sequential
  python recomputation of the whole chain (hot set -> removal ->
  composition gate -> rendering) over the planted gate frame."""
  from collections import Counter
  from blueprint_oss_spark.ops.multimodal import (
      interleaved_curation_pipeline)
  docs = _py_docs(planted)
  cap, min_i, max_i, min_t, max_r = 20, 1, 2, 8, 1
  df_count = Counter()
  for spans in docs.values():
    for ref in {s['media_ref'] for s in spans if s['kind'] == 'media'}:
      df_count[ref] += 1
  hot = {ref for ref, c in df_count.items() if c > cap}
  expected = {}
  for doc_id, spans in docs.items():
    cleaned = [s for s in spans
               if not (s['kind'] == 'media' and s['media_ref'] in hot)]
    removed = len(spans) - len(cleaned)
    n_media = sum(1 for s in cleaned if s['kind'] == 'media')
    n_tokens = sum(len(s['text'].split()) for s in cleaned
                   if s['kind'] == 'text' and s['text']
                   and s['text'].strip())
    run = best = 0
    for s in cleaned:
      run = run + 1 if s['kind'] == 'media' else 0
      best = max(best, run)
    if not (min_i <= n_media <= max_i and n_tokens >= min_t
            and best <= max_r):
      continue
    parts, manifest = [], []
    for s in cleaned:
      if s['kind'] == 'media':
        parts.append('<|image|>')
        manifest.append(s['media_ref'])
      elif s['text'] and s['text'].strip():
        parts.append(s['text'].strip())
    expected[doc_id] = {
        'rendered_text': ' '.join(parts), 'media_manifest': manifest,
        'n_sentinels': len(manifest),
        'n_render_tokens': n_tokens + len(manifest),
        'n_media_removed': removed, 'n_media': n_media,
        'n_tokens': n_tokens}
  got = {r['doc_id']: r.asDict()
         for r in interleaved_curation_pipeline(
             spark, SF_DIR, max_media_df=cap, min_images=min_i,
             max_images=max_i, min_text_tokens=min_t,
             max_media_run=max_r, content=planted).collect()}
  assert set(got) == set(expected)
  for doc_id, exp in expected.items():
    r = got[doc_id]
    for k, v in exp.items():
      assert r[k] == v, (doc_id, k, r[k], v)
  # the thresholds actually split the corpus (gate exercise, not a
  # vacuous keep-all): some docs dropped, some kept
  assert 0 < len(expected) < len(docs)


def test_curation_pipeline_single_substantive_shuffle(spark, planted):
  """The whole chain's only Exchange is the bounded hot-ref count
  (word-count shape); the document payload never shuffles and there
  is no doc_id join anywhere."""
  from blueprint_oss_spark.ops.multimodal import (
      interleaved_curation_pipeline)
  plan = (interleaved_curation_pipeline(spark, SF_DIR, content=planted)
          ._jdf.queryExecution().executedPlan().toString())
  assert 'SortMergeJoin' not in plan
  # the only joins are the broadcast of the single hot-ref row
  n_exchanges = plan.count('Exchange hashpartitioning')
  assert n_exchanges <= 2   # distinct + groupBy partials of refs
