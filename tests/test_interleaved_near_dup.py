"""Cross-modal near-duplicate verdicts over interleaved text+media
documents: text evidence (exact n-gram Jaccard over the concatenated
main-content text spans) merged with media evidence (shared media_refs
— the shared-asset signal).

Verification: planted-evidence matrix (text-only / media-only / both /
neither), span-order reassembly, the media hub-df cap, repartition
determinism, a from-scratch DuckDB recomputation over the planted
frame, and a plan pin (equi-join inverted indexes, no cartesian).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.multimodal import interleaved_near_dup

SCHEMA = ('doc_id string, out_spans array<struct<kind:string,'
          'text:string,media_ref:string,order:int>>')


def _df(spark, rows):
  data = [(d, [{'kind': k, 'text': t, 'media_ref': m, 'order': o}
               for (k, t, m, o) in spans]) for d, spans in rows]
  return spark.createDataFrame(data, SCHEMA)


LONG_A = ' '.join(f'w{i}' for i in range(40))
LONG_B = ' '.join(f'w{i}' for i in range(39)) + ' zz'  # near-dup of A
OTHER = ' '.join(f'q{i}' for i in range(40))


def _verdicts(out):
  return {(r['doc_a'], r['doc_b']): (r['text_dup'], r['media_dup'],
                                     r['shared_media'])
          for r in out.collect()}


def test_evidence_matrix(spark):
  rows = [
      # d1/d2: near-dup text, disjoint media  -> text-only pair
      ('d1', [('text', LONG_A, None, 0), ('media', None, 'm/1', 1)]),
      ('d2', [('text', LONG_B, None, 0), ('media', None, 'm/2', 1)]),
      # d3/d4: unrelated texts, two shared refs -> media-only pair
      ('d3', [('text', OTHER, None, 0), ('media', None, 'm/s1', 1),
              ('media', None, 'm/s2', 2)]),
      ('d4', [('text', ' '.join(f'r{i}' for i in range(40)), None, 0),
              ('media', None, 'm/s1', 1), ('media', None, 'm/s2', 2)]),
      # d5: mirror of d1 (same text AND same media) -> both
      ('d5', [('text', LONG_A, None, 0), ('media', None, 'm/1', 1)]),
      # d6: unrelated to everything
      ('d6', [('text', ' '.join(f'z{i}' for i in range(40)), None, 0),
              ('media', None, 'm/6', 1)]),
  ]
  got = _verdicts(interleaved_near_dup(
      spark, 'unused', spans=_df(spark, rows)))
  assert got[('d1', 'd2')] == (1, 0, 0)   # text only
  assert got[('d3', 'd4')] == (0, 1, 2)   # media only (2 shared refs)
  assert got[('d1', 'd5')] == (1, 1, 1)   # mirror: both evidences
  assert got[('d2', 'd5')] == (1, 0, 0)   # near-dup text of the mirror
  assert not any('d6' in p for p in got)
  assert set(got) == {('d1', 'd2'), ('d3', 'd4'), ('d1', 'd5'),
                      ('d2', 'd5')}


def test_min_shared_media_threshold(spark):
  rows = [
      ('a', [('text', OTHER, None, 0), ('media', None, 'm/x', 1)]),
      ('b', [('text', LONG_A, None, 0), ('media', None, 'm/x', 1)]),
  ]
  one = _verdicts(interleaved_near_dup(
      spark, 'unused', spans=_df(spark, rows), min_shared_media=1))
  two = _verdicts(interleaved_near_dup(
      spark, 'unused', spans=_df(spark, rows), min_shared_media=2))
  assert one[('a', 'b')] == (0, 1, 1)
  assert ('a', 'b') not in two


def test_span_order_reassembly(spark):
  # text spans deliberately listed out of order: the (order, text)
  # array_sort must restore the interleave before shingling, so the
  # two docs' assembled texts are IDENTICAL -> jaccard 1
  rows = [
      ('p', [('text', 'alpha beta gamma delta', None, 0),
             ('text', 'epsilon zeta eta theta', None, 2)]),
      ('q', [('text', 'epsilon zeta eta theta', None, 2),
             ('text', 'alpha beta gamma delta', None, 0)]),
  ]
  got = _verdicts(interleaved_near_dup(
      spark, 'unused', spans=_df(spark, rows)))
  assert got[('p', 'q')][0] == 1


def test_media_hub_cap(spark):
  # a site-wide logo shared by ALL docs; pairs exist only via the hub,
  # so capping its df drops every pair (documented recall trade)
  rows = [(f'h{i}', [('text', ' '.join(f't{i}_{j}' for j in range(30)),
                      None, 0), ('media', None, 'm/logo', 1)])
          for i in range(8)]
  full = interleaved_near_dup(spark, 'unused', spans=_df(spark, rows))
  assert full.count() == 8 * 7 // 2
  capped = interleaved_near_dup(spark, 'unused', spans=_df(spark, rows),
                                max_media_df=4)
  assert capped.count() == 0


def test_repartition_determinism(spark):
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  sf = '/root/testdata/sf0.001'
  base = interleaved_near_dup(spark, sf).collect()
  spans = main_content_from_spans(
      interleaved_html_table(spark, sf).repartition(64))
  re = interleaved_near_dup(spark, sf, spans=spans).collect()
  assert [tuple(r) for r in re] == [tuple(r) for r in base]


def test_duckdb_recomputation(spark):
  # from-scratch SQL over a planted frame: media evidence + text
  # evidence recomputed independently and full-outer merged
  rows = [
      ('d1', [('text', LONG_A, None, 0), ('media', None, 'm/1', 1)]),
      ('d2', [('text', LONG_B, None, 0), ('media', None, 'm/1', 1)]),
      ('d3', [('text', OTHER, None, 0), ('media', None, 'm/1', 1),
              ('media', None, 'm/2', 2)]),
  ]
  got = [tuple(r) for r in interleaved_near_dup(
      spark, 'unused', spans=_df(spark, rows)).collect()]
  texts = {'d1': LONG_A, 'd2': LONG_B, 'd3': OTHER}
  media = [('d1', 'm/1'), ('d2', 'm/1'), ('d3', 'm/1'), ('d3', 'm/2')]
  con = duckdb.connect()
  con.execute('CREATE TABLE docs (doc_id VARCHAR, text VARCHAR)')
  con.executemany('INSERT INTO docs VALUES (?, ?)', list(texts.items()))
  con.execute('CREATE TABLE med (doc_id VARCHAR, media_ref VARCHAR)')
  con.executemany('INSERT INTO med VALUES (?, ?)', media)
  exp = con.execute("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 x -> len(x) > 0) AS t FROM docs),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    tp AS (
      SELECT doc_a, doc_b, n_common, sa.n AS n_a, sb.n AS n_b
      FROM inter
      JOIN sizes sa ON inter.doc_a = sa.doc_id
      JOIN sizes sb ON inter.doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8),
    mp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS shared_media
      FROM med a JOIN med b
        ON a.media_ref = b.media_ref AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 1)
    SELECT coalesce(tp.doc_a, mp.doc_a) AS doc_a,
           coalesce(tp.doc_b, mp.doc_b) AS doc_b,
           CAST(tp.doc_a IS NOT NULL AS INT) AS text_dup,
           CAST(mp.doc_a IS NOT NULL AS INT) AS media_dup,
           tp.n_common, tp.n_a, tp.n_b,
           coalesce(mp.shared_media, 0) AS shared_media
    FROM tp FULL OUTER JOIN mp
      ON tp.doc_a = mp.doc_a AND tp.doc_b = mp.doc_b
    ORDER BY doc_a, doc_b""").fetchall()
  assert got == [tuple(r) for r in exp]


def test_plan_shape(spark):
  plan = interleaved_near_dup(
      spark, '/root/testdata/sf0.001')._jdf.queryExecution() \
      .executedPlan().toString()
  assert 'CartesianProduct' not in plan
  assert 'BroadcastNestedLoopJoin' not in plan
