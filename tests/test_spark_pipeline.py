"""Spark-shell tests: the bulk pipeline must produce exactly what the
single-doc engine produces, and the resumable job must checkpoint."""

import os

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.engine.runner import run_doc
from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus
from blueprint_oss_spark.spark.pipeline import (
    SPANS_SCHEMA, extract_documents, run_extraction_job,
    spans_from_documents,
)


def _spans_df(spark, docs):
  rows = [(doc_id,
           [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
            for (k, t, m, o) in spans])
          for doc_id, spans in docs]
  return spark.createDataFrame(rows, SPANS_SCHEMA)


def test_extract_documents_matches_local_engine(spark):
  docs = readme_corpus(20, seed=77)
  root = readme_blueprint()
  df = _spans_df(spark, docs)
  out = {r['doc_id']: r for r in
         extract_documents(df, root).collect()}
  assert len(out) == len(docs)
  for doc_id, spans in docs:
    local = run_doc(doc_id, spans, root)
    got = out[doc_id]
    assert got['error'] is None
    assert got['fields'] == local['fields']
    got_spans = [(s['kind'], s['text'], s['media_ref'], s['order'])
                 for s in got['out_spans']]
    assert got_spans == local['out_spans']
    assert got['score'] == pytest.approx(local['score'], rel=1e-12)


def test_extract_documents_plan_has_no_shuffle(spark):
  docs = readme_corpus(4, seed=78)
  df = _spans_df(spark, docs)
  out = extract_documents(df, readme_blueprint())
  plan = out._jdf.queryExecution().executedPlan().toString()
  assert 'Exchange' not in plan  # scan → mapInPandas pipelines, no shuffle


def test_spans_from_documents(spark):
  docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
          .limit(20))
  spans = spans_from_documents(docs)
  rows = spans.collect()
  assert rows
  for r in rows:
    offsets = [s['offset'] for s in r['spans']]
    assert offsets == sorted(offsets)
    assert all(s['kind'] == 'text' for s in r['spans'])


def test_spans_from_documents_long_words_round_trip(spark):
  """The bulk ingest path must not silently drop content: every
  nonempty input token becomes exactly one span; words wider than a
  grid cell are truncated to 15 chars, never deleted."""
  texts = [
      ('d0', 'short tokens only here'),
      ('d1', 'a supercalifragilisticexpialidocious word plus '
             'internationalization and xx'),
      ('d2', 'x' * 64),
  ]
  docs = spark.createDataFrame(texts, 'doc_id string, text string')
  out = {r['doc_id']: r['spans']
         for r in spans_from_documents(docs).collect()}
  for doc_id, text in texts:
    words = [w for w in text.split(' ') if w]
    got = [s['text'] for s in out[doc_id]]
    assert len(got) == len(words), (doc_id, got)
    for w, g in zip(words, got):
      assert g == w[:15], (w, g)


def test_run_extraction_job_resume(spark, tmp_path):
  docs = readme_corpus(16, seed=79)
  root = readme_blueprint()
  df = _spans_df(spark, docs)
  out_path = str(tmp_path / 'out')

  lineage = run_extraction_job(spark, df, out_path, root,
                               buckets=8, groups=2)
  assert len(lineage) == 2
  assert sum(r['metrics']['docs'] for r in lineage) == 16
  n1 = spark.read.parquet(out_path).count()
  assert n1 == 16

  # Resume: nothing left to do.
  lineage2 = run_extraction_job(spark, df, out_path, root,
                                buckets=8, groups=2)
  assert lineage2 == []
  assert spark.read.parquet(out_path).count() == 16

  # Crash-replay: lineage for group 1 lost AFTER its data was written
  # (crash between data write and lineage write).  The re-run must
  # replace that group's partitions, not append duplicates.
  import os
  os.remove(str(tmp_path / 'out' / '_lineage' / 'group-1.json'))
  before = {r['doc_id']: r['score']
            for r in spark.read.parquet(out_path).collect()}
  lineage3 = run_extraction_job(spark, df, out_path, root,
                                buckets=8, groups=2)
  assert [r['group'] for r in lineage3] == [1]
  after_rows = spark.read.parquet(out_path).collect()
  assert len(after_rows) == 16  # no duplicates
  assert {r['doc_id']: r['score'] for r in after_rows} == before


def test_run_extraction_job_iceberg_contract(spark, tmp_path):
  """The Iceberg sink branch: missing table name is a ValueError; with a
  name but no Iceberg catalog on the session (this container ships no
  Iceberg jars) the failure is a RuntimeError that names the required
  spark-submit setup — not a raw py4j traceback."""
  import pytest

  from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus

  docs = readme_corpus(4, seed=11)
  rows = [(d, [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
               for (k, t, m, o) in spans]) for d, spans in docs]
  df = spark.createDataFrame(rows, SPANS_SCHEMA)
  root = readme_blueprint()

  with pytest.raises(ValueError, match='iceberg_table'):
    run_extraction_job(spark, df, str(tmp_path / 'o1'), root,
                       buckets=4, groups=1, table_format='iceberg')

  with pytest.raises(RuntimeError, match='Iceberg catalog'):
    run_extraction_job(spark, df, str(tmp_path / 'o2'), root,
                       buckets=4, groups=1, table_format='iceberg',
                       iceberg_table='nosuchcat.db.extractions')


def test_dedup_spans_keeps_min_doc_per_content(spark):
  """Exact pre-extraction dedup: duplicate span contents collapse to the
  min doc_id; unique docs pass through; extraction over the deduped
  table equals extraction over the keepers."""
  from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus
  from blueprint_oss_spark.spark.pipeline import dedup_spans

  docs = readme_corpus(6, seed=5)
  # duplicate doc 0's spans under two new ids, and doc 3's under one
  dup = [('zz-copy1', docs[0][1]), ('aa-copy2', docs[0][1]),
         ('mm-copy3', docs[3][1])]
  rows = [(d, [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
               for (k, t, m, o) in spans]) for d, spans in docs + dup]
  df = spark.createDataFrame(rows, SPANS_SCHEMA)
  out = dedup_spans(df)
  kept = sorted(r['doc_id'] for r in out.select('doc_id').collect())
  # doc 0's cluster: {readme-00000, zz-copy1, aa-copy2} → min is
  # 'aa-copy2'; doc 3's cluster keeps 'mm-copy3' vs 'readme-00003' → min
  assert 'aa-copy2' in kept and 'zz-copy1' not in kept
  assert 'readme-00000' not in kept
  assert 'mm-copy3' in kept and 'readme-00003' not in kept
  assert len(kept) == 6
  # extraction over the deduped table matches per-doc local runs
  from blueprint_oss_spark.engine.runner import run_doc
  root = readme_blueprint()
  by_id = {r['doc_id']: r for r in
           extract_documents(out, root).collect()}
  spans_by_id = dict(docs + dup)
  for doc_id in kept:
    local = run_doc(doc_id, spans_by_id[doc_id], root)
    assert by_id[doc_id]['fields'] == local['fields']


def test_run_job_with_main_content_transform(spark, tmp_path):
  """The checkpoint/lineage machinery generalizes to any doc-level
  transform: the main-content spans pipeline runs through
  run_extraction_job with per-group lineage + resume, and its output
  equals the direct (un-bucketed) run."""
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans,
  )
  from blueprint_oss_spark.spark.pipeline import run_extraction_job

  inp = str(tmp_path / 'spans_in')
  interleaved_html_table(spark, '/root/testdata/sf0.001') \
      .limit(120).write.parquet(inp)
  src = spark.read.parquet(inp)
  out_path = str(tmp_path / 'mc_out')

  lineage = run_extraction_job(
      spark, src, out_path, transform=main_content_from_spans,
      buckets=8, groups=2)
  assert len(lineage) == 2
  assert sum(r['metrics']['docs'] for r in lineage) == 120
  assert all('errors' not in r['metrics'] for r in lineage)

  got = {r['doc_id']: [(s['kind'], s['text'], s['media_ref'],
                        s['order']) for s in r['out_spans']]
         for r in spark.read.parquet(out_path).collect()}
  want = {r['doc_id']: [(s['kind'], s['text'], s['media_ref'],
                         s['order']) for s in r['out_spans']]
          for r in main_content_from_spans(src).collect()}
  assert got == want and len(got) == 120

  # resume: everything checkpointed, nothing re-runs
  assert run_extraction_job(
      spark, src, out_path, transform=main_content_from_spans,
      buckets=8, groups=2) == []

  # crash recovery: drop one group's lineage -> only it re-runs,
  # and the dynamic partition overwrite leaves no duplicates
  import os
  os.remove(f'{out_path}/_lineage/group-1.json')
  redo = run_extraction_job(
      spark, src, out_path, transform=main_content_from_spans,
      buckets=8, groups=2)
  assert [r['group'] for r in redo] == [1]
  assert spark.read.parquet(out_path).count() == 120


def test_size_bucketed_repartition_same_results(spark):
  """The opt-in skew shuffle (salted repartition by log2 span count)
  must not change any result — same rows, same scores — and must add
  exactly one Exchange to the otherwise shuffle-free plan."""
  from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus
  from blueprint_oss_spark.spark.pipeline import (
      SPANS_SCHEMA, extract_documents,
  )

  docs = readme_corpus(24, seed=11)
  rows = [(d, [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
               for (k, t, m, o) in s]) for d, s in docs]
  df = spark.createDataFrame(rows, SPANS_SCHEMA)
  root = readme_blueprint()

  plain = {(r['doc_id'], r['score'], tuple(sorted((r['fields'] or {})
                                                  .items())))
           for r in extract_documents(df, root).collect()}
  salted_df = extract_documents(df, root,
                                size_bucketed_repartition=True,
                                num_partitions=8)
  salted = {(r['doc_id'], r['score'], tuple(sorted((r['fields'] or {})
                                                   .items())))
            for r in salted_df.collect()}
  assert salted == plain
  plan = salted_df._jdf.queryExecution().executedPlan().toString()
  # exactly one shuffle boundary (AQE may render the materialized
  # stage plus the exchange node; count distinct partitionings)
  n_shuffles = len({ln.split('[plan_id')[0].strip()
                    for ln in plan.splitlines()
                    if 'Exchange hashpartitioning' in ln})
  assert n_shuffles == 1, plan
