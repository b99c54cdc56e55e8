"""Structured Streaming extraction: file-source stream in, parquet out,
results identical to the batch engine; checkpoint resume processes only
new files."""

import os

from blueprint_oss_spark.engine.runner import run_doc
from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus
from blueprint_oss_spark.spark.pipeline import SPANS_SCHEMA
from blueprint_oss_spark.spark.streaming import start_extraction_stream


def _write_batch(spark, docs, path):
  rows = [(doc_id,
           [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
            for (k, t, m, o) in spans])
          for doc_id, spans in docs]
  spark.createDataFrame(rows, SPANS_SCHEMA).coalesce(1) \
      .write.mode('append').parquet(path)


def test_streaming_extraction_matches_batch(spark, tmp_path):
  in_dir = str(tmp_path / 'in')
  out_dir = str(tmp_path / 'out')
  ckpt = str(tmp_path / 'ckpt')
  os.makedirs(in_dir, exist_ok=True)
  docs = readme_corpus(8, seed=303)
  root = readme_blueprint()

  _write_batch(spark, docs[:4], in_dir)
  q = start_extraction_stream(spark, in_dir, out_dir, ckpt, root,
                              trigger_once=True)
  q.awaitTermination(300)
  got1 = {r['doc_id'] for r in spark.read.parquet(out_dir).collect()}
  assert got1 == {d for d, _ in docs[:4]}

  # new files land; restart with same checkpoint → only new docs
  _write_batch(spark, docs[4:], in_dir)
  q = start_extraction_stream(spark, in_dir, out_dir, ckpt, root,
                              trigger_once=True)
  q.awaitTermination(300)
  rows = spark.read.parquet(out_dir).collect()
  assert len(rows) == 8  # no duplicates from reprocessing
  by_id = {r['doc_id']: r for r in rows}
  for doc_id, spans in docs:
    local = run_doc(doc_id, spans, root)
    assert by_id[doc_id]['fields'] == local['fields']
