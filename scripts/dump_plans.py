#!/usr/bin/env python
"""Regenerate the raw .explain('formatted') dumps behind PLANS.md."""

import sys

sys.path.insert(0, '/root/repo')

from pyspark.sql import SparkSession


def main() -> None:
  spark = (SparkSession.builder.master('local[4]')
           .config('spark.sql.shuffle.partitions', '8')
           .config('spark.sql.adaptive.enabled', 'true')
           .config('spark.ui.enabled', 'false').getOrCreate())
  spark.sparkContext.setLogLevel('ERROR')
  from blueprint_oss_spark.fixtures import readme_blueprint, readme_corpus
  from blueprint_oss_spark.spark.pipeline import (
      SPANS_SCHEMA, extract_documents)
  from blueprint_oss_spark.ops import relational as R, textops as T

  docs = readme_corpus(8, seed=1)
  rows = [(d, [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
               for (k, t, m, o) in s]) for d, s in docs]
  df = spark.createDataFrame(rows, SPANS_SCHEMA)
  print('=== EXTRACTION PIPELINE ===')
  extract_documents(df, readme_blueprint()).explain('formatted')
  print('=== MAIN-CONTENT SPANS PIPELINE ===')
  from blueprint_oss_spark.ops.html_extract import (
      interleaved_html_table, main_content_from_spans)
  main_content_from_spans(
      interleaved_html_table(spark, '/root/testdata/sf0.001')) \
      .explain('formatted')
  print('=== Q1 ===')
  R.q1_pricing_summary(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== Q3 ===')
  R.q3_shipping_priority(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== Q5 ===')
  R.q5_local_supplier_volume(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== MINHASH ===')
  T.minhash_shingles(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== EMBEDDING NEAR-DUP (banded LSH) ===')
  from blueprint_oss_spark.ops import vectors as V
  V.embedding_near_dup_pairs(spark, '/root/testdata/sf0.001',
                             plant_for_verification=True) \
      .explain('formatted')
  print('=== AS-OF JOIN (tagged union + window) ===')
  R.events_asof_orders(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== RANGE JOIN (time-bin bucketing) ===')
  R.recent_event_counts(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== SESSIONIZE (one data shuffle) ===')
  R.sessionize(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== PQ ANN TOP-K (ADC + exact refine) ===')
  V.pq_topk(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== FUNNEL ANALYSIS (one hash shuffle) ===')
  R.funnel_analysis(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== COHORT RETENTION (two hash shuffles) ===')
  R.cohort_retention(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== SIMHASH NEAR-DUP PAIRS (banded hamming) ===')
  T.simhash_near_dup_pairs(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== TF-IDF TOP TERMS ===')
  T.tfidf_top_terms(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== PII SCRUB (shuffle-free scan projection) ===')
  from blueprint_oss_spark.ops import curation as Cu
  Cu.pii_scrub(spark, '/root/testdata/sf0.001').explain('formatted')
  print('=== DECONTAMINATE (broadcast eval-gram semi-join) ===')
  Cu.decontaminate(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== STRATIFIED SAMPLE ===')
  from blueprint_oss_spark.ops import profiling as P
  P.stratified_sample(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== TABLE PROFILE ===')
  P.table_profile(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== TRAINED LANG-ID (broadcast NB model, pinned fold) ===')
  T.lang_id_trained(spark, '/root/testdata/sf0.001') \
      .explain('formatted')
  print('=== DEDUP DECISION REPORT (4-signal composition, '
        'unsorted component inputs) ===')
  T.dedup_decision_report(spark, '/root/testdata/sf0.001',
                          sort=False).explain('formatted')
  spark.stop()


if __name__ == '__main__':
  main()
