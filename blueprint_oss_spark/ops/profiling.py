"""Dataset-curation helpers a 100 TB training-data pipeline needs
before/after the heavy operators: deterministic stratified sampling and
exact table profiling.  Pure JVM built-ins throughout (whole-stage
codegen, no Python), and every output is exactly recomputable in DuckDB
for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Per-language keep-rate expressed as an md5-hex threshold string:
#: md5(doc_id) is uniform over [0, 16^32), so keeping rows with
#: md5(doc_id) < T keeps ~int(T,16)/16^32 of each stratum.  String
#: comparison of fixed-width lowercase hex is identical in every engine
#: — no hex→int conversion, no float thresholds, no RNG.
STRATA_THRESHOLDS = (
    ('en', '8' + '0' * 31),   # ~50 %
    ('es', '4' + '0' * 31),   # ~25 %
    ('de', '4' + '0' * 31),   # ~25 %
    ('fr', '2' + '0' * 31),   # ~12.5 %
)
DEFAULT_THRESHOLD = '1' + '0' * 31  # ~6.25 % for any other stratum


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
  """Deterministic per-language stratified sample of the documents
  table.  Hash-threshold sampling (md5 of the stable key) is the
  production pattern at 100 TB: it needs no count pass, no RNG state,
  is stable under retries/re-partitioning (a resumed job keeps the
  same sample), and pushes down to a scan + filter — no shuffle at
  all.  Rates per stratum come from STRATA_THRESHOLDS."""
  d = spark.read.parquet(f'{sf_dir}/documents.parquet')
  # doc_id is numeric in the testdata table; hash its decimal string
  # form (identical rendering in every engine)
  h = F.md5(F.col('doc_id').cast('string'))
  thr = F.lit(DEFAULT_THRESHOLD)
  for lang, t in reversed(STRATA_THRESHOLDS):
    thr = F.when(F.col('lang') == lang, F.lit(t)).otherwise(thr)
  return (d.where(h < thr)
          .select('doc_id', 'lang')
          .orderBy('doc_id'))


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
  """Exact per-stratum profile of the documents table: row counts,
  distinct texts, null/empty counts, min/max/total text length — the
  ANALYZE-style summary a curation run logs per snapshot.  One
  map-side-combinable groupBy; every aggregate is exact (no approx
  sketches) so DuckDB recomputes it bit-for-bit."""
  d = spark.read.parquet(f'{sf_dir}/documents.parquet')
  return (d.groupBy('lang')
          .agg(F.count(F.lit(1)).alias('n_docs'),
               F.count_distinct(F.col('text')).alias('n_distinct_texts'),
               F.sum(F.when(F.length('text') == 0, 1).otherwise(0))
               .alias('n_empty'),
               F.min(F.length('text')).alias('min_len'),
               F.max(F.length('text')).alias('max_len'),
               F.sum(F.length('text')).alias('total_len'),
               F.min('doc_id').alias('first_doc_id'),
               F.max('doc_id').alias('last_doc_id'))
          .orderBy('lang'))
