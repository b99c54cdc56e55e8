"""Time-partitioned storage layout: static partition pruning (the
scan's PartitionFilters prune directories at planning time — file
count asserted, not just plan text), dynamic partition pruning from a
filtered date dimension, value round-trip fidelity, and granularity
validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.spark.storage import (read_time_partitioned,
                                               write_time_partitioned)

SF1 = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def part_path(spark, tmp_path_factory):
  path = str(tmp_path_factory.mktemp('tp') / 'events')
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  write_time_partitioned(ev, path)
  return path


def test_roundtrip_preserves_rows(spark, part_path):
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  back = read_time_partitioned(spark, part_path)
  assert back.count() == ev.count()
  # day values come back as DATE via partition inference — compare
  # through the iso string, which must be lossless
  got = {r['event_id']: str(r['part_date']) for r in
         back.select('event_id', 'part_date').collect()}
  exp = {r['event_id']: r['d'] for r in
         ev.select('event_id',
                   F.date_format('ts', 'yyyy-MM-dd').alias('d'))
         .collect()}
  assert got == exp


def _scan_num_files(df) -> int:
  """The FileSourceScan's post-execution numFiles SQL metric — the
  ground truth for how many files the (pruned) scan actually read.
  (DataFrame.inputFiles() lists the UNPRUNED relation and cannot
  evidence pruning.)"""
  df.collect()
  leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
  total = 0
  for i in range(leaves.size()):
    leaf = leaves.apply(i)
    m = leaf.metrics()
    if m.contains('numFiles'):
      total += m.apply('numFiles').value()
  return total


def test_static_pruning_reads_only_matching_files(spark, part_path):
  back = read_time_partitioned(spark, part_path)
  one_day = back.where(F.col('part_date') == '2024-01-05')
  plan = one_day._jdf.queryExecution().executedPlan().toString()
  assert 'PartitionFilters' in plan
  assert '2024-01-05' in plan
  n_all = _scan_num_files(back)
  n_day = _scan_num_files(one_day)
  assert 0 < n_day < n_all
  assert n_all == 30  # one directory per January day
  # and the pruned read returns exactly the right rows
  n = one_day.count()
  exp = (spark.read.parquet(f'{SF1}/events.parquet')
         .where(F.date_format('ts', 'yyyy-MM-dd') == '2024-01-05')
         .count())
  assert n == exp > 0


def test_dynamic_partition_pruning_from_date_dim(spark, part_path):
  """The star-schema shape: fact partitioned by date, dimension
  filtered on an attribute — Spark plants a dynamic-pruning subquery
  on the fact scan so only the dimension's surviving dates are read."""
  back = read_time_partitioned(spark, part_path)
  dim = spark.createDataFrame(
      [('2024-01-05', 'keep'), ('2024-01-06', 'keep'),
       ('2024-01-07', 'drop')],
      'part_date string, tag string')
  joined = (back.join(dim, 'part_date')
            .where(F.col('tag') == 'keep'))
  plan = joined._jdf.queryExecution().executedPlan().toString()
  assert 'dynamicpruning' in plan.lower(), plan
  n = joined.count()
  exp = (spark.read.parquet(f'{SF1}/events.parquet')
         .where(F.date_format('ts', 'yyyy-MM-dd')
                .isin('2024-01-05', '2024-01-06'))
         .count())
  assert n == exp > 0


def test_overwrite_is_dynamic_per_partition(spark, tmp_path):
  """Re-landing ONE day must replace only that day's directory —
  Spark's static overwrite would wipe the whole table root (the
  incremental-ingest data-loss trap)."""
  path = str(tmp_path / 'dyn')
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  write_time_partitioned(ev, path)
  n_total = read_time_partitioned(spark, path).count()
  one_day = ev.where(F.date_format('ts', 'yyyy-MM-dd') == '2024-01-05')
  # re-land the same day (e.g. a corrected crawl): idempotent
  write_time_partitioned(one_day, path)
  back = read_time_partitioned(spark, path)
  assert back.count() == n_total
  days = {str(r['part_date']) for r in
          back.select('part_date').distinct().collect()}
  assert len(days) == 30  # every other day survived


def test_month_and_hour_granularities(spark, tmp_path):
  ev = spark.read.parquet(f'{SF1}/events.parquet').limit(50)
  write_time_partitioned(ev, str(tmp_path / 'm'), granularity='month')
  m = read_time_partitioned(spark, str(tmp_path / 'm'))
  assert set(r['part_date'] for r in
             m.select('part_date').distinct().collect()) == {'2024-01'}
  with pytest.raises(ValueError):
    write_time_partitioned(ev, str(tmp_path / 'x'), granularity='week')
