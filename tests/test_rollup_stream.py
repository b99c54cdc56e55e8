"""Streaming continuous-aggregate maintenance: the final rollup state
after draining the event stream equals the batch operator's full-scan
rollup bitwise; a checkpointed restart merges only newly-landed files;
intermediate versions are themselves correct prefix rollups; replaying
a version write is byte-stable (idempotence the exactly-once story
rests on).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blueprint_oss_spark.ops import relational as R
from blueprint_oss_spark.spark.streaming import (read_rollup_state,
                                                 start_rollup_stream)

SF1 = '/root/testdata/sf0.001'


def _report_rows(df):
  return [tuple(r) for r in R.rollup_report(df).collect()]


def test_stream_state_matches_batch_and_resumes(spark, tmp_path):
  in_dir = str(tmp_path / 'ev_in')
  state_dir = str(tmp_path / 'ev_state')
  ckpt = str(tmp_path / 'ev_ckpt')
  os.makedirs(in_dir, exist_ok=True)

  ev = spark.read.parquet(f'{SF1}/events.parquet')
  part1 = ev.where(F.dayofmonth('ts') <= 10)
  part2 = ev.where((F.dayofmonth('ts') > 10) & (F.dayofmonth('ts') <= 20))
  part3 = ev.where(F.dayofmonth('ts') > 20)

  # phase 1: two files land, drain with availableNow
  part1.coalesce(1).write.mode('append').parquet(in_dir)
  part2.coalesce(1).write.mode('append').parquet(in_dir)
  q = start_rollup_stream(spark, in_dir, state_dir, ckpt,
                          trigger_once=True, max_files_per_trigger=1)
  q.awaitTermination(300)

  mid = read_rollup_state(spark, state_dir)
  exp_mid = R.rollup_events(spark, SF1,
                            events=part1.unionByName(part2))
  assert _report_rows(mid) == _report_rows(exp_mid)

  # phase 2: a third file lands, restart on the same checkpoint —
  # only the new increment merges in
  part3.coalesce(1).write.mode('append').parquet(in_dir)
  q = start_rollup_stream(spark, in_dir, state_dir, ckpt,
                          trigger_once=True, max_files_per_trigger=1)
  q.awaitTermination(300)

  final = read_rollup_state(spark, state_dir)
  full = R.rollup_events(spark, SF1)
  assert _report_rows(final) == _report_rows(full)

  # versions are monotone prefix states: the earliest committed
  # version is SOME single increment's rollup (batch order is the
  # file-source's, so just check it is a subset-sum of the full state)
  versions = sorted(d for d in os.listdir(state_dir)
                    if d.startswith('v'))
  assert len(versions) >= 3
  v0 = spark.read.parquet(f'{state_dir}/{versions[0]}')
  full_rows = {(r['day'], r['event_type']): r['n_events']
               for r in full.collect()}
  for r in v0.collect():
    assert r['n_events'] <= full_rows[(r['day'], r['event_type'])]


def test_version_rewrite_is_deterministic(spark, tmp_path):
  """The exactly-once argument: re-running a batch's merge against the
  same predecessor rewrites an identical version."""
  state_dir = str(tmp_path / 'st')
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  half = ev.where(F.dayofmonth('ts') <= 15)
  rest = ev.where(F.dayofmonth('ts') > 15)
  R.rollup_events(spark, SF1, events=half) \
      .write.parquet(f'{state_dir}/v{0:09d}')

  def build_v1():
    prev = read_rollup_state(spark, state_dir, before_batch=1)
    merged = R.merge_rollups(prev,
                             R.rollup_events(spark, SF1, events=rest))
    merged.write.mode('overwrite').parquet(f'{state_dir}/v{1:09d}')
    return _report_rows(spark.read.parquet(f'{state_dir}/v{1:09d}'))

  first = build_v1()
  second = build_v1()  # the replay
  assert first == second
  assert first == _report_rows(R.rollup_events(spark, SF1))
  # before_batch excludes the replayed batch's own partial version
  prev = read_rollup_state(spark, state_dir, before_batch=1)
  assert _report_rows(prev) == _report_rows(
      R.rollup_events(spark, SF1, events=half))
