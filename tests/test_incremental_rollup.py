"""Incremental rollup maintenance (continuous-aggregate shape):
from-scratch DuckDB recomputation of the report (counts, truncated
micro sums, HLL registers from the shared md5/rho formulas, checksum,
pinned-fold estimate) at two scales; merge(rollup(A), rollup(B)) ≡
rollup(A ∪ B) bitwise for disjoint-day AND overlapping-group splits;
empty-side merges; plan shape (rollup-sized shuffles only).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops import relational as R

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

_ORACLE = """
WITH rbase AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, user_id,
         CAST(trunc(value * 1000000.0) AS BIGINT) AS vm
  FROM read_parquet('{sf}/events.parquet')
), rsum AS (
  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(vm) AS BIGINT) AS value_micro
  FROM rbase GROUP BY day, event_type
), rh AS (
  SELECT day, event_type,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM rbase
), rrho AS (
  SELECT day, event_type, h % 64 AS bucket,
         CASE WHEN (h >> 6) = 0 THEN 55
              ELSE 55 - length(bin(h >> 6)) END AS rho
  FROM rh
), rregs AS (
  SELECT day, event_type, bucket, max(rho) AS r
  FROM rrho GROUP BY day, event_type, bucket
), rgb AS (
  SELECT g.day, g.event_type, b.b AS bucket
  FROM (SELECT DISTINCT day, event_type FROM rbase) g
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
), rfilled AS (
  SELECT rgb.day, rgb.event_type, rgb.bucket,
         coalesce(rregs.r, 0) AS r
  FROM rgb LEFT JOIN rregs
    ON rregs.day = rgb.day AND rregs.event_type = rgb.event_type
   AND rregs.bucket = rgb.bucket
), rfolded AS (
  SELECT day, event_type,
         CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_regs,
         CAST(sum((bucket + 1) * r) AS BIGINT) AS reg_checksum,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(1.0 AS DOUBLE)
                  / CAST((1::BIGINT << r) AS DOUBLE)
                  ORDER BY bucket)),
             (a, x) -> a + x) AS denom
  FROM rfilled GROUP BY day, event_type
)
SELECT s.day, s.event_type, s.n_events, s.value_micro,
       f.n_zero_regs, f.reg_checksum,
       round(0.709 * 64.0 * 64.0 / f.denom, 6) AS hll_est
FROM rsum s JOIN rfolded f
  ON f.day = s.day AND f.event_type = s.event_type
ORDER BY s.day, s.event_type
"""


@pytest.mark.parametrize('sf', [SF1, SF2])
def test_report_matches_duckdb_from_scratch(spark, sf):
  got = [tuple(r) for r in
         R.rollup_report(R.rollup_events(spark, sf)).collect()]
  exp = duckdb.sql(_ORACLE.format(sf=sf)).fetchall()
  assert got == exp
  assert len(got) == 150  # 30 days x 5 event types


@pytest.mark.parametrize('split', ['2024-01-02', '2024-01-21',
                                   '2024-02-15'])
def test_merge_equals_full_disjoint_days(spark, split):
  # 2024-02-15 puts EVERYTHING in the history side: empty-delta merge
  full = [tuple(r) for r in
          R.rollup_report(R.rollup_events(spark, SF1)).collect()]
  inc = [tuple(r) for r in
         R.incremental_rollup(spark, SF1, split_day=split).collect()]
  assert inc == full


def test_merge_equals_full_overlapping_groups(spark):
  """Split by user parity: BOTH halves hit every (day, type) group,
  exercising the additive count/sum merge and the register MAX merge
  on non-null sides (the disjoint-day split only exercises the
  null-side coalesce)."""
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  a = R.rollup_events(spark, SF1,
                      events=ev.where(F.col('user_id') % 2 == 0))
  b = R.rollup_events(spark, SF1,
                      events=ev.where(F.col('user_id') % 2 == 1))
  inc = [tuple(r) for r in
         R.rollup_report(R.merge_rollups(a, b)).collect()]
  full = [tuple(r) for r in
          R.rollup_report(R.rollup_events(spark, SF1)).collect()]
  assert inc == full


def test_merge_with_empty_side(spark):
  ev = spark.read.parquet(f'{SF1}/events.parquet')
  empty = R.rollup_events(spark, SF1, events=ev.where(F.lit(False)))
  full_state = R.rollup_events(spark, SF1)
  merged = [tuple(r) for r in
            R.rollup_report(R.merge_rollups(full_state, empty))
            .collect()]
  full = [tuple(r) for r in R.rollup_report(full_state).collect()]
  assert merged == full


def test_state_shuffles_are_rollup_sized(spark):
  """Both aggregations key on rollup-cardinality groups (x64 for the
  register pass) — no per-event or per-user shuffle key appears."""
  plan = R.rollup_events(spark, SF1)._jdf.queryExecution() \
      .executedPlan().toString()
  assert 'user_id' not in plan.split('Exchange hashpartitioning')[1][:200]
  assert plan.count('Exchange hashpartitioning') <= 3
