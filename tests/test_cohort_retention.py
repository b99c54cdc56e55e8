"""Cohort retention matrix (ops/relational.cohort_retention).
Gate-checked against a from-scratch DuckDB recomputation at sf0.01 and
sf0.1; these tests pin the two-shuffle plan and recompute the matrix
independently in pandas.
"""

import re

import pandas as pd

SF = '/root/testdata/sf0.01'
WEEK_US = 7 * 24 * 3600 * 1_000_000


def test_cohort_retention_two_hash_shuffles(spark):
  from blueprint_oss_spark.ops.relational import cohort_retention
  plan = cohort_retention(spark, SF) \
      ._jdf.queryExecution().executedPlan().toString()
  assert 'Python' not in plan
  # exactly the two irreducible re-keyings: user_id for the
  # first-event window, (cohort_week, offset) for the distinct count —
  # the per-(cell, user) dedup aggregate rides the user_id clustering
  hashes = re.findall(r'Exchange hashpartitioning\((\w+)#', plan)
  assert hashes.count('user_id') == 1, plan
  assert len(hashes) == 2, plan


def test_cohort_retention_matches_pandas(spark):
  from blueprint_oss_spark.ops.relational import cohort_retention
  out = {(int(r['cohort_week']), int(r['week_offset'])): int(r['n_active'])
         for r in cohort_retention(spark, SF).collect()}

  ev = pd.read_parquet(f'{SF}/events.parquet')
  ev['week'] = ev.ts.astype('int64') // WEEK_US
  first = ev.groupby('user_id').week.min()
  ev['cohort'] = ev.user_id.map(first)
  expect = (ev.assign(offset=ev.week - ev.cohort)
            .groupby(['cohort', 'offset']).user_id.nunique())
  assert out == {(int(c), int(o)): int(n)
                 for (c, o), n in expect.items()}
  # offset 0 of each cohort contains every user of that cohort
  cohort_sizes = first.value_counts()
  for c, n in cohort_sizes.items():
    assert out[(int(c), 0)] == int(n)
