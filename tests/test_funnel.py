"""Ordered funnel analysis (ops/relational.funnel_analysis).
Gate-checked against a from-scratch DuckDB window recomputation at
sf0.01 and sf0.1; these tests pin the one-hash-shuffle plan and
independently recompute every user's funnel sequentially in pandas.
"""

import re

import pandas as pd

SF = '/root/testdata/sf0.01'


def test_funnel_single_hash_shuffle(spark):
  from blueprint_oss_spark.ops.relational import funnel_analysis
  plan = funnel_analysis(spark, SF) \
      ._jdf.queryExecution().executedPlan().toString()
  hashes = re.findall(r'Exchange hashpartitioning\((\w+)#', plan)
  assert hashes == ['user_id'], plan
  assert 'Python' not in plan


def test_funnel_matches_sequential_pandas(spark):
  from blueprint_oss_spark.ops.relational import funnel_analysis
  out = {int(r['user_id']):
         (r['first_view_us'], r['first_click_us'],
          r['first_purchase_us'], r['stage_reached'])
         for r in funnel_analysis(spark, SF).collect()}

  ev = pd.read_parquet(f'{SF}/events.parquet')
  ev['ts_us'] = ev.ts.astype('int64')
  expect = {}
  for uid, g in ev.sort_values(['ts_us', 'event_id']).groupby('user_id'):
    t1 = t2 = t3 = None
    for r in g.itertuples():
      if r.event_type == 'view' and t1 is None:
        t1 = r.ts_us
      elif (r.event_type == 'click' and t2 is None
            and t1 is not None and r.ts_us > t1):
        t2 = r.ts_us
      elif (r.event_type == 'purchase' and t3 is None
            and t2 is not None and r.ts_us > t2):
        t3 = r.ts_us
    stage = 3 if t3 is not None else 2 if t2 is not None \
        else 1 if t1 is not None else 0
    expect[int(uid)] = (t1, t2, t3, stage)

  assert out == expect
  # the dense corpus funnels every user fully; check the ordering
  # invariant the operator exists for (strictly increasing stage times)
  for t1, t2, t3, stage in out.values():
    assert stage == 3 and t1 < t2 < t3


def test_funnel_partial_depths(spark):
  """Stage 0/1/2 and the ordering constraint (click BEFORE the first
  view must not count) on a hand-built table."""
  import datetime

  from blueprint_oss_spark.ops import relational as R
  base = datetime.datetime(2026, 1, 1)
  t = lambda s: base + datetime.timedelta(seconds=s)
  rows = [
      # u1: click precedes any view -> that click must NOT count;
      # later click qualifies, no purchase after it -> stage 2
      (1, 1, 'click', t(0)), (2, 1, 'view', t(10)),
      (3, 1, 'purchase', t(5)),  # before view: ignored
      (4, 1, 'click', t(20)),
      # u2: view only -> stage 1
      (5, 2, 'view', t(0)),
      # u3: no funnel event types -> stage 0
      (6, 3, 'error', t(0)),
      # u4: full path -> stage 3
      (7, 4, 'view', t(0)), (8, 4, 'click', t(1)),
      (9, 4, 'purchase', t(2)),
  ]
  df = spark.createDataFrame(
      rows, 'event_id long, user_id long, event_type string, '
            'ts timestamp_ntz')
  import tempfile
  with tempfile.TemporaryDirectory() as d:
    df.write.parquet(f'{d}/events.parquet')
    got = {int(r['user_id']): r['stage_reached']
           for r in R.funnel_analysis(spark, d).collect()}
  assert got == {1: 2, 2: 1, 3: 0, 4: 3}, got
