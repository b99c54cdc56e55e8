"""Gap-based sessionization (ops/relational.sessionize).
Semantics are gate-checked against a from-scratch DuckDB recomputation
(scripts/check_correctness.py); these tests pin the one-data-shuffle
physical plan and independently recompute every session in pandas.
"""

import re

import pandas as pd

SF = '/root/testdata/sf0.01'
GAP_US = 30 * 60 * 1_000_000


def test_sessionize_single_data_shuffle(spark):
  from blueprint_oss_spark.ops.relational import sessionize
  plan = sessionize(spark, SF) \
      ._jdf.queryExecution().executedPlan().toString()
  hashes = re.findall(r'Exchange hashpartitioning\((\w+)#', plan)
  # one hash shuffle, on user_id; both windows + the groupBy ride it
  assert hashes == ['user_id'], plan
  # the only other Exchange is the presentation orderBy
  assert plan.count('Exchange') - plan.count(
      'Exchange rangepartitioning') == 1, plan
  assert 'Python' not in plan


def test_sessionize_matches_pandas(spark):
  from blueprint_oss_spark.ops.relational import sessionize
  out = sessionize(spark, SF).toPandas()
  assert out.equals(sessionize(spark, SF).toPandas())  # deterministic

  ev = pd.read_parquet(f'{SF}/events.parquet')
  ev['ts_us'] = ev.ts.astype('int64')  # naive micros == NTZ micros
  expect_rows = []
  for uid, g in ev.sort_values(['ts_us', 'event_id']).groupby('user_id'):
    sid = 0
    cur = None
    for r in g.itertuples():
      if cur is None or r.ts_us - cur['end'] > GAP_US:
        if cur is not None:
          expect_rows.append((uid, sid, cur))
        sid += 1
        cur = {'start': r.ts_us, 'end': r.ts_us, 'n': 0, 'clicks': 0,
               'val': 0.0}
      cur['end'] = r.ts_us
      cur['n'] += 1
      cur['clicks'] += int(r.event_type == 'click')
      cur['val'] += round(float(r.value), 6)
    expect_rows.append((uid, sid, cur))

  assert len(out) == len(expect_rows)
  got = {(int(r.user_id), int(r.session_id)):
         (int(r.start_us), int(r.end_us), int(r.duration_us),
          int(r.n_events), int(r.n_clicks), float(r.total_value))
         for r in out.itertuples()}
  for uid, sid, c in expect_rows:
    s = got[(uid, sid)]
    assert s[0] == c['start'] and s[1] == c['end']
    assert s[2] == c['end'] - c['start']
    assert s[3] == c['n'] and s[4] == c['clicks']
    assert abs(s[5] - c['val']) < 1e-6, (uid, sid, s, c)
  # gap invariant: consecutive sessions of a user start > 30min apart
  by_user = {}
  for (uid, sid), s in sorted(got.items()):
    if uid in by_user:
      assert s[0] - by_user[uid] > GAP_US
    by_user[uid] = s[1]
