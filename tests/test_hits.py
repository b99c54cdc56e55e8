"""Exact-integer HITS: FULL sequential python recomputation over the
synthesized link graph (same alternating update + fixed-integer-mass
rescale); planted-hub authority dominance; mass accounting (floored
remainders bounded); repartition determinism; edges= seam with a
hand-built graph; empty-graph degradation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops import graph as G

SF1 = '/root/testdata/sf0.001'

MASS = 10 ** 9
IT = 4


def _replica(n, edges, iterations=IT, mass=MASS):
  hub = {i: mass // n for i in range(n)}
  auth = {}

  def rescale(d):
    tot = sum(d.values())
    if tot <= 0:
      return {k: 0 for k in d}
    return {k: v * mass // tot for k, v in d.items()}

  for _ in range(iterations):
    raw_a: dict = {}
    for s, t in edges:
      raw_a[t] = raw_a.get(t, 0) + hub.get(s, 0)
    auth = rescale(raw_a)
    raw_h: dict = {}
    for s, t in edges:
      raw_h[s] = raw_h.get(s, 0) + auth.get(t, 0)
    hub = rescale(raw_h)
  return hub, auth


def _synth_edges(n):
  degs = (1, 2, 4)
  out = []
  for i in range(n):
    d = degs[i % 3]
    for j in range(1, d + 1):
      t = 17 % n if (i % 5 == 0 and j == 1) else (i * 31 + j * 97) % n
      if t == i:
        t = (t + 1) % n
      out.append((i, t))
  return out


@pytest.fixture(scope='module')
def result(spark):
  return {r['doc_id']: r for r in G.hits(spark, SF1).collect()}


def test_matches_python_replica(spark, result):
  n = 500
  hub, auth = _replica(n, _synth_edges(n))
  for i in range(n):
    r = result[i]
    assert r['hub_num'] == hub.get(i, 0), i
    assert r['auth_num'] == auth.get(i, 0), i
    assert r['hub'] == hub.get(i, 0) / MASS
    assert r['auth'] == auth.get(i, 0) / MASS


def test_planted_hub_dominates_authority(spark, result):
  hub_page = max(result.values(), key=lambda r: r['auth_num'])
  assert hub_page['doc_id'] == 17
  others = sorted((r['auth_num'] for r in result.values()
                   if r['doc_id'] != 17), reverse=True)
  assert hub_page['auth_num'] > 50 * others[0]


def test_mass_accounting(spark, result):
  nonzero_h = sum(1 for r in result.values() if r['hub_num'] > 0)
  nonzero_a = sum(1 for r in result.values() if r['auth_num'] > 0)
  th = sum(r['hub_num'] for r in result.values())
  ta = sum(r['auth_num'] for r in result.values())
  assert MASS - nonzero_h < th <= MASS
  assert MASS - nonzero_a < ta <= MASS


def test_repartition_invariant(spark, result):
  docs = spark.read.parquet(f'{SF1}/documents.parquet').repartition(13)
  got = {r['doc_id']: (r['hub_num'], r['auth_num'])
         for r in G.hits(spark, SF1, docs=docs).collect()}
  assert got == {k: (v['hub_num'], v['auth_num'])
                 for k, v in result.items()}


def test_edges_seam_hand_graph(spark):
  # 0 and 1 both point at 2; 2 points at 3.  2 is the authority;
  # 0 and 1 are the (equal) hubs; 3 has no out-links -> hub 0.
  docs = spark.createDataFrame([(i,) for i in range(4)], 'doc_id long')
  edges = spark.createDataFrame([(0, 2), (1, 2), (2, 3)],
                                'src long, dst long')
  out = {r['doc_id']: r for r in
         G.hits(spark, SF1, docs=docs, edges=edges).collect()}
  hub, auth = _replica(4, [(0, 2), (1, 2), (2, 3)])
  for i in range(4):
    assert out[i]['hub_num'] == hub.get(i, 0)
    assert out[i]['auth_num'] == auth.get(i, 0)
  assert out[2]['auth_num'] > out[3]['auth_num'] > 0
  assert out[0]['hub_num'] == out[1]['hub_num'] > out[2]['hub_num']
  assert out[3]['hub_num'] == 0


def test_empty_graph_degrades(spark):
  docs = spark.createDataFrame([(i,) for i in range(3)], 'doc_id long')
  edges = spark.createDataFrame([], 'src long, dst long')
  out = G.hits(spark, SF1, docs=docs, edges=edges).collect()
  assert all(r['hub_num'] == 0 and r['auth_num'] == 0 for r in out)
