"""pagerank — exact-integer link-graph quality over the synthesized
web link graph.

Verification strategy (same as test_url_curation / test_c4_line_clean):
a FULL pure-python recomputation — synthesize the same deterministic
edges, run the same exact-BIGINT fixed-point iterations sequentially —
and compare every column of every row.  Plus the structural guarantees
the operator's docstring claims: exact mass conservation, the planted
hub's skew actually present, a map-side-combinable (partial-SUM) flow
aggregation with no per-key array collection, and determinism under
repartitioning through the edges= seam.
"""

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.graph import (_PR_DEGREES, _PR_SCALE,
                                           link_graph, pagerank)

SF_DIR = '/root/testdata/sf0.001'
T = 6


def _py_edges(n):
  edges = []
  for i in range(n):
    deg = _PR_DEGREES[i % 3]
    for j in range(1, deg + 1):
      if i % 5 == 0 and j == 1:
        t = 17 % n
      else:
        t = (i * 31 + j * 97) % n
      if t == i:
        t = (t + 1) % n
      edges.append((i, t, deg))
  return edges


def _py_pagerank(n, edges, iterations=T):
  s_pow = _PR_SCALE ** iterations
  teleport = 3 * s_pow // 20
  num = {i: s_pow for i in range(n)}
  for _ in range(iterations):
    flow = {i: 0 for i in range(n)}
    for src, dst, deg in edges:
      flow[dst] += (num[src] * 17) // (20 * deg)
    num = {i: teleport + flow[i] for i in range(n)}
  return num


@pytest.fixture(scope='module')
def result(spark):
  df = pagerank(spark, SF_DIR, iterations=T)
  return {r['doc_id']: r for r in df.collect()}


@pytest.fixture(scope='module')
def n_docs(spark):
  return spark.read.parquet(f'{SF_DIR}/documents.parquet').count()


def test_matches_sequential_recomputation(result, n_docs):
  edges = _py_edges(n_docs)
  expect = _py_pagerank(n_docs, edges)
  out_deg = {i: _PR_DEGREES[i % 3] for i in range(n_docs)}
  in_deg = {i: 0 for i in range(n_docs)}
  for _, dst, _ in edges:
    in_deg[dst] += 1
  denom = float(n_docs * _PR_SCALE ** T)
  assert set(result) == set(range(n_docs))
  for i in range(n_docs):
    row = result[i]
    assert row['pr_num'] == expect[i], i
    assert row['out_deg'] == out_deg[i], i
    assert row['in_deg'] == in_deg[i], i
    assert row['pagerank'] == expect[i] / denom, i


def test_mass_conserved_exactly(result, n_docs):
  # no dangling nodes by construction => the integer update conserves
  # total rank to the last bit (the docstring's induction, observed)
  assert sum(r['pr_num'] for r in result.values()) \
      == n_docs * _PR_SCALE ** T


def test_hub_skew_present_and_ranked_up(result, n_docs):
  hub = 17 % n_docs
  hub_in = result[hub]['in_deg']
  # every fifth page redirects its first link to the hub (minus any
  # self-remap noise); the hub must dominate the in-degree distribution
  assert hub_in >= n_docs // 5 - 1
  others = [r['in_deg'] for i, r in result.items() if i != hub]
  assert hub_in > max(others)
  assert result[hub]['pr_num'] == max(r['pr_num']
                                      for r in result.values())


def test_flow_aggregation_is_partial_sum(spark):
  # the hub-safety claim: the per-target reduction must be a plain SUM
  # with a map-side partial before the exchange, never a per-key array
  d = spark.read.parquet(f'{SF_DIR}/documents.parquet') \
      .select(F.col('doc_id').cast('long').alias('doc_id'))
  n = d.count()
  edges = link_graph(d, n)
  ranks = d.select(F.col('doc_id').alias('node'),
                   F.lit(_PR_SCALE ** T).cast('long').alias('num'))
  flows = (ranks.join(edges, ranks.node == edges.src)
           .select(F.col('dst').alias('node'),
                   F.expr('(num * 17L) DIV (20L * out_deg)').alias('c'))
           .groupBy('node').agg(F.sum('c').alias('flow')))
  plan = flows._jdf.queryExecution().executedPlan().toString()
  assert 'partial_sum' in plan
  assert 'collect_list' not in plan and 'collect_set' not in plan


def test_edges_seam_and_repartition_determinism(spark, n_docs):
  # caller-supplied edge list without out_deg (derived by count), and
  # the answer must not depend on the physical partitioning
  d = spark.read.parquet(f'{SF_DIR}/documents.parquet')
  e_rows = [(i, (i + 1) % n_docs) for i in range(n_docs)] + \
           [(i, 17 % n_docs) for i in range(0, n_docs, 3)]
  e = spark.createDataFrame(e_rows, 'src long, dst long')
  a = pagerank(spark, SF_DIR, iterations=3, edges=e).collect()
  b = pagerank(spark, SF_DIR, iterations=3,
               docs=d.repartition(7), edges=e.repartition(5)).collect()
  key = lambda rows: sorted((r['doc_id'], r['pr_num'], r['in_deg'],
                             r['out_deg'], r['pagerank']) for r in rows)
  assert key(a) == key(b)
  # seam out-degrees (2 for every third node) don't divide the scale
  # budget evenly everywhere — result must still be mass-bounded
  total = sum(r['pr_num'] for r in a)
  assert total <= n_docs * _PR_SCALE ** 3


def test_empty_corpus_yields_empty_result(spark):
  # review fix: link_graph's Python-level 17 % n raised
  # ZeroDivisionError at plan-build time on an empty documents frame
  empty = spark.createDataFrame([], 'doc_id long')
  assert pagerank(spark, '', docs=empty, iterations=2).count() == 0
