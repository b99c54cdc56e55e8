"""TrustRank (Gyöngyi et al. 2004): pagerank's `seeds=`
personalization — teleport restricted to a trusted seed set, ranks
started at the trust vector, exact-integer like the uniform case.

Verification: FULL sequential python recomputation (same DIV floors,
same fixed-point), bit-exact mass conservation under the documented
divisibility condition, the all-nodes-seeds ≡ uniform-pagerank
identity, zero-rank for pages trust cannot reach, and repartition
determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.graph import _PR_DEGREES, _PR_SCALE, pagerank

SF1 = '/root/testdata/sf0.001'


def _py_edges(n):
  edges = []
  for i in range(n):
    deg = _PR_DEGREES[i % 3]
    for j in range(1, deg + 1):
      t = (17 % n) if (i % 5 == 0 and j == 1) else (i * 31 + j * 97) % n
      if t == i:
        t = (t + 1) % n
      edges.append((i, t, deg))
  return edges


def _py_trustrank(n, seeds, iterations=6):
  s_pow = _PR_SCALE ** iterations
  n_seeds = len(seeds)
  per_tele = (3 * n * s_pow) // (20 * n_seeds)
  per_init = (n * s_pow) // n_seeds
  num = {u: (per_init if u in seeds else 0) for u in range(n)}
  edges = _py_edges(n)
  for _ in range(iterations):
    flow = {u: 0 for u in range(n)}
    for src, dst, deg in edges:
      flow[dst] += (num[src] * 17) // (20 * deg)
    num = {u: (per_tele if u in seeds else 0) + flow[u]
           for u in range(n)}
  return num


def test_matches_python_recomputation(spark):
  n = spark.read.parquet(f'{SF1}/documents.parquet').count()
  seeds = {0, 5}
  exp = _py_trustrank(n, seeds)
  got = {r['doc_id']: r['pr_num']
         for r in pagerank(spark, SF1, seeds=sorted(seeds)).collect()}
  assert got == exp


def test_mass_conserved_when_divisibility_holds(spark):
  n = spark.read.parquet(f'{SF1}/documents.parquet').count()
  # n_seeds = 2 divides 4*n (n = 50): teleport and init are exact
  assert (12 * n * _PR_SCALE ** 5) % 2 == 0
  out = pagerank(spark, SF1, seeds=[0, 5])
  total = out.agg(F.sum('pr_num')).first()[0]
  assert total == n * _PR_SCALE ** 6


def test_all_nodes_seeded_equals_uniform(spark):
  uni = {r['doc_id']: r['pr_num']
         for r in pagerank(spark, SF1).collect()}
  n = len(uni)
  tr = {r['doc_id']: r['pr_num']
        for r in pagerank(spark, SF1, seeds=list(range(n))).collect()}
  assert tr == uni


def test_unreachable_pages_get_zero(spark):
  # tiny explicit graph: 0 -> 1 -> 2, island 3 -> 4; seed {0}
  docs = spark.createDataFrame([(i,) for i in range(5)], 'doc_id long')
  edges = spark.createDataFrame(
      [(0, 1, 1), (1, 2, 1), (3, 4, 1)],
      'src long, dst long, out_deg long')
  out = {r['doc_id']: r['pr_num']
         for r in pagerank(spark, SF1, docs=docs, edges=edges,
                           seeds=[0]).collect()}
  assert out[3] == 0 and out[4] == 0      # no trust path from seed
  assert out[0] > 0 and out[1] > 0 and out[2] > 0


def test_seed_frame_and_repartition_determinism(spark):
  seeds_df = spark.createDataFrame([(0,), (5,)], 'doc_id long')
  a = {r['doc_id']: r['pr_num']
       for r in pagerank(spark, SF1, seeds=seeds_df).collect()}
  docs = spark.read.parquet(f'{SF1}/documents.parquet') \
      .repartition(13, 'doc_id')
  b = {r['doc_id']: r['pr_num']
       for r in pagerank(spark, SF1, docs=docs,
                         seeds=[5, 0, 5]).collect()}
  assert a == b


def test_empty_seed_set_raises(spark):
  with pytest.raises(ValueError):
    pagerank(spark, SF1, seeds=[])
