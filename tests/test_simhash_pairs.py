"""SimHash banded near-dup pairs (ops/textops.simhash_near_dup_pairs).
Gate-checked against an exact all-pairs DuckDB recomputation over the
verified signature snapshot; these tests pin the plan shape and prove
recall 1.0 vs a brute-force pandas recomputation from the signatures.
"""

import re

SF = '/root/testdata/sf0.01'


def test_simhash_pairs_match_bruteforce(spark):
  from blueprint_oss_spark.ops.textops import (
      simhash64, simhash_near_dup_pairs)
  sigs = {r['doc_id']: r['simhash']
          for r in simhash64(spark, SF).collect()}
  ids = sorted(sigs)
  expect = []
  for i, a in enumerate(ids):
    for b in ids[i + 1:]:
      h = bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count('1')
      if h <= 3:
        expect.append((a, b, h))
  got = [(r['doc_a'], r['doc_b'], r['hamming'])
         for r in simhash_near_dup_pairs(spark, SF).collect()]
  # recall 1.0 AND no false positives: banding is a pure blocking
  # step, the exact hamming filter decides membership
  assert got == sorted(expect), (got[:5], sorted(expect)[:5])
  assert len(got) > 0  # the corpus's exact dups guarantee hamming-0 hits


def test_simhash_pairs_plan_shape(spark):
  from blueprint_oss_spark.ops.textops import simhash_near_dup_pairs
  plan = simhash_near_dup_pairs(spark, SF) \
      ._jdf.queryExecution().executedPlan().toString()
  assert 'Python' not in plan
  # the signature pass is map-side: nothing shuffles on doc_id (no
  # rangepartitioning under the join from simhash64's presentation
  # sort), and the blocking join keys on the band only — as a
  # broadcast at gate scale (AQE/stats) or hashpartitioning(band) at
  # scale.  The only rangepartitioning is the final presentation sort.
  # (the multi-key hashpartitioning(doc_a, doc_b, hamming) is the
  # distinct() dedup of multi-band hits, which runs AFTER the hamming
  # filter and so shuffles only true near-dup pairs)
  first_keys = set(re.findall(r'Exchange hashpartitioning\((\w+)#', plan))
  assert 'doc_id' not in first_keys, plan
  assert ('BroadcastHashJoin [band' in plan
          or 'band' in first_keys), plan
  assert plan.count('Exchange rangepartitioning') <= 1, plan
