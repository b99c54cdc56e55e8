"""Similarity-search recall on planted near-duplicates.

The driver's synthetic embeddings contain no near-dups (max pairwise
cosine ≈ 0.51), so the rows-only contract check cannot exercise recall.
Here a corpus with planted duplicate clusters validates, against
brute-force numpy ground truth:
  * embedding_near_dup_pairs — the LSH-blocked pair finder must not
    lose same-cluster pairs (sign-LSH assigns near-identical vectors to
    the same bucket with overwhelming probability);
  * cosine_topk_bruteforce / ann_topk_lsh — top-k neighbour sets.
"""

import numpy as np
import pytest


@pytest.fixture(scope='module')
def planted_dir(spark, tmp_path_factory):
  rng = np.random.default_rng(20260817)
  base = rng.normal(size=(40, 16))
  rows = []
  vid = 0
  for i in range(40):
    # 3 near-copies per base vector (tiny perturbation → cosine ≈ 1)
    for _ in range(3):
      v = base[i] + rng.normal(scale=0.002, size=16)
      rows.append((vid, f'cluster-{i}', [float(x) for x in v]))
      vid += 1
  # plus 80 isolated vectors
  for _ in range(80):
    rows.append((vid, 'noise', [float(x) for x in rng.normal(size=16)]))
    vid += 1
  d = tmp_path_factory.mktemp('emb')
  spark.createDataFrame(
      rows, 'vec_id long, label string, embedding array<float>') \
      .write.mode('overwrite').parquet(str(d / 'embeddings.parquet'))
  M = np.array([r[2] for r in rows], dtype=np.float64)
  return str(d), M, [r[1] for r in rows]


def _true_pairs(M, threshold):
  N = M / np.linalg.norm(M, axis=1, keepdims=True)
  S = N @ N.T
  iu = np.triu_indices_from(S, 1)
  return {(int(a), int(b)) for a, b in zip(*iu) if S[a, b] >= threshold}


def test_near_dup_pairs_recall(spark, planted_dir):
  from blueprint_oss_spark.ops.vectors import embedding_near_dup_pairs
  d, M, labels = planted_dir
  truth = _true_pairs(M, 0.95)
  assert len(truth) >= 40 * 3  # the planted clusters
  got = {(r['vec_a'], r['vec_b'])
         for r in embedding_near_dup_pairs(
             spark, d, threshold=0.95, n_planted=0).collect()}
  # LSH blocking may drop cross-bucket borderline pairs but must keep
  # near-identical ones; on this corpus near-identical = all of truth
  recall = len(got & truth) / len(truth)
  assert recall >= 0.95, f'recall {recall:.3f}'
  assert got <= truth  # no false positives (exact cosine inside block)


def test_near_dup_planted_equals_bruteforce_sf001(spark):
  """The driver-facing config (deterministic planted near-dups over the
  real sf0.01 table) must equal the exact brute-force O(n²) pair set —
  i.e. banded-LSH recall 1.0 on this corpus.  This is the same
  equality the DuckDB oracle re-checks independently per round."""
  import pyarrow.parquet as pq

  from blueprint_oss_spark.ops.vectors import embedding_near_dup_pairs

  sf = '/root/testdata/sf0.01'
  t = pq.read_table(f'{sf}/embeddings.parquet').to_pandas()
  E = np.array([np.asarray(e, dtype=np.float64)
                for e in t['embedding']])
  ids = t['vec_id'].to_numpy()
  allv = {int(i): E[n] for n, i in enumerate(ids)}
  for n, i in enumerate(ids):
    if i < 40:
      allv[int(i) + 1_000_000] = E[n] + 0.01
  keys = sorted(allv)
  N = np.array([allv[k] / np.linalg.norm(allv[k]) for k in keys])
  S = N @ N.T
  truth = {(keys[a], keys[b]): S[a, b]
           for a in range(len(keys)) for b in range(a + 1, len(keys))
           if S[a, b] >= 0.9}
  got = {(r['vec_a'], r['vec_b']): r['cos_r']
         for r in embedding_near_dup_pairs(
             spark, sf, plant_for_verification=True).collect()}
  assert set(got) == set(truth), (
      f'missing={set(truth) - set(got)} extra={set(got) - set(truth)}')
  assert len(got) >= 40
  for k, cos in got.items():
    assert abs(cos - truth[k]) < 5e-5, (k, cos, truth[k])


def test_near_dup_default_is_truthful(spark):
  """Without the verification flag the operator must report only pairs
  actually present in the table: no fabricated vec_ids, and on the
  near-dup-free sf0.01 corpus, no pairs at all."""
  from blueprint_oss_spark.ops.vectors import embedding_near_dup_pairs

  rows = embedding_near_dup_pairs(spark, '/root/testdata/sf0.01') \
      .collect()
  assert all(r['vec_a'] < 1_000_000 and r['vec_b'] < 1_000_000
             for r in rows), rows
  assert rows == [], rows


def test_topk_exact_vs_ann(spark, planted_dir):
  from blueprint_oss_spark.ops.vectors import (
      ann_topk_lsh, cosine_topk_bruteforce)
  d, M, labels = planted_dir
  N = M / np.linalg.norm(M, axis=1, keepdims=True)
  sims = N @ N[0]
  sims[0] = -1
  true_top = set(np.argsort(-np.round(sims, 6))[:3])

  exact = [r['vec_id'] for r in
           cosine_topk_bruteforce(spark, d, query_vec_id=0, k=3)
           .collect()]
  assert set(exact) == {int(x) for x in true_top}

  # ANN probes only the query's bucket: its siblings (vec 1, 2) are
  # near-identical so they share the bucket — the top near-dups survive
  ann = [r['vec_id'] for r in
         ann_topk_lsh(spark, d, query_vec_id=0, k=3).collect()]
  assert {1, 2} <= set(ann)


def test_ivf_topk_exactness_and_recall(spark):
  """IVF ANN: reported cosines are exact (verified against numpy);
  probing nprobe=4 of 16 cells recovers most of the true top-10 on the
  sf0.01 corpus; output is deterministic (seeded k-means, fixed Lloyd
  iterations)."""
  import pyarrow.parquet as pq

  from blueprint_oss_spark.ops.vectors import (
      cosine_topk_bruteforce, ivf_topk)

  sf = '/root/testdata/sf0.01'
  ivf = ivf_topk(spark, sf).collect()
  assert ivf == ivf_topk(spark, sf).collect()  # deterministic
  t = pq.read_table(f'{sf}/embeddings.parquet').to_pandas()
  E = {int(v): np.asarray(e, dtype=np.float64)
       for v, e in zip(t.vec_id, t.embedding)}
  q = E[0]
  for r in ivf:
    v = E[int(r['vec_id'])]
    cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
    assert abs(r['cosine_r'] - round(cos, 4)) <= 5e-5
  exact = {r['vec_id']
           for r in cosine_topk_bruteforce(spark, sf).collect()}
  got = {r['vec_id'] for r in ivf}
  assert len(got & exact) / len(exact) >= 0.7, (got, exact)


def test_pq_topk_exactness_and_recall(spark):
  """PQ ANN (ADC + exact refine): reported cosines are exact (the
  refine step recomputes them on full vectors); the ADC shortlist of
  40 from m=8, ksub=16 codebooks recovers most of the true top-10;
  output is deterministic (seeded per-subspace k-means)."""
  import pyarrow.parquet as pq

  from blueprint_oss_spark.ops.vectors import (
      cosine_topk_bruteforce, pq_topk)

  sf = '/root/testdata/sf0.01'
  out = pq_topk(spark, sf).collect()
  assert out == pq_topk(spark, sf).collect()  # deterministic
  t = pq.read_table(f'{sf}/embeddings.parquet').to_pandas()
  E = {int(v): np.asarray(e, dtype=np.float64)
       for v, e in zip(t.vec_id, t.embedding)}
  q = E[0]
  for r in out:
    v = E[int(r['vec_id'])]
    cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
    assert abs(r['cosine_r'] - round(cos, 4)) <= 5e-5
  exact = {r['vec_id']
           for r in cosine_topk_bruteforce(spark, sf).collect()}
  got = {r['vec_id'] for r in out}
  assert len(got & exact) / len(exact) >= 0.7, (got, exact)


def test_pq_codebooks_deterministic_and_shaped():
  from blueprint_oss_spark.ops.vectors import train_pq_codebooks
  rng = np.random.default_rng(3)
  X = rng.normal(size=(200, 64))
  B1 = train_pq_codebooks(X, m=8, ksub=16)
  B2 = train_pq_codebooks(X, m=8, ksub=16)
  assert B1.shape == (8, 16, 8)
  assert np.array_equal(B1, B2)
  # an exact duplicate of a training vector encodes to the centroid
  # nearest its own subvectors in every subspace — codes of identical
  # vectors are identical by construction (pure function of the vector)


def test_embedding_max_bucket_size_caps_hub_buckets(spark, tmp_path):
  """Skew guard (mirror of minhash_shingles' planted-hub test): 30
  identical vectors collapse into ONE LSH bucket on every band — a
  30·29/2 quadratic pair expansion in one task; with max_bucket_size
  the hub bucket is dropped BEFORE the expansion while a small
  two-member near-dup bucket keeps its pair."""
  from blueprint_oss_spark.ops.vectors import embedding_near_dup_pairs

  rng = np.random.default_rng(42)
  hub = rng.normal(size=16)
  pair = rng.normal(size=16)
  rows = [(i, 'hub', [float(x) for x in hub]) for i in range(30)]
  rows.append((100, 'pair', [float(x) for x in pair]))
  rows.append((101, 'pair',
               [float(x) for x in pair
                + rng.normal(scale=0.001, size=16)]))
  rows += [(200 + j, 'noise', [float(x) for x in rng.normal(size=16)])
           for j in range(20)]
  spark.createDataFrame(
      rows, 'vec_id long, label string, embedding array<float>') \
      .write.parquet(str(tmp_path / 'embeddings.parquet'))

  uncapped = {(r['vec_a'], r['vec_b'])
              for r in embedding_near_dup_pairs(
                  spark, str(tmp_path)).collect()}
  assert (100, 101) in uncapped
  assert len(uncapped) == 30 * 29 // 2 + 1

  capped = {(r['vec_a'], r['vec_b'])
            for r in embedding_near_dup_pairs(
                spark, str(tmp_path), max_bucket_size=10).collect()}
  assert capped == {(100, 101)}
