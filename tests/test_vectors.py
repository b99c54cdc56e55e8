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


def _bruteforce_groups(M, vec_ids, threshold):
  """Ground-truth semantic-dup groups: union-find over ALL pairs with
  cosine >= threshold, group = component min."""
  N = M / np.linalg.norm(M, axis=1, keepdims=True)
  S = N @ N.T
  parent = {int(v): int(v) for v in vec_ids}

  def find(i):
    while parent[i] != i:
      parent[i] = parent[parent[i]]
      i = parent[i]
    return i

  n = len(vec_ids)
  for a in range(n):
    for b in range(a + 1, n):
      if S[a, b] >= threshold:
        ra, rb = find(int(vec_ids[a])), find(int(vec_ids[b]))
        if ra != rb:
          parent[max(ra, rb)] = min(ra, rb)
  comps = {}
  for v in vec_ids:
    comps.setdefault(find(int(v)), []).append(int(v))
  return {i: min(ms) for ms in comps.values() for i in ms}


def test_semantic_dedup_single_cell_equals_bruteforce(spark, planted_dir):
  """n_cells=1 disables the clustering recall trade: every pair is
  in-cell, so the output must EQUAL brute-force connected components
  over the all-pairs cosine graph."""
  from blueprint_oss_spark.ops.vectors import semantic_dedup
  d, M, labels = planted_dir
  got = {r['vec_id']: (r['group'], r['keep'])
         for r in semantic_dedup(spark, d, threshold=0.95,
                                 n_cells=1).collect()}
  expect = _bruteforce_groups(M, sorted(got), 0.95)
  assert set(got) == set(expect)
  for i, g in expect.items():
    assert got[i] == (g, 1 if i == g else 0), (i, got[i], g)
  # the planted clusters actually deduplicate: ≥40 multi-member groups
  n_groups = sum(1 for i, g in expect.items() if i == g
                 and any(j != i and gg == g for j, gg in expect.items()))
  assert n_groups >= 40


def test_semantic_dedup_clustered_recall(spark, planted_dir):
  """At a realistic cell count the only recall loss allowed is a
  near-dup pair split across cells; merges must never cross a true
  group (precision 1: in-cell edges are exact cosine)."""
  from blueprint_oss_spark.ops.vectors import semantic_dedup
  d, M, labels = planted_dir
  got = {r['vec_id']: r['group']
         for r in semantic_dedup(spark, d, threshold=0.95,
                                 n_cells=8).collect()}
  expect = _bruteforce_groups(M, sorted(got), 0.95)
  # precision: members of one reported group belong to one true group
  for i, g in got.items():
    assert expect[i] == expect[g], (i, g)
  # recall: same-cluster pairs grouped together (k-means puts
  # near-identical vectors in the same cell on this corpus)
  true_pairs = {(a, b) for a in expect for b in expect
                if a < b and expect[a] == expect[b]}
  got_pairs = {(a, b) for a in got for b in got
               if a < b and got[a] == got[b]}
  recall = len(got_pairs & true_pairs) / len(true_pairs)
  assert recall >= 0.9, f'recall {recall:.3f}'


def test_semantic_dedup_hub_cap(spark, tmp_path):
  """Skew guard: 30 exact-identical vectors collapse into one k-means
  cell; max_bucket_size drops the hub cell BEFORE the quadratic
  expansion (members fall back to keep-themselves — the production
  follow-up is exact-hash dedup), while a small near-dup pair in
  another cell still deduplicates."""
  from blueprint_oss_spark.ops.vectors import semantic_dedup

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

  uncapped = {r['vec_id']: (r['group'], r['keep'])
              for r in semantic_dedup(spark, str(tmp_path),
                                      n_cells=4).collect()}
  assert uncapped[101] == (100, 0) and uncapped[100] == (100, 1)
  assert all(uncapped[i] == (0, 1 if i == 0 else 0) for i in range(30))

  capped = {r['vec_id']: (r['group'], r['keep'])
            for r in semantic_dedup(spark, str(tmp_path), n_cells=4,
                                    max_bucket_size=10).collect()}
  # hub cell dropped: members keep themselves; the small pair survives
  assert all(capped[i] == (i, 1) for i in range(30))
  assert capped[101] == (100, 0) and capped[100] == (100, 1)


def test_semantic_dedup_default_is_truthful(spark):
  """Production default: no planting, and on a corpus with no
  semantic dups every vector is its own keeper."""
  from blueprint_oss_spark.ops.vectors import semantic_dedup
  out = semantic_dedup(spark, '/root/testdata/sf0.001').collect()
  assert len(out) == 500
  assert all(r['vec_id'] == r['group'] and r['keep'] == 1 for r in out)
