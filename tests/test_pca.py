"""PCA over the embedding table: exact-integer covariance accumulation
(truncated micro-units, (i,j)-keyed word-count reduction), driver-side
eigh on the bounded d×d model with deterministic sign fixing, and a
pinned-fold projection the python recomputation reproduces
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from blueprint_oss_spark.ops import vectors as V

SF1 = '/root/testdata/sf0.001'


def _python_pca(sf_dir, k):
  tb = pq.read_table(f'{sf_dir}/embeddings.parquet').to_pandas()
  d = len(tb.embedding[0])
  n = len(tb)
  vi = [[int(float(x) * 1e6) for x in e] for e in tb.embedding]
  sx = [sum(v[i] for v in vi) for i in range(d)]
  sxx = [[sum(v[i] * v[j] for v in vi) for j in range(d)]
         for i in range(d)]
  cov = np.array([[float(n * sxx[i][j] - sx[i] * sx[j])
                   for j in range(d)] for i in range(d)]) \
      / (float(n) * n * 1e12)
  w, v = np.linalg.eigh(cov)
  order = np.argsort(w)[::-1][:k]
  comps, eigvals = [], []
  for c in order:
    vec = v[:, c].copy()
    piv = int(np.argmax(np.abs(vec)))
    if vec[piv] < 0:
      vec = -vec
    comps.append([float(x) for x in vec])
    eigvals.append(float(w[c]))
  means = [sx[i] / (float(n) * 1e6) for i in range(d)]
  return tb, means, comps, eigvals


def test_train_matches_exact_integer_recomputation(spark):
  means, comps, eigvals = V.pca_train(spark, SF1, k=4)
  _, pm, pc, pe = _python_pca(SF1, 4)
  assert means == pm
  assert comps == pc
  assert eigvals == pe
  # descending variance, deterministic sign: pivot component positive
  assert eigvals == sorted(eigvals, reverse=True)
  for vec in comps:
    assert vec[int(np.argmax(np.abs(vec)))] > 0


def test_projection_is_bit_equal_pinned_fold(spark):
  model = V.pca_train(spark, SF1, k=3)
  got = V.pca_project(spark, SF1, model=model).toPandas()
  tb, pm, pc, _ = _python_pca(SF1, 3)
  emb = {int(r.vec_id): [float(x) for x in r.embedding]
         for r in tb.itertuples()}
  assert len(got) == len(tb)
  for r in got.itertuples():
    e = emb[int(r.vec_id)]
    for c in range(3):
      acc = 0.0
      for i in range(len(e)):
        acc = acc + (e[i] - pm[i]) * pc[c][i]
      assert acc == r.proj[c], (r.vec_id, c)


def test_projection_plan_is_one_codegen_scan(spark):
  model = V.pca_train(spark, SF1, k=2)
  df = V.pca_project(spark, SF1, model=model)
  plan = df._jdf.queryExecution().executedPlan().toString()
  # the presentation orderBy is the only exchange; no Python anywhere
  assert plan.count('hashpartitioning') == 0
  assert 'EvalPython' not in plan


def test_k_bounds(spark):
  with pytest.raises(ValueError):
    V.pca_train(spark, SF1, k=0)
  with pytest.raises(ValueError):
    V.pca_train(spark, SF1, k=65)


def test_top_component_captures_most_variance(spark):
  # project onto the full basis: per-component sample variance must
  # be (close to) the eigenvalue and ordered descending
  model = V.pca_train(spark, SF1, k=8)
  got = V.pca_project(spark, SF1, model=model).toPandas()
  P = np.array([list(p) for p in got.proj])
  var = P.var(axis=0)
  assert list(var) == sorted(var, reverse=True)
  for c in range(8):
    assert abs(var[c] - model[2][c]) < 5e-4
