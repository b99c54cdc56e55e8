"""Prototype-based cluster-balanced selection (Sorscher et al. 2022):
seeded k-means cells, per-cell keep-hardest budget, verified against a
full sequential pure-python recomputation (the build_oracles verifier
logic, inlined here against sf0.001).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from blueprint_oss_spark.ops.vectors import (cluster_balanced_select,
                                             train_ivf_centroids)

SF1 = '/root/testdata/sf0.001'


def _python_expect(sf_dir, n_cells=16, per_cell=20):
  t = pq.read_table(f'{sf_dir}/embeddings.parquet').to_pandas()
  E = {int(i): [float(x) for x in np.asarray(e, dtype=np.float64)]
       for i, e in zip(t.vec_id, t.embedding)}
  sample = np.array([E[i] for i in sorted(E)])
  C = train_ivf_centroids(sample, n_cells)
  bycell = {}
  for i in sorted(E):
    s = 0.0
    for x in E[i]:
      s += x * x
    nv = [x / s ** 0.5 for x in E[i]]
    dots = []
    for c in C:
      d = 0.0
      for x, w in zip(nv, c):
        d += x * float(w)
      dots.append(d)
    m = max(dots)
    bycell.setdefault(dots.index(m) + 1, []).append((round(m, 6), i))
  expect = {}
  for cell, ms in bycell.items():
    for rank, (cos6, i) in enumerate(sorted(ms), 1):
      expect[i] = (cell, cos6, rank, 1 if rank <= per_cell else 0)
  return expect


def test_matches_python_recomputation(spark):
  expect = _python_expect(SF1)
  got = cluster_balanced_select(spark, SF1).collect()
  assert len(got) == len(expect)
  for r in got:
    assert (r['cell'], r['cos_c'], r['cell_rank'],
            r['selected']) == expect[r['vec_id']], r


def test_per_cell_budget_and_hardest_first(spark):
  pdf = cluster_balanced_select(spark, SF1, per_cell=5).toPandas()
  for cell, grp in pdf.groupby('cell'):
    assert grp.selected.sum() == min(5, len(grp))
    sel_max = grp[grp.selected == 1].cos_c.max()
    uns_min = grp[grp.selected == 0].cos_c.min() if \
        (grp.selected == 0).any() else float('inf')
    # selected examples are the FARTHEST from the prototype
    assert sel_max <= uns_min + 1e-12
    # ranks are a permutation of 1..n within the cell
    assert sorted(grp.cell_rank) == list(range(1, len(grp) + 1))


def test_deterministic_across_runs(spark):
  # round-6 ordering key + vec_id tie-break: two independent runs
  # (fresh plans, fresh shuffles) produce the identical frame
  a = cluster_balanced_select(spark, SF1).toPandas()
  b = cluster_balanced_select(spark, SF1).toPandas()
  assert a.equals(b)
