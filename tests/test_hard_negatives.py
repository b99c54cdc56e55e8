"""Hard-negative mining (contrastive-training data prep): broadcast
anchor scoring, WindowGroupLimit per-anchor top-k, from-scratch DuckDB
oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from blueprint_oss_spark.ops import vectors as V

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

ORACLE = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, e AS ae
  FROM v WHERE vec_id % 50 = 0
), scored AS (
  SELECT a.anchor_id, a.anchor_label, v.vec_id AS neg_id,
         v.label AS neg_label,
         ROUND(list_dot_product(v.e, a.ae)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(a.ae, a.ae))), 6) AS cos6
  FROM v JOIN a ON v.label <> a.anchor_label
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos6 DESC, neg_id) AS rnk
  FROM scored)
SELECT anchor_id, anchor_label, rnk, neg_id, neg_label,
       ROUND(cos6, 4) AS cos_r
FROM ranked WHERE rnk <= 3
ORDER BY anchor_id, rnk
"""


@pytest.mark.parametrize('sf', [SF1, SF2])
def test_matches_duckdb_oracle(spark, sf):
  con = duckdb.connect()
  con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{sf}/embeddings.parquet')")
  oracle = con.execute(ORACLE).df()
  got = V.hard_negative_mining(spark, sf).toPandas()
  for c in got.columns:
    oracle[c] = oracle[c].astype(got[c].dtype)
  assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))
  assert len(got) > 0


def test_negatives_never_share_anchor_label(spark):
  got = V.hard_negative_mining(spark, SF1, k=5).toPandas()
  assert (got.anchor_label != got.neg_label).all()
  for _, grp in got.groupby('anchor_id'):
    assert list(grp.rnk) == list(range(1, len(grp) + 1))
    # hardest first: cosine non-increasing down the ranks
    assert (grp.sort_values('rnk').cos_r.diff().dropna() <= 1e-12).all()


def test_plan_uses_window_group_limit_and_broadcast(spark):
  df = V.hard_negative_mining(spark, SF1)
  plan = df._jdf.queryExecution().explainString(
      spark._jvm.org.apache.spark.sql.execution.ExplainMode
      .fromString('simple'))
  # map-side partial top-k per anchor (rank filter pushed below the
  # exchange) and the anchor dimension broadcast — the corpus never
  # shuffles for candidate generation
  assert plan.count('WindowGroupLimit') >= 2, plan
  assert 'BroadcastNestedLoopJoin' in plan or \
      'BroadcastHashJoin' in plan, plan
  assert 'CartesianProduct' not in plan
