"""Embedding-level eval-set decontamination: banded sign-LSH candidate
blocking, exact cosine on collisions, brute-force DuckDB oracle (the
LSH-blocked output must equal the all-pairs truth on this corpus).
"""

from __future__ import annotations

import duckdb
import pytest

from blueprint_oss_spark.ops import vectors as V

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), ev AS (
  SELECT vec_id, e FROM v WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 1000000, list_transform(e, x -> x + 0.01)
  FROM v WHERE vec_id < 40
), tr AS (SELECT vec_id, e FROM v WHERE vec_id % 10 <> 0),
scored AS (
  SELECT t.vec_id AS train_id, ev.vec_id AS eval_id,
         ROUND(list_dot_product(t.e, ev.e)
               / (sqrt(list_dot_product(t.e, t.e))
                  * sqrt(list_dot_product(ev.e, ev.e))), 6) AS cos6
  FROM tr t, ev
), hits AS (SELECT * FROM scored WHERE cos6 >= 0.9),
ranked AS (
  SELECT train_id, eval_id, cos6,
         row_number() OVER (PARTITION BY train_id
                            ORDER BY cos6 DESC, eval_id) AS rnk
  FROM hits)
SELECT t.vec_id,
       CAST(r.train_id IS NOT NULL AS INT) AS contaminated,
       CAST(r.eval_id AS BIGINT) AS best_eval_id,
       ROUND(r.cos6, 4) AS best_cos_r
FROM tr t LEFT JOIN (SELECT * FROM ranked WHERE rnk = 1) r
  ON t.vec_id = r.train_id
ORDER BY t.vec_id
"""


def _compare(got, oracle):
  assert len(got) == len(oracle)
  for c in got.columns:
    a = got[c].reset_index(drop=True)
    b = oracle[c].reset_index(drop=True)
    eq = (a.isna() & b.isna()) | (a == b)
    assert eq.all(), (c, got[~eq.values].head(), oracle[~eq.values].head())


@pytest.mark.parametrize('sf', [SF1, SF2])
def test_matches_bruteforce_oracle(spark, sf):
  con = duckdb.connect()
  con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{sf}/embeddings.parquet')")
  oracle = con.execute(ORACLE).df()
  got = V.semantic_decontaminate(
      spark, sf, plant_for_verification=True).toPandas()
  assert list(got.columns) == ['vec_id', 'contaminated', 'best_eval_id',
                               'best_cos_r']
  _compare(got, oracle)
  # planted originals 1..39 (minus the 4 whose original IS an eval row)
  # must come back contaminated — the check is not vacuous
  assert got.contaminated.sum() == 36


def test_production_default_plants_nothing(spark):
  got = V.semantic_decontaminate(spark, SF1).toPandas()
  # the gate corpus carries no train-eval near-dups: every verdict is
  # clean and no fabricated eval ids appear
  assert got.contaminated.sum() == 0
  assert got.best_eval_id.isna().all()
  assert got.best_cos_r.isna().all()


def test_bucket_cap_only_drops(spark):
  full = V.semantic_decontaminate(
      spark, SF1, plant_for_verification=True).toPandas()
  capped = V.semantic_decontaminate(
      spark, SF1, plant_for_verification=True,
      max_bucket_size=2).toPandas()
  # capping eval bucket lists can only LOSE candidates, never invent
  assert len(capped) == len(full)
  f = set(full[full.contaminated == 1].vec_id)
  c = set(capped[capped.contaminated == 1].vec_id)
  assert c <= f
