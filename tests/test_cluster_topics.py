"""Cluster labeling (top terms per embedding cell): from-scratch
DuckDB oracle over a synthetic assignment (window rank + global
context rollup, stopwords excluded); composition smoke over the real
kmeans_assign; determinism tie-break; WindowGroupLimit plan pin; the
context rollup must not re-scan the corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops import vectors as V
from blueprint_oss_spark.ops.textops import STOPWORDS_EN

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'


def _oracle(sf, mod, k_terms=5):
  sl = ', '.join(f"'{w}'" for w in STOPWORDS_EN)
  return duckdb.sql(f"""
    WITH tc AS (
      SELECT doc_id % {mod} AS cell, unnest(list_filter(
               string_split(text, ' '),
               x -> len(x) > 0 AND x NOT IN ({sl}))) AS term
      FROM read_parquet('{sf}/documents.parquet')
    ), counts AS (
      SELECT cell, term, CAST(COUNT(*) AS BIGINT) AS n_in_cell
      FROM tc GROUP BY cell, term
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cell
                 ORDER BY n_in_cell DESC, term) AS rnk
      FROM counts
    ), ctx AS (
      SELECT term, CAST(SUM(n_in_cell) AS BIGINT) AS n_global,
             CAST(COUNT(*) AS BIGINT) AS n_cells_with
      FROM counts GROUP BY term
    )
    SELECT r.cell, CAST(r.rnk AS INT) AS rnk, r.term, r.n_in_cell,
           c.n_global, c.n_cells_with
    FROM ranked r JOIN ctx c ON c.term = r.term
    WHERE r.rnk <= {k_terms}
    ORDER BY r.cell, r.rnk""").fetchall()


@pytest.mark.parametrize('sf,mod', [(SF1, 4), (SF2, 7)])
def test_matches_duckdb_with_synthetic_cells(spark, sf, mod):
  docs = spark.read.parquet(f'{sf}/documents.parquet')
  a = docs.select(F.col('doc_id').alias('vec_id'),
                  (F.col('doc_id') % mod).cast('int').alias('cell'))
  got = [tuple(r) for r in
         V.cluster_topics(spark, sf, assignments=a).collect()]
  assert got == _oracle(sf, mod)


def test_composes_with_kmeans_assign(spark):
  out = V.cluster_topics(spark, SF1).collect()
  cells = {r['cell'] for r in out}
  assert len(cells) >= 8  # the 16-cell Lloyd run populates cells
  for r in out:
    assert 1 <= r['rnk'] <= 5
    assert r['term'] not in STOPWORDS_EN
    assert r['n_in_cell'] <= r['n_global']
    assert 1 <= r['n_cells_with'] <= len(cells)


def test_plan_partial_topk_and_single_scan(spark):
  docs = spark.read.parquet(f'{SF1}/documents.parquet')
  a = docs.select(F.col('doc_id').alias('vec_id'),
                  (F.col('doc_id') % 4).cast('int').alias('cell'))
  df = V.cluster_topics(spark, SF1, assignments=a)
  plan = df._jdf.queryExecution().executedPlan().toString()
  assert plan.count('WindowGroupLimit') >= 2, plan
  # the context rollup reads the checkpointed (cell, term) frame —
  # the corpus parquet appears in NO FileScan of the final plan
  assert 'documents.parquet' not in plan
