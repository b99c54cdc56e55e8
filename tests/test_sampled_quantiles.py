"""Deterministic hash-sampled exact quantiles — the reproducible
alternative to percentile_approx (whose GK/KLL sketch state is
engine-internal).  md5-threshold sample + nearest-rank selection on
the sorted sample, bit-equal in DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops import profiling as P

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

ORACLE = r"""
WITH s AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS v
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) <
        '80000000000000000000000000000000'),
agg AS (
  SELECT lang, list_sort(list(v)) AS vs,
         CAST(count(*) AS BIGINT) AS n_sampled
  FROM s GROUP BY lang)
SELECT lang, n_sampled,
       vs[CAST(ceil(n_sampled * 25 / 100.0) AS INT)] AS q25,
       vs[CAST(ceil(n_sampled * 50 / 100.0) AS INT)] AS q50,
       vs[CAST(ceil(n_sampled * 75 / 100.0) AS INT)] AS q75,
       vs[CAST(ceil(n_sampled * 90 / 100.0) AS INT)] AS q90
FROM agg ORDER BY lang
"""


@pytest.mark.parametrize('sf', [SF1, SF2])
def test_matches_duckdb_oracle(spark, sf):
  con = duckdb.connect()
  con.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf}/documents.parquet')")
  oracle = con.execute(ORACLE).df()
  got = P.sampled_quantiles(spark, sf).toPandas()
  assert list(got.columns) == ['lang', 'n_sampled', 'q25', 'q50',
                               'q75', 'q90']
  assert len(got) == len(oracle)
  assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))


def test_nearest_rank_semantics(spark):
  # known values: 1..100 for one group, full sample (threshold 'g'>hex)
  docs = spark.range(1, 101).select(
      (F.col('id') + 100000).alias('doc_id'),  # ids hash arbitrarily
      F.lit('g').alias('lang'),
      F.expr("repeat('x', CAST(id AS INT))").alias('text'))
  out = P.sampled_quantiles(spark, '', docs=docs,
                            threshold='g' * 32).collect()[0]
  got = {q: out[f'q{q}'] for q in (25, 50, 75, 90)}
  vals = sorted(range(1, 101))
  import math
  expect = {q: vals[math.ceil(q / 100.0 * 100) - 1]
            for q in (25, 50, 75, 90)}
  assert out['n_sampled'] == 100
  assert got == expect, (got, expect)


def test_sample_stability_under_repartition(spark):
  a = P.sampled_quantiles(spark, SF1).toPandas()
  docs = spark.read.parquet(f'{SF1}/documents.parquet').repartition(17)
  b = P.sampled_quantiles(spark, SF1, docs=docs).toPandas()
  assert a.equals(b)
