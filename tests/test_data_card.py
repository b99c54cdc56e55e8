"""Per-(lang, source) corpus data card: exact-integer release report
(tokens, chars, Gopher keep, exact-dup mass), bit-equal DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from blueprint_oss_spark.ops import profiling as P

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

ORACLE = r"""
WITH base AS (
  SELECT lang, source, text,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> len(x) > 0)) AS BIGINT) AS n_toks,
         CAST(length(text) AS BIGINT) AS nch,
         CAST((len(list_filter(string_split(text, ' '),
                               x -> len(x) > 0)) >= 5)
          AND (len(list_filter(string_split(text, ' '),
                               x -> len(x) > 0)) <= 100000)
          AND (list_sum(list_transform(
                 list_filter(string_split(text, ' '),
                             x -> len(x) > 0), x -> len(x)))
               >= 2 * len(list_filter(string_split(text, ' '),
                                      x -> len(x) > 0)))
          AND (list_sum(list_transform(
                 list_filter(string_split(text, ' '),
                             x -> len(x) > 0), x -> len(x)))
               <= 12 * len(list_filter(string_split(text, ' '),
                                       x -> len(x) > 0)))
          AND (len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','of','and','to','in','is','it',
                            'for','on','with','as','at','by'))) >= 1)
          AND (2 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               >= length(text)) AS BIGINT) AS keep
  FROM documents
), per_text AS (
  SELECT lang, source, text, count(*) AS n_docs,
         sum(n_toks) AS n_tokens, sum(nch) AS n_chars,
         sum(keep) AS n_quality_keep
  FROM base GROUP BY lang, source, text
)
SELECT lang, source,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_quality_keep) AS BIGINT) AS n_quality_keep,
       CAST(count(*) AS BIGINT) AS n_distinct_texts,
       CAST(sum(n_docs) - count(*) AS BIGINT) AS n_dup_docs
FROM per_text GROUP BY lang, source ORDER BY lang, source
"""


@pytest.mark.parametrize('sf', [SF1, SF2])
def test_matches_duckdb_oracle(spark, sf):
  con = duckdb.connect()
  con.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf}/documents.parquet')")
  oracle = con.execute(ORACLE).df()
  got = P.data_card(spark, sf).toPandas()
  assert list(got.columns) == list(oracle.columns)
  for c in got.columns:
    oracle[c] = oracle[c].astype(got[c].dtype)
  assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))


def test_totals_reconcile_with_corpus(spark):
  got = P.data_card(spark, SF1).toPandas()
  n = spark.read.parquet(f'{SF1}/documents.parquet').count()
  assert got.n_docs.sum() == n
  assert (got.n_dup_docs >= 0).all()
  assert (got.n_quality_keep <= got.n_docs).all()
  assert (got.n_distinct_texts + got.n_dup_docs == got.n_docs).all()


def test_plan_two_level_agg_no_joins(spark):
  df = P.data_card(spark, SF1)
  plan = df._jdf.queryExecution().explainString(
      spark._jvm.org.apache.spark.sql.execution.ExplainMode
      .fromString('simple'))
  body = plan.split('AdaptiveSparkPlan')[-1]
  assert 'Join' not in body and 'Python' not in body, plan
  # two aggregation levels + presentation sort = at most 3 exchanges
  assert body.count('Exchange') <= 3, plan
