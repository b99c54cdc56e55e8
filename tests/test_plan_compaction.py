"""Compaction planning over shard manifests (Iceberg binpack shape):
order-preserving cumulative-byte binning with exact integer division,
DuckDB oracle over the from-scratch manifest recomputation, hand-built
bin arithmetic via the manifests= seam, overshoot semantics for
oversized files, and accounting invariants.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.profiling import plan_compaction

SF1 = '/root/testdata/sf0.001'
SF2 = '/root/testdata/sf0.01'

ORACLE = """
WITH man AS (
  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes
  FROM documents GROUP BY 1
), binned AS (
  SELECT shard, n_docs, n_bytes,
         coalesce(sum(n_bytes) OVER (ORDER BY shard
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {target} AS bin_id
  FROM man
)
SELECT shard, n_docs, n_bytes, bin_id,
       CAST(row_number() OVER (PARTITION BY bin_id ORDER BY shard) - 1
         AS INT) AS bin_pos,
       count(*) OVER (PARTITION BY bin_id) AS bin_n_shards,
       sum(n_bytes) OVER (PARTITION BY bin_id) AS bin_bytes
FROM binned ORDER BY shard
"""


@pytest.mark.parametrize('sf,target', [(SF1, 16 * 1024),
                                       (SF2, 128 * 1024)])
def test_matches_duckdb_oracle(spark, sf, target):
  con = duckdb.connect()
  con.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf}/documents.parquet')")
  oracle = con.execute(ORACLE.format(target=target)).df()
  got = plan_compaction(spark, sf, target_bytes=target).toPandas()
  assert list(got.columns) == ['shard', 'n_docs', 'n_bytes', 'bin_id',
                               'bin_pos', 'bin_n_shards', 'bin_bytes']
  for c in got.columns:
    oracle[c] = oracle[c].astype(got[c].dtype)
  assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))
  # multi-bin at these targets (non-vacuity)
  assert got.bin_id.nunique() > 1


def _manifests(spark, sizes):
  return spark.createDataFrame(
      [(i, 10, s) for i, s in enumerate(sizes)],
      'shard long, n_docs long, n_bytes long')


def test_hand_built_binning(spark):
  # target 100: cum_before = 0, 60, 120, 180, 410 -> bins 0, 0, 1, 1, 4
  got = (plan_compaction(spark, SF1, target_bytes=100,
                         manifests=_manifests(spark,
                                              [60, 60, 60, 230, 40]))
         .toPandas())
  assert got.bin_id.tolist() == [0, 0, 1, 1, 4]
  assert got.bin_pos.tolist() == [0, 1, 0, 1, 0]
  assert got.bin_n_shards.tolist() == [2, 2, 2, 2, 1]
  assert got.bin_bytes.tolist() == [120, 120, 290, 290, 40]


def test_oversized_shard_gets_its_own_overshoot_bin(spark):
  # a shard larger than target is never split; neighbors stay packed
  got = (plan_compaction(spark, SF1, target_bytes=100,
                         manifests=_manifests(spark, [500, 30, 30]))
         .toPandas())
  assert got.bin_id.tolist() == [0, 5, 5]
  assert got.bin_bytes.tolist() == [500, 60, 60]


def test_accounting_invariants(spark):
  got = plan_compaction(spark, SF2, target_bytes=64 * 1024).toPandas()
  # bins are contiguous in shard order and bin ids are monotone
  assert got.sort_values('shard').bin_id.is_monotonic_increasing
  # total bytes preserved
  assert got.n_bytes.sum() == \
      got.drop_duplicates('bin_id').bin_bytes.sum()
  # every bin's first member has bin_pos 0 and counts agree
  g = got.groupby('bin_id')
  assert (g.bin_pos.min() == 0).all()
  assert (g.size() == g.bin_n_shards.first()).all()


def test_target_must_be_positive(spark):
  with pytest.raises(ValueError):
    plan_compaction(spark, SF1, target_bytes=0)
