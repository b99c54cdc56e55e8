"""Range-sorted layout (min/max data skipping): the sorted write
produces DISJOINT per-file and per-row-group [min, max] key ranges
(measured from the parquet footers with pyarrow — the stats any
stats-driven reader prunes from), a range predicate is skippable down
to 1 of N row groups where the unsorted layout skips nothing, Spark
pushes the range filter to the scan, and results are identical on
both layouts.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.spark.storage import write_sorted

SF1 = '/root/testdata/sf0.001'

LO, HI = 200, 260  # the backfill-range predicate under test


def _rowgroup_ranges(path):
  """(min, max, n_rows) of doc_id for every row group in every file."""
  out = []
  for f in sorted(glob.glob(f'{path}/*.parquet')):
    md = pq.ParquetFile(f).metadata
    for rg in range(md.num_row_groups):
      g = md.row_group(rg)
      for c in range(g.num_columns):
        col = g.column(c)
        if col.path_in_schema == 'doc_id':
          st = col.statistics
          out.append((st.min, st.max, g.num_rows))
  return out


@pytest.fixture(scope='module')
def layouts(spark, tmp_path_factory):
  base = tmp_path_factory.mktemp('sorted')
  docs = spark.read.parquet(f'{SF1}/documents.parquet')
  write_sorted(docs, str(base / 'sorted'), sort_col='doc_id',
               n_files=8)
  # control: random layout (hash repartition destroys key locality)
  docs.repartition(8, 'text').write.parquet(str(base / 'unsorted'))
  return str(base / 'sorted'), str(base / 'unsorted')


def test_sorted_ranges_disjoint_unsorted_overlap(spark, layouts):
  sorted_path, unsorted_path = layouts
  sr = sorted(_rowgroup_ranges(sorted_path))
  assert len(sr) >= 8
  for (lo1, hi1, _), (lo2, hi2, _) in zip(sr, sr[1:]):
    assert hi1 < lo2  # strictly disjoint, tight stats
  ur = _rowgroup_ranges(unsorted_path)
  n_total = spark.read.parquet(f'{SF1}/documents.parquet').count()
  # every unsorted row group spans nearly the whole key space
  assert all(hi - lo > n_total * 0.8 for lo, hi, _ in ur)


def test_stats_driven_skip_count(spark, layouts):
  """What a footer-stats reader achieves: on the sorted layout the
  range [LO, HI] overlaps 1-2 of >=8 row groups; on the unsorted
  layout it overlaps ALL of them (nothing skippable)."""
  sorted_path, unsorted_path = layouts

  def overlapping(ranges):
    return sum(1 for lo, hi, _ in ranges if not (hi < LO or lo > HI))

  sr, ur = _rowgroup_ranges(sorted_path), _rowgroup_ranges(unsorted_path)
  assert overlapping(sr) <= 2
  assert overlapping(ur) == len(ur)


def test_filter_pushed_and_results_identical(spark, layouts):
  sorted_path, unsorted_path = layouts
  pred = (F.col('doc_id') >= LO) & (F.col('doc_id') <= HI)
  s = spark.read.parquet(sorted_path).where(pred)
  plan = s._jdf.queryExecution().executedPlan().toString()
  assert 'PushedFilters' in plan
  assert 'GreaterThanOrEqual(doc_id' in plan
  a = sorted(r['doc_id'] for r in s.select('doc_id').collect())
  b = sorted(r['doc_id'] for r in
             spark.read.parquet(unsorted_path).where(pred)
             .select('doc_id').collect())
  assert a == b == list(range(LO, HI + 1))


def test_n_files_validation(spark, tmp_path):
  docs = spark.read.parquet(f'{SF1}/documents.parquet')
  with pytest.raises(ValueError):
    write_sorted(docs, str(tmp_path / 'x'), sort_col='doc_id',
                 n_files=0)
