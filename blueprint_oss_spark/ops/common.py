"""Shared plan-shape helpers for the ops layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(raw: DataFrame,
                      projected: DataFrame | None = None) -> DataFrame:
  """Single-split scan guard, the ONE implementation (round-4 review
  found three divergent copies: vectors._spread_small_scan,
  curation._spread, and two inline blocks in textops).

  A small corpus arrives as one parquet split, which serializes every
  map-heavy stage below the first exchange on one core — measured for
  the embedding pair-cosine joins (round 3) and again for
  bloom_decontaminate's gram scan (round 4).  A file-backed scan with
  fewer input files than `defaultParallelism` gets round-robin spread;
  at 100 TB the scan has thousands of splits and no repartition (= no
  exchange) happens — this is a metadata-only check, no job runs.

  `raw` is the frame whose file listing is probed; `projected`
  (default: raw) is the frame that gets repartitioned.  CAUTION: pass
  the frame BEFORE any expensive projection — no Catalyst rule moves
  computed expressions past a repartition, so spreading a frame that
  already carries e.g. an n-gram projection leaves that work in the
  single-split stage below the exchange (measured: zero speedup until
  bloom's spread was reordered)."""
  out = projected if projected is not None else raw
  target = raw.sparkSession.sparkContext.defaultParallelism
  files = raw.inputFiles()
  if files and len(files) < target:
    return out.repartition(target)
  return out


def presented(df: DataFrame, *cols, sort: bool = True) -> DataFrame:
  """Presentation sort at an operator tail — a global range exchange
  (RangePartitioning + per-partition sort) that exists only so gate
  rows and humans read stable output.  A 100 TB caller feeding the
  result into further stages should pass the operator's `sort=False`
  to drop it: the exchange is pure cost there (the next groupBy/join
  re-partitions anyway), and every operator's VALUES are identical
  either way (the driver gate's compare is order-insensitive)."""
  return df.orderBy(*cols) if sort else df
