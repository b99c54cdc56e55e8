"""The Spark pipeline: bulk blueprint extraction over interleaved-span
document tables.

Shape of the job (SURVEY.md §7):

    scan (doc_id, spans)            -- Iceberg/parquet; one row per doc
      → [optional salted repartition by size bucket]   -- only for skew
      → mapInPandas(extract)        -- Arrow batches; entity-gen + CSP
      → write, partitioned by bucket, with lineage     -- resumable

Because the input is already one-row-per-document, the happy path has
ZERO shuffles: Spark pipelines scan → Arrow batch → Python → write.
Catalyst still provides column pruning / partition pruning on the scan;
document skew is handled by (a) Arrow batch sizing, (b) the optional
size-bucketed repartition for pathological span-count distributions,
(c) per-document time/size budgets mirroring the reference's 45 s CLI
timeout (bp/cli/run_model.py:32) — a doc over budget produces an `error`
row instead of stalling an executor core.
"""

from __future__ import annotations

import pickle
import time
from typing import Iterable, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, MapType, StringType,
    StructField, StructType,
)

from ..model.nodes import Node, optimize_rule_distribution
from ..engine.runner import run_doc
from ..engine import solver as solver_mod

SPAN_STRUCT = StructType([
    StructField('kind', StringType()),
    StructField('text', StringType()),
    StructField('media_ref', StringType()),
    StructField('offset', IntegerType()),
])

SPANS_SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('spans', ArrayType(SPAN_STRUCT)),
])

OUT_SPAN_STRUCT = StructType([
    StructField('kind', StringType()),
    StructField('text', StringType()),
    StructField('media_ref', StringType()),
    StructField('order', IntegerType()),
])

OUTPUT_SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('out_spans', ArrayType(OUT_SPAN_STRUCT)),
    StructField('fields', MapType(StringType(), StringType())),
    StructField('score', DoubleType()),
    StructField('n_entities', IntegerType()),
    StructField('n_words', IntegerType()),
    StructField('error', StringType()),
    StructField('elapsed_ms', DoubleType()),
])


class _MalformedDoc(ValueError):
  """A document row the input contract forbids (null doc_id / spans /
  span struct fields) — contained as a per-doc error row."""


def compile_blueprint(root: Node) -> bytes:
  """Driver-side compile: rule pushdown (the reference's
  optimize_rule_distribution, bp/tree.py:805-862) + validation, then
  pickle for broadcast."""
  optimized = optimize_rule_distribution(root)
  optimized.validate()
  return pickle.dumps(optimized)


# payload digest → unpickled tree, per worker process.  mapInPandas
# invokes the batch fn once per PARTITION; unpickling there yields a new
# tree object each time, which leaves every id()-keyed solver cache
# (ordered-tree realizations per pattern) cold for each partition.  One
# shared tree per worker keeps those caches warm across partitions.
_TREE_BY_DIGEST: dict = {}


def tree_from_payload(payload: bytes) -> Node:
  import hashlib
  key = hashlib.md5(payload).digest()
  tree = _TREE_BY_DIGEST.get(key)
  if tree is None:
    if len(_TREE_BY_DIGEST) > 64:
      _TREE_BY_DIGEST.clear()
    tree = pickle.loads(payload)
    _TREE_BY_DIGEST[key] = tree
  return tree


def extract_documents(df: DataFrame, root: Node, *,
                      doc_time_budget_s: float = 45.0,
                      max_spans_per_doc: int = 200_000,
                      size_bucketed_repartition: bool = False,
                      num_partitions: Optional[int] = None) -> DataFrame:
  """Bulk extraction: (doc_id, spans) → OUTPUT_SCHEMA rows.

  Args:
    df: DataFrame with SPANS_SCHEMA columns.
    root: blueprint tree (un-optimized; compiled here and broadcast).
    doc_time_budget_s: per-document wall budget (reference default 45 s).
    max_spans_per_doc: guard against pathological documents.
    size_bucketed_repartition: opt-in shuffle that spreads documents by
      (log2 span count, random salt) so heavy-tailed corpora don't
      straggle single partitions.  Costs one shuffle — leave off unless
      the input layout is known-skewed.
  """
  spark = df.sparkSession
  payload = compile_blueprint(root)
  bc = spark.sparkContext.broadcast(payload)

  if size_bucketed_repartition:
    n = num_partitions or spark.sparkContext.defaultParallelism * 4
    df = (df
          .withColumn('_sz', F.log2(F.size('spans') + F.lit(2)).cast('int'))
          .withColumn('_salt', (F.rand(seed=42) * 1024).cast('int'))
          .repartition(n, F.col('_sz'), F.col('_salt'))
          .drop('_sz', '_salt'))

  def run_batches(batches: Iterator[pd.DataFrame]) \
      -> Iterator[pd.DataFrame]:
    tree = tree_from_payload(bc.value)
    for pdf in batches:
      out: List[dict] = []
      for doc_id, spans in zip(pdf['doc_id'], pdf['spans']):
        t0 = time.monotonic()
        row = {
            'doc_id': doc_id, 'out_spans': [], 'fields': {},
            'score': 0.0, 'n_entities': 0, 'n_words': 0, 'error': None,
            'elapsed_ms': 0.0,
        }
        try:
          # Malformed-row containment: at 10^12 docs a single null
          # spans array / null struct field must yield an error ROW,
          # never an executor task failure that kills the whole job.
          if doc_id is None:
            raise _MalformedDoc('null doc_id')
          if spans is None or isinstance(spans, float):
            raise _MalformedDoc('null spans array')
          if len(spans) > max_spans_per_doc:
            raise solver_mod.SolverBudgetError(
                f'{len(spans)} spans exceeds max_spans_per_doc')
          solver_mod.set_deadline(t0 + doc_time_budget_s)
          span_rows = []
          for s in spans:
            if s is None or s['kind'] is None or s['offset'] is None:
              raise _MalformedDoc(f'null span struct/kind/offset: {s}')
            # null text / media_ref are normal at scale (media spans
            # carry no text; text spans no media) — normalize to ''
            span_rows.append((s['kind'], s['text'] or '',
                              s['media_ref'] or '', int(s['offset'])))
          r = run_doc(str(doc_id), span_rows, tree, pre_optimized=True)
          row.update(
              out_spans=[{'kind': k, 'text': t, 'media_ref': m,
                          'order': o} for (k, t, m, o) in r['out_spans']],
              fields=r['fields'], score=r['score'],
              n_entities=r['n_entities'], n_words=r['n_words'])
        except solver_mod.SolverBudgetError as e:
          row['error'] = f'budget: {e}'
        except solver_mod.SolverTimeoutError:
          row['error'] = 'timeout'
        except _MalformedDoc as e:
          row['error'] = f'malformed: {e}'
        except Exception as e:  # noqa: BLE001 — last-resort containment
          # Unknown per-doc failure: record and continue.  A 90-hour
          # 1000-executor run must not die on doc 10^11's quirk; the
          # error column is the triage surface.
          row['error'] = f'error: {type(e).__name__}: {e}'
        finally:
          solver_mod.set_deadline(None)
        row['elapsed_ms'] = (time.monotonic() - t0) * 1000.0
        out.append(row)
      yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA])

  return df.mapInPandas(run_batches, OUTPUT_SCHEMA)


def spans_from_documents(docs: DataFrame, words_per_line: int = 8,
                         page_lines: int = 64) -> DataFrame:
  """Synthesize an interleaved spans table from a raw text corpus
  (e.g. the driver's `documents` table) with pure Catalyst transforms —
  tokenize, lay out on a fixed grid, pack offsets.

  This is the bulk path for turning 100 TB of raw text into the engine's
  input format: split → posexplode → window-free arithmetic layout (word
  k goes to line k//words_per_line, column (k%words_per_line)*16), then
  collect back per doc.  One shuffle (the groupBy doc_id).

  Words longer than a grid cell are TRUNCATED to col_width-1 chars, not
  dropped — silent row loss on the bulk ingest path would delete content
  at 100 TB scale.  Every nonempty input token round-trips to exactly
  one span.
  """
  col_width = 16
  line_shift = 256
  page_shift = 2 ** 20
  toks = (docs
          .select(F.col('doc_id').cast('string').alias('doc_id'),
                  F.posexplode(F.split(F.col('text'), ' '))
                  .alias('pos', 'word'))
          .where(F.length('word') > 0)
          .withColumn('word', F.substring('word', 1, col_width - 1)))
  lines_per_page = page_lines
  toks = toks.select(
      'doc_id',
      F.struct(
          F.lit('text').alias('kind'),
          F.col('word').alias('text'),
          F.lit('').alias('media_ref'),
          ((F.col('pos') / (words_per_line * lines_per_page))
           .cast('int') * page_shift
           + ((F.col('pos') / words_per_line).cast('int')
              % lines_per_page) * line_shift
           + (F.col('pos') % words_per_line) * col_width)
          .cast('int').alias('offset'),
      ).alias('span'))
  return (toks.groupBy('doc_id')
          .agg(F.collect_list('span').alias('raw'))
          .select('doc_id',
                  F.expr('array_sort(raw, (a, b) -> a.offset - b.offset)')
                  .alias('spans')))


def _write_group_iceberg(spark: SparkSession, observed: DataFrame,
                         iceberg_table: Optional[str]) -> None:
  """One checkpoint group → one atomic Iceberg snapshot commit via the
  DataFrameWriterV2.  Create-on-first-write (partitioned by
  part_bucket for pruned reads + idempotent group replays), then
  `overwritePartitions()` — Iceberg's dynamic overwrite."""
  if not iceberg_table:
    raise ValueError("table_format='iceberg' requires iceberg_table "
                     "(e.g. 'catalog.db.extractions')")
  try:
    table_exists = spark.catalog.tableExists(iceberg_table)
    writer = observed.writeTo(iceberg_table)
    if table_exists:
      writer.overwritePartitions()
    else:
      writer.partitionedBy(F.col('part_bucket')).createOrReplace()
  except Exception as e:  # surface the missing-catalog case clearly
    msg = str(e)
    if 'not found' in msg.lower() or 'catalog' in msg.lower() \
        or 'TABLE_OR_VIEW_NOT_FOUND' in msg:
      raise RuntimeError(
          f'Iceberg write to {iceberg_table!r} failed — is an Iceberg '
          f'catalog configured on this session?  Launch with '
          f'spark-submit --packages '
          f'org.apache.iceberg:iceberg-spark-runtime-3.5_2.12 '
          f'--conf spark.sql.catalog.<name>=org.apache.iceberg.spark.'
          f'SparkCatalog (original error: {msg[:300]})') from e
    raise


def dedup_spans(df: DataFrame) -> DataFrame:
  """Pre-extraction exact dedup of the spans table: keep ONE document
  (min doc_id) per distinct span content.  At 100 TB this is the first
  pass before the solver — every duplicate dropped here saves a full
  per-doc solve.  Content hash is computed map-side from the canonical
  spans JSON; one shuffle (the window over the hash), deterministic
  keeper choice so resumed runs keep the same documents."""
  from pyspark.sql import Window
  hashed = df.withColumn('_h', F.md5(F.to_json(F.col('spans'))))
  w = Window.partitionBy('_h').orderBy('doc_id')
  return (hashed
          .withColumn('_rn', F.row_number().over(w))
          .where(F.col('_rn') == 1)
          .drop('_h', '_rn'))


def run_extraction_job(spark: SparkSession, input_df: DataFrame,
                       output_path: str, root: Optional[Node] = None, *,
                       buckets: int = 64, groups: int = 4,
                       resume: bool = True,
                       table_format: str = 'parquet',
                       iceberg_table: Optional[str] = None,
                       transform=None,
                       **extract_kwargs) -> List[dict]:
  """Resumable bulk job with per-partition lineage + metrics.

  Documents hash into `buckets`; buckets are processed in `groups`
  checkpoint groups.  Each completed group writes its output under
  part_bucket=... plus a lineage row; on resume, completed groups are
  skipped (per-partition checkpointing per the north rule).
  Returns the lineage rows (one per group processed this run).

  Sinks: `table_format='parquet'` (default) writes dynamic-overwrite
  partitioned parquet under `output_path`.  `table_format='iceberg'`
  writes each checkpoint group to `iceberg_table` through the
  DataFrameWriterV2 (`writeTo`): the first group creates the table
  partitioned by part_bucket, later groups `overwritePartitions()` —
  each group is one ATOMIC Iceberg snapshot commit, so a crashed group
  re-runs cleanly on resume exactly like the parquet path's dynamic
  partition overwrite.  Requires an Iceberg catalog on the session
  (spark-submit --packages org.apache.iceberg:iceberg-spark-runtime +
  spark.sql.catalog.* conf); absent that, the write raises a clear
  RuntimeError naming the missing setup (this container ships no
  Iceberg jars, so the branch is exercised for its failure contract
  and the parquet path for the full behavior).

  `transform` generalizes the per-group computation: any
  DataFrame → DataFrame doc-level pipeline (e.g. the main-content
  spans pipeline, ops/html_extract.main_content_from_spans) rides the
  same bucketing / checkpoint groups / lineage / atomic-overwrite
  machinery as blueprint extraction; the default is
  extract_documents(part, root).  Group metrics adapt to the output
  schema (docs always; errors/score_sum/elapsed_ms when present).
  """
  import json

  if transform is None:
    if root is None:
      raise ValueError('run_extraction_job needs root= or transform=')
    def transform(part):  # noqa: E306 - default blueprint pipeline
      return extract_documents(part, root, **extract_kwargs)

  # Lineage I/O goes through the Hadoop FileSystem API (via the JVM),
  # not the local os module, so checkpoint/resume works unchanged when
  # output_path is s3a://... or hdfs://... on a real cluster.
  jvm = spark._jvm
  hconf = spark._jsc.hadoopConfiguration()

  def _hpath(p: str):
    return jvm.org.apache.hadoop.fs.Path(p)

  lineage_dir = output_path.rstrip('/') + '/_lineage'
  fs = _hpath(lineage_dir).getFileSystem(hconf)
  fs.mkdirs(_hpath(lineage_dir))
  done_groups = set()
  if resume:
    for status in fs.listStatus(_hpath(lineage_dir)):
      fn = status.getPath().getName()
      if fn.startswith('group-') and fn.endswith('.json'):
        done_groups.add(int(fn[len('group-'):-len('.json')]))

  df = input_df.withColumn(
      'part_bucket', F.pmod(F.xxhash64('doc_id'), F.lit(buckets)))

  lineage_rows = []
  per_group = (buckets + groups - 1) // groups
  for g in range(groups):
    if g in done_groups:
      continue
    lo, hi = g * per_group, min((g + 1) * per_group, buckets)
    part = df.where((F.col('part_bucket') >= lo)
                    & (F.col('part_bucket') < hi))
    out = transform(part.drop('part_bucket'))
    out = out.withColumn(
        'part_bucket', F.pmod(F.xxhash64('doc_id'), F.lit(buckets)))
    from pyspark.sql import Observation
    obs = Observation(f'bp_group_{g}')
    cols = set(out.columns)
    metrics_exprs = [F.count(F.lit(1)).alias('docs')]
    if 'error' in cols:
      metrics_exprs.append(
          F.sum(F.when(F.col('error').isNotNull(), 1).otherwise(0))
          .alias('errors'))
    if 'score' in cols:
      metrics_exprs.append(F.sum('score').alias('score_sum'))
    if 'elapsed_ms' in cols:
      metrics_exprs.append(F.sum('elapsed_ms').alias('elapsed_ms_sum'))
    if 'doc_id' in cols:
      # Order-independent doc-set checksum (modular sum of 60-bit md5
      # fingerprints, mod 2^61-1 — see ops.profiling.CHECKSUM_MOD):
      # a resumed or differently-parallelized re-run of this group
      # must reproduce it bit-for-bit, turning "did the retry write
      # the same documents" into a lineage-row equality check.
      fp = F.conv(
          F.substring(F.md5(F.col('doc_id').cast('string')), 1, 15),
          16, 10).cast('decimal(38,0)')
      metrics_exprs.append(
          F.pmod(F.sum(fp),
                 F.lit(2305843009213693951).cast('decimal(38,0)'))
          .cast('long').alias('doc_set_checksum'))
    observed = out.observe(obs, *metrics_exprs)
    # Dynamic partition overwrite: a re-run of this group replaces
    # exactly its own part_bucket partitions, so resuming after a
    # partially-written group (crash between data write and lineage
    # write) cannot leave duplicate rows behind.
    if table_format == 'iceberg':
      _write_group_iceberg(spark, observed, iceberg_table)
    else:
      (observed.write.mode('overwrite')
       .option('partitionOverwriteMode', 'dynamic')
       .partitionBy('part_bucket')
       .parquet(output_path))
    # ints stay ints: the doc_set_checksum is a 61-bit value a float
    # round-trip would corrupt (2^61 > 2^53)
    metrics = {k: (None if v is None
                   else int(v) if isinstance(v, int) else float(v))
               for k, v in obs.get.items()}
    row = {'group': g, 'bucket_lo': lo, 'bucket_hi': hi,
           'ts': time.time(), 'metrics': metrics}
    out_stream = fs.create(_hpath(f'{lineage_dir}/group-{g}.json'), True)
    out_stream.write(bytearray(json.dumps(row).encode('utf-8')))
    out_stream.close()
    lineage_rows.append(row)
  return lineage_rows
