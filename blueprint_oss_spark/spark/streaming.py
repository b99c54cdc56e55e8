"""Structured Streaming extraction: the same mapInPandas stage applied to
a stream of (doc_id, spans) documents.

The extraction map is stateless per document, so it composes with any
streaming source (file source, Kafka) and sink; exactly-once comes from
the sink's checkpointing.  The reference has no streaming path (its CLI
loop is serial, bp/cli/run_model.py:123-147) — this is the Spark-native
continuous-ingest surface for the same engine.

Stateful surface:
  * assemble_multipart_stream — documents whose parts (pages) land in
    DIFFERENT micro-batches, possibly out of order.  Custom
    applyInPandasWithState operator keyed by doc_id: state accumulates
    span fragments until all n_parts arrived (emit assembled doc) or
    the event-time timeout fires (emit what arrived, flagged partial —
    a straggler page must not pin state forever).
  * windowed_extraction_metrics — event-time windowed quality metrics
    over the extraction output with a watermark so late rows update
    the right window and state is eventually evicted.
  * sessionized_doc_activity — dynamic session windows (gap-separated
    activity bursts) with the same watermark-bounded state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import (
    GroupState, GroupStateTimeout,
)
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType, TimestampType,
)

from ..model.nodes import Node
from .pipeline import SPAN_STRUCT, SPANS_SCHEMA, extract_documents


def read_span_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 16) -> DataFrame:
  """File-source stream of interleaved span documents (parquet files
  landing in input_dir)."""
  return (spark.readStream
          .schema(SPANS_SCHEMA)
          .option('maxFilesPerTrigger', max_files_per_trigger)
          .parquet(input_dir))


def extract_documents_stream(stream_df: DataFrame, root: Node,
                             **kwargs) -> DataFrame:
  """Streaming extraction — identical semantics to the batch pipeline;
  mapInPandas is stateless so it is streaming-safe."""
  return extract_documents(stream_df, root, **kwargs)


def start_extraction_stream(spark: SparkSession, input_dir: str,
                            output_dir: str, checkpoint_dir: str,
                            root: Node, *,
                            trigger_once: bool = False) -> StreamingQuery:
  """readStream → extract → writeStream(parquet) with checkpointing.
  Restarting with the same checkpoint resumes exactly-once."""
  out = extract_documents_stream(read_span_stream(spark, input_dir), root)
  writer = (out.writeStream
            .format('parquet')
            .option('path', output_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append'))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


# ---------------------------------------------------------------------------
# Stateful: multi-part document assembly (applyInPandasWithState).
# ---------------------------------------------------------------------------

MULTIPART_SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('part_no', IntegerType()),
    StructField('n_parts', IntegerType()),
    StructField('spans', ArrayType(SPAN_STRUCT)),
    StructField('ts', TimestampType()),   # part arrival event time
])

ASSEMBLED_SCHEMA = StructType([
    StructField('doc_id', StringType()),
    StructField('spans', ArrayType(SPAN_STRUCT)),
    StructField('n_parts_seen', IntegerType()),
    StructField('n_parts_expected', IntegerType()),
    StructField('complete', BooleanType()),
])

# State: which parts arrived + their flattened spans.  Span structs are
# flattened into parallel arrays because state columns must be
# Arrow-serializable scalars/arrays.
_ASSEMBLY_STATE_SCHEMA = StructType([
    StructField('n_parts', IntegerType()),
    StructField('last_ev_ms', LongType()),  # newest part event time
    StructField('part_nos', ArrayType(IntegerType())),
    StructField('kinds', ArrayType(StringType())),
    StructField('texts', ArrayType(StringType())),
    StructField('media_refs', ArrayType(StringType())),
    StructField('offsets', ArrayType(IntegerType())),
    StructField('span_part', ArrayType(IntegerType())),
])


def _assemble_doc(key: Tuple[str], pdfs: Iterable[pd.DataFrame],
                  state: GroupState,
                  timeout_ms: int = 3_600_000) \
    -> Iterator[pd.DataFrame]:
  """Stateful assembly for one doc_id (see assemble_multipart_stream)."""
  doc_id = key[0]
  if state.hasTimedOut:
    (n_parts, _last_ev, part_nos, kinds, texts, media_refs, offsets,
     span_part) = state.get
    state.remove()
    spans = sorted(zip(kinds, texts, media_refs, offsets),
                   key=lambda s: s[3])
    yield pd.DataFrame({
        'doc_id': [doc_id],
        'spans': [[{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
                   for (k, t, m, o) in spans]],
        'n_parts_seen': [len(set(part_nos))],
        'n_parts_expected': [n_parts],
        'complete': [False],
    })
    return

  if state.exists:
    (n_parts, last_ev_ms, part_nos, kinds, texts, media_refs, offsets,
     span_part) = (list(v) if isinstance(v, (list, tuple)) else v
                   for v in state.get)
  else:
    n_parts = 0
    last_ev_ms = 0
    part_nos, kinds, texts, media_refs, offsets, span_part = \
        [], [], [], [], [], []

  for pdf in pdfs:
    for _, row in pdf.iterrows():
      p = int(row['part_no'])
      ts = row['ts']
      if ts is not None and not pd.isna(ts):
        # naive pandas timestamps are epoch-converted as UTC; run the
        # session with spark.sql.session.timeZone=UTC (the default in
        # this repo's entry points) so this agrees with the engine's
        # watermark domain
        last_ev_ms = max(last_ev_ms, int(ts.timestamp() * 1000))
      if p in part_nos:
        continue  # duplicate delivery — idempotent
      part_nos.append(p)
      n_parts = max(n_parts, int(row['n_parts']))
      for s in row['spans']:
        kinds.append(s['kind'])
        texts.append(s['text'])
        media_refs.append(s['media_ref'])
        offsets.append(int(s['offset']))
        span_part.append(p)

  if n_parts and len(set(part_nos)) >= n_parts:
    state.remove()
    spans = sorted(zip(kinds, texts, media_refs, offsets),
                   key=lambda s: s[3])
    yield pd.DataFrame({
        'doc_id': [doc_id],
        'spans': [[{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
                   for (k, t, m, o) in spans]],
        'n_parts_seen': [len(set(part_nos))],
        'n_parts_expected': [n_parts],
        'complete': [True],
    })
  else:
    state.update((n_parts, last_ev_ms, part_nos, kinds, texts,
                  media_refs, offsets, span_part))
    # Event-time timeout anchored to the NEWEST part's event time —
    # fires once the stream watermark passes it.  Deterministic,
    # replayable, and (unlike a processing-time timeout) it cannot make
    # an availableNow query spin empty micro-batches forever waiting
    # for wall-clock time.  The max() keeps the timestamp legal when
    # the watermark has already overtaken a very late part.
    state.setTimeoutTimestamp(
        max(last_ev_ms + timeout_ms,
            state.getCurrentWatermarkMs() + 1))


def assemble_multipart_stream(parts_stream: DataFrame, *,
                              timeout_ms: int = 3_600_000,
                              watermark_delay: str = '10 minutes') \
    -> DataFrame:
  """Custom stateful operator: assemble documents whose parts (pages)
  arrive across micro-batches, out of order, with duplicate deliveries.

  Input rows: MULTIPART_SCHEMA (doc_id, part_no, n_parts, spans, ts).
  `watermark_delay` bounds how LATE a part may arrive relative to the
  newest event time seen: the engine drops stateful-operator input
  older than the watermark (standard late-data semantics), so size it
  to the expected cross-batch part-arrival spread.
  State per doc_id holds the flattened span fragments; a document is
  emitted exactly once — assembled, spans re-sorted by offset — when
  all parts arrived, or flagged `complete=false` when the EVENT-TIME
  timeout fires first: once the watermark (arrival `ts` minus
  `watermark_delay`) advances `timeout_ms` past the doc's last state
  update, a lost page surfaces the partial document instead of pinning
  state forever.  State lives in the streaming checkpoint, so assembly
  survives query restarts, and event-time timeouts replay
  deterministically."""
  import functools
  fn = functools.partial(_assemble_doc, timeout_ms=timeout_ms)
  return (parts_stream
          .withWatermark('ts', watermark_delay)
          .groupBy('doc_id')
          .applyInPandasWithState(
              fn,
              outputStructType=ASSEMBLED_SCHEMA,
              stateStructType=_ASSEMBLY_STATE_SCHEMA,
              outputMode='append',
              timeoutConf=GroupStateTimeout.EventTimeTimeout))


# State for the transformWithState twin: the applyInPandasWithState
# fields plus the currently-registered timer timestamp, so stale timers
# (one may be registered per batch) can be exact-match ignored.
_TWS_STATE_SCHEMA = StructType(
    _ASSEMBLY_STATE_SCHEMA.fields
    + [StructField('timer_ms', LongType())])


class _AssemblyProcessor:
  """StatefulProcessor for assemble_multipart_stream_tws — the Spark 4
  transformWithStateInPandas twin of _assemble_doc, with identical
  emission semantics (exactly-once per doc: assembled+complete when all
  parts arrive, partial when the event-time timer fires first).

  Declared as a plain class and mixed with StatefulProcessor at call
  time purely so this module stays importable if a future PySpark
  moves the ABC; the methods implement the documented protocol."""

  def __init__(self, timeout_ms: int = 3_600_000):
    self._timeout_ms = timeout_ms

  def init(self, handle) -> None:
    self._handle = handle
    self._frag = handle.getValueState('frag', _TWS_STATE_SCHEMA)

  def _load(self):
    if self._frag.exists():
      (n_parts, last_ev_ms, part_nos, kinds, texts, media_refs,
       offsets, span_part, timer_ms) = self._frag.get()
      return (int(n_parts), int(last_ev_ms), list(part_nos),
              list(kinds), list(texts), list(media_refs),
              list(offsets), list(span_part),
              int(timer_ms))
    return 0, 0, [], [], [], [], [], [], 0

  @staticmethod
  def _emit(doc_id, part_nos, kinds, texts, media_refs, offsets,
            n_parts, complete):
    spans = sorted(zip(kinds, texts, media_refs, offsets),
                   key=lambda s: s[3])
    return pd.DataFrame({
        'doc_id': [doc_id],
        'spans': [[{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
                   for (k, t, m, o) in spans]],
        'n_parts_seen': [len(set(part_nos))],
        'n_parts_expected': [n_parts],
        'complete': [complete],
    })

  def handleInputRows(self, key, rows, timerValues):
    doc_id = key[0]
    (n_parts, last_ev_ms, part_nos, kinds, texts, media_refs, offsets,
     span_part, timer_ms) = self._load()

    for pdf in rows:
      for _, row in pdf.iterrows():
        p = int(row['part_no'])
        ts = row['ts']
        if ts is not None and not pd.isna(ts):
          last_ev_ms = max(last_ev_ms, int(ts.timestamp() * 1000))
        if p in part_nos:
          continue  # duplicate delivery — idempotent
        part_nos.append(p)
        n_parts = max(n_parts, int(row['n_parts']))
        for s in row['spans']:
          kinds.append(s['kind'])
          texts.append(s['text'])
          media_refs.append(s['media_ref'])
          offsets.append(int(s['offset']))
          span_part.append(p)

    if n_parts and len(set(part_nos)) >= n_parts:
      self._frag.clear()
      if timer_ms:
        self._handle.deleteTimer(timer_ms)
      yield self._emit(doc_id, part_nos, kinds, texts, media_refs,
                       offsets, n_parts, True)
      return

    # same timeout anchor as the applyInPandasWithState twin: newest
    # part event time + timeout, clamped past the current watermark
    new_timer = max(last_ev_ms + self._timeout_ms,
                    timerValues.getCurrentWatermarkInMs() + 1)
    if timer_ms and timer_ms != new_timer:
      self._handle.deleteTimer(timer_ms)
    self._handle.registerTimer(new_timer)
    self._frag.update((n_parts, last_ev_ms, part_nos, kinds, texts,
                       media_refs, offsets, span_part, new_timer))

  def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
    if not self._frag.exists():
      return  # doc already emitted; stale timer
    (n_parts, last_ev_ms, part_nos, kinds, texts, media_refs, offsets,
     span_part, timer_ms) = self._load()
    if expiredTimerInfo.getExpiryTimeInMs() != timer_ms:
      return  # superseded by a newer registration
    self._frag.clear()
    yield self._emit(key[0], part_nos, kinds, texts, media_refs,
                     offsets, n_parts, False)

  def handleInitialState(self, key, initialState, timerValues) -> None:
    raise NotImplementedError('no initial state for assembly')

  def close(self) -> None:
    pass


def assemble_multipart_stream_tws(parts_stream: DataFrame, *,
                                  timeout_ms: int = 3_600_000,
                                  watermark_delay: str = '10 minutes') \
    -> DataFrame:
  """assemble_multipart_stream re-expressed on Spark 4's
  transformWithStateInPandas (the successor API to
  applyInPandasWithState): ValueState holds the span fragments, an
  event-time TIMER (not a GroupState timeout) surfaces partial
  documents, and stale timers are exact-match ignored via the stored
  registration timestamp.  Emission semantics are identical to the
  applyInPandasWithState twin — the parity test drives both over the
  same part stream and asserts equal output.

  Requires the RocksDB state store
  (spark.sql.streaming.stateStore.providerClass =
  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider),
  which transformWithState mandates; set it on the session before
  starting the query."""
  from pyspark.sql.streaming.stateful_processor import StatefulProcessor

  proc_cls = type('AssemblyProcessor',
                  (_AssemblyProcessor, StatefulProcessor), {})
  return (parts_stream
          .withWatermark('ts', watermark_delay)
          .groupBy('doc_id')
          .transformWithStateInPandas(
              statefulProcessor=proc_cls(timeout_ms=timeout_ms),
              outputStructType=ASSEMBLED_SCHEMA,
              outputMode='append',
              timeMode='eventTime'))


def dedup_span_stream(stream_df: DataFrame, *,
                      ts_col: str = 'ts',
                      watermark: str = '10 minutes') -> DataFrame:
  """Streaming exact dedup for at-least-once sources: duplicate
  deliveries of the same document content (producer retries, replayed
  offsets) collapse to a single row via
  `dropDuplicatesWithinWatermark` on a content hash.

  Why this shape at 100 TB: plain `dropDuplicates` on a stream keeps
  one state row per key FOREVER — unbounded state on a continuous
  ingest.  The watermark variant evicts a key's state once event time
  passes `watermark`, bounding state to the duplicate-delivery horizon
  (retries arrive within minutes, not days).  The content hash is
  computed map-side from the canonical JSON of the span array, so the
  stateful operator shuffles only (hash, row) — the same
  hash-partitioned single shuffle exact dedup costs in batch
  (`ops/textops.dedup_exact`)."""
  hashed = stream_df.withColumn(
      'content_hash',
      F.md5(F.concat_ws('\x00', F.col('doc_id').cast('string'),
                        F.to_json(F.col('spans')))))
  return (hashed
          .withWatermark(ts_col, watermark)
          .dropDuplicatesWithinWatermark(['content_hash']))


def windowed_extraction_metrics(out_stream: DataFrame, *,
                                ts_col: str = 'ts',
                                watermark: str = '30 seconds',
                                window: str = '1 minute') -> DataFrame:
  """Event-time windowed extraction-quality metrics with a watermark:
  docs, error count, mean per-doc latency per window.  Late rows inside
  the watermark update their (correct) window; state for closed windows
  is evicted — the standard late-data pattern for a 100 TB ingest
  pipeline's health dashboard."""
  return (out_stream
          .withWatermark(ts_col, watermark)
          .groupBy(F.window(F.col(ts_col), window))
          .agg(F.count(F.lit(1)).alias('docs'),
               F.sum(F.when(F.col('error').isNotNull(), 1).otherwise(0))
               .alias('errors'),
               F.avg('elapsed_ms').alias('avg_elapsed_ms')))


def sessionized_doc_activity(out_stream: DataFrame, *,
                             ts_col: str = 'ts',
                             gap: str = '5 minutes',
                             watermark: str = '30 seconds') -> DataFrame:
  """Session-window aggregation over the extraction output: activity
  bursts separated by more than `gap` become separate sessions (dynamic
  windows, vs the fixed tumbling windows of
  windowed_extraction_metrics).  The watermark closes sessions once no
  in-order row can extend them — the state-eviction contract that keeps
  a continuous 100 TB ingest's session state bounded."""
  return (out_stream
          .withWatermark(ts_col, watermark)
          .groupBy(F.session_window(F.col(ts_col), gap))
          .agg(F.count(F.lit(1)).alias('docs'),
               F.sum(F.when(F.col('error').isNotNull(), 1).otherwise(0))
               .alias('errors')))


def start_main_content_stream(spark: SparkSession, input_dir: str,
                              output_dir: str, checkpoint_dir: str, *,
                              trigger_once: bool = False
                              ) -> StreamingQuery:
  """Streaming main-content extraction (north-rule pipeline as a
  continuous job): readStream over interleaved spans files →
  main_content_from_spans (stateless mapInPandas, streaming-safe) →
  checkpointed parquet sink.  Restarting with the same checkpoint
  resumes exactly-once, the streaming twin of run_extraction_job's
  batch lineage."""
  from ..ops.html_extract import main_content_from_spans
  out = main_content_from_spans(read_span_stream(spark, input_dir))
  writer = (out.writeStream
            .format('parquet')
            .option('path', output_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append'))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


def start_incremental_dedup_stream(spark: SparkSession, input_dir: str,
                                   corpus: DataFrame, output_dir: str,
                                   checkpoint_dir: str, *,
                                   trigger_once: bool = False,
                                   max_files_per_trigger: int = 16,
                                   **dedup_kwargs) -> StreamingQuery:
  """Continuous incremental dedup: classify every arriving document
  against the static corpus store as exact/near/new — the streaming
  twin of ops/textops.incremental_dedup, and the shape a crawl
  pipeline actually runs (the store is yesterday's curated corpus;
  the stream is today's fetches).

  The micro-batch IS the increment, so this is foreachBatch around
  the already-oracled batch operator: the same verified code path
  runs continuously, each batch's verdicts appended with its batch_id.
  foreachBatch + checkpoint gives exactly-once per micro-batch for an
  idempotent sink; the near pass's groupBy runs INSIDE the batch scope
  so no streaming aggregation state accumulates — state cost is zero,
  unlike a watermarked streaming join formulation.  The corpus side is
  re-read per batch only if the caller passes a lazy view; pass a
  cached/bucketed table (spark/storage.py) so each increment pays only
  the probe, never a corpus shuffle."""
  from ..ops.textops import incremental_dedup

  schema = StructType([
      StructField('doc_id', LongType()),
      StructField('text', StringType()),
  ])
  stream = (spark.readStream
            .schema(schema)
            .option('maxFilesPerTrigger', max_files_per_trigger)
            .parquet(input_dir))

  def _classify(batch_df: DataFrame, batch_id: int) -> None:
    out = incremental_dedup(batch_df.sparkSession, '',
                            batch=batch_df, corpus=corpus,
                            **dedup_kwargs)
    (out.withColumn('batch_id', F.lit(batch_id))
        .write.mode('append').parquet(output_dir))

  writer = (stream.writeStream
            .foreachBatch(_classify)
            .option('checkpointLocation', checkpoint_dir))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


def start_main_content_stream(spark: SparkSession, input_dir: str,
                              output_dir: str, checkpoint_dir: str, *,
                              trigger_once: bool = False,
                              max_files_per_trigger: int = 16) \
    -> StreamingQuery:
  """Streaming twin of the north-rule main-content pipeline:
  readStream over interleaved span parquet landing in `input_dir` →
  `main_content_from_spans` (a stateless Arrow-batched mapInPandas —
  streaming-safe for the same reason extraction is) → checkpointed
  parquet sink.  Restarting with the same checkpoint resumes
  exactly-once, which is the continuous-crawl shape of the bulk
  `run_main_content` CLI job: files land, each micro-batch strips
  boilerplate / parses PDFs / reassembles span sequences, and a
  killed job replays nothing already committed.

  `trigger_once` (availableNow) drains the current backlog and stops
  — the batch-job-with-streaming-checkpoints operating mode."""
  from blueprint_oss_spark.ops.html_extract import main_content_from_spans
  src = (spark.readStream
         .schema(SPANS_SCHEMA)
         .option('maxFilesPerTrigger', max_files_per_trigger)
         .parquet(input_dir))
  out = main_content_from_spans(src)
  writer = (out.writeStream
            .format('parquet')
            .option('path', output_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append'))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


def start_validation_stream(spark: SparkSession, input_dir: str,
                            clean_dir: str, quarantine_dir: str,
                            checkpoint_dir: str, *,
                            trigger_once: bool = False,
                            max_files_per_trigger: int = 16) \
    -> StreamingQuery:
  """Streaming ingest validation / quarantine — the front door of the
  continuous crawl: every arriving interleaved-spans file is
  contract-checked with ops/ingest's first-failure taxonomy evaluated
  INLINE on the batch frame (validation_reason_expr — one projection,
  no verdict join), clean rows stream to `clean_dir` with their full
  spans payload intact, violating rows' verdicts to `quarantine_dir`
  as (doc_id, n_spans, reason, batch_id) — the auditable reject log.

  foreachBatch + checkpoint = exactly-once per micro-batch for the
  idempotent parquet sinks (two sinks need foreachBatch; a plain
  writeStream has one path).  The verdict is stateless, so no
  streaming state accumulates; the micro-batch is persisted for the
  two consumers and unpersisted after both writes (each batch is
  file-sized, not corpus-sized)."""
  from ..ops.ingest import validation_reason_expr
  src = (spark.readStream
         .schema(SPANS_SCHEMA)
         .option('maxFilesPerTrigger', max_files_per_trigger)
         .parquet(input_dir))

  def _split(batch_df: DataFrame, batch_id: int) -> None:
    judged = batch_df.withColumn('reason', validation_reason_expr()) \
        .persist()
    try:
      (judged.where(F.col('reason').isNull())
       .select('doc_id', 'spans')
       .write.mode('append').parquet(clean_dir))
      (judged.where(F.col('reason').isNotNull())
       .select('doc_id',
               F.coalesce(F.size('spans'), F.lit(0)).cast('int')
               .alias('n_spans'),
               'reason', F.lit(batch_id).alias('batch_id'))
       .write.mode('append').parquet(quarantine_dir))
    finally:
      judged.unpersist()

  writer = (src.writeStream
            .foreachBatch(_split)
            .option('checkpointLocation', checkpoint_dir))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


EVENTS_SCHEMA = StructType([
    StructField('event_id', LongType()),
    StructField('ts', TimestampType()),
    StructField('user_id', LongType()),
    StructField('event_type', StringType()),
    StructField('value', DoubleType()),
    StructField('props', StringType()),
])


def read_rollup_state(spark: SparkSession, state_dir: str,
                      *, before_batch: Optional[int] = None) \
    -> Optional[DataFrame]:
  """Latest committed rollup-state version in `state_dir` (written by
  start_rollup_stream as v{batch_id} directories), or the latest with
  batch_id < `before_batch` — the read a replayed micro-batch does so
  it rebuilds its version from the SAME predecessor."""
  import re
  # version discovery via the Hadoop FileSystem API, NOT os.listdir:
  # state_dir may be HDFS/S3/file — whatever filesystem the writer's
  # DataFrame write resolves, the reader resolves identically (a
  # driver-local os.listdir silently returned None for remote
  # schemes, dropping all prior state instead of reading it)
  jvm = spark._jvm
  jpath = jvm.org.apache.hadoop.fs.Path(state_dir)
  fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
  if not fs.exists(jpath):
    return None
  # committed = the writer's _SUCCESS marker is present; a version
  # directory mid-write (crash, or the stream still running) is
  # invisible to readers — without this check the 'latest committed
  # version' contract breaks with a torn or unreadable state
  versions = sorted(
      int(m.group(1))
      for st in fs.listStatus(jpath)
      if st.isDirectory()
      and (m := re.fullmatch(r'v(\d+)', st.getPath().getName()))
      and fs.exists(
          jvm.org.apache.hadoop.fs.Path(st.getPath(), '_SUCCESS')))
  if before_batch is not None:
    versions = [v for v in versions if v < before_batch]
  if not versions:
    return None
  return spark.read.parquet(f'{state_dir}/v{versions[-1]:09d}')


def start_rollup_stream(spark: SparkSession, input_dir: str,
                        state_dir: str, checkpoint_dir: str, *,
                        trigger_once: bool = False,
                        max_files_per_trigger: int = 16) \
    -> StreamingQuery:
  """Continuous-aggregate maintenance: the streaming twin of
  ops/relational.rollup_events + merge_rollups — every arriving
  events micro-batch updates the persisted per-(day, event_type)
  rollup by MERGING partial states, never rescanning history (the
  TimescaleDB-continuous-aggregate / Druid-ingestion shape).

  Exactly-once WITHOUT a transactional sink, via versioned
  idempotence: micro-batch n writes state version
  `state_dir/v{n} = merge(latest version < n, rollup(batch n))`.
  After a crash Spark replays the last uncommitted batch with the
  SAME batch_id and SAME rows (file source + checkpoint contract);
  the replay re-reads the same predecessor (strictly `< n`, so its
  own partial write is invisible) and deterministically rewrites the
  same version — a re-run is a byte-identical overwrite, not a
  double-count.  This is the Iceberg-snapshot pattern with plain
  directories; with the runtime jar present the version write becomes
  a snapshot commit (spark/pipeline.py write_iceberg).

  State cost is zero on the streaming side (no watermark state, no
  streaming aggregation): the micro-batch is the increment, the merge
  runs INSIDE batch scope on rollup-cardinality frames, and readers
  get a consistent aggregate by reading the latest committed version
  (`read_rollup_state`)."""
  from ..ops.relational import merge_rollups, rollup_events

  stream = (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option('maxFilesPerTrigger', max_files_per_trigger)
            .parquet(input_dir))

  def _update(batch_df: DataFrame, batch_id: int) -> None:
    sp = batch_df.sparkSession
    delta = rollup_events(sp, '', events=batch_df)
    prev = read_rollup_state(sp, state_dir, before_batch=batch_id)
    state = delta if prev is None else merge_rollups(prev, delta)
    # the write target is v{batch_id}, strictly newer than every
    # directory `prev` reads (before_batch excludes a partial replay
    # write of v{batch_id} itself) — no self-dependency to sever
    state.write.mode('overwrite') \
        .parquet(f'{state_dir}/v{batch_id:09d}')

  writer = (stream.writeStream
            .foreachBatch(_update)
            .option('checkpointLocation', checkpoint_dir))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()


def start_attribution_join_stream(spark: SparkSession,
                                  clicks_dir: str, purchases_dir: str,
                                  output_dir: str, checkpoint_dir: str,
                                  *, attribution_window: str = '1 hour',
                                  watermark: str = '2 hours',
                                  trigger_once: bool = False,
                                  max_files_per_trigger: int = 16) \
    -> StreamingQuery:
  """Watermarked STREAM-STREAM join — the last-click attribution
  shape: every purchase joins the same user's clicks that happened in
  the preceding `attribution_window`.  This is the canonical
  two-unbounded-sides join Structured Streaming exists to bound:
  without the event-time constraint + watermarks, matching "a past
  click" would require keeping every click forever.

  State story (the part that survives 100 TB/day): both sides carry a
  `withWatermark`, and the join condition includes the event-time
  range `click.ts ∈ [purchase.ts - window, purchase.ts]` — together
  they let Spark EVICT buffered clicks once the purchase-side
  watermark passes click.ts + window (no purchase that could still
  match can arrive), so join state is bounded by
  rate × (window + watermark delay) instead of the stream's history.
  An inner join emits exactly the matched pairs append-only; rows
  arriving later than the watermark are dropped by contract (the
  documented completeness/latency trade every streaming join makes).

  The two inputs are separate directories because that is the honest
  production topology (clicks and purchases land from different
  pipelines); both use the events-table schema with the type filter
  applied inside."""
  clicks = (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option('maxFilesPerTrigger', max_files_per_trigger)
            .parquet(clicks_dir)
            .where(F.col('event_type') == 'click')
            .select(F.col('event_id').alias('click_id'),
                    F.col('ts').alias('click_ts'),
                    F.col('user_id'),
                    F.col('value').alias('click_value'))
            .withWatermark('click_ts', watermark))
  purchases = (spark.readStream
               .schema(EVENTS_SCHEMA)
               .option('maxFilesPerTrigger', max_files_per_trigger)
               .parquet(purchases_dir)
               .where(F.col('event_type') == 'purchase')
               .select(F.col('event_id').alias('purchase_id'),
                       F.col('ts').alias('purchase_ts'),
                       F.col('user_id').alias('p_user_id'),
                       F.col('value').alias('purchase_value'))
               .withWatermark('purchase_ts', watermark))
  joined = purchases.join(
      clicks,
      (F.col('user_id') == F.col('p_user_id'))
      & (F.col('click_ts') <= F.col('purchase_ts'))
      & (F.col('click_ts') >= F.col('purchase_ts')
         - F.expr(f'INTERVAL {attribution_window}')),
      'inner').drop('p_user_id')
  writer = (joined.writeStream
            .format('parquet')
            .option('path', output_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append'))
  if trigger_once:
    writer = writer.trigger(availableNow=True)
  return writer.start()
