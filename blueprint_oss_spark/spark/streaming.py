"""Structured Streaming extraction: the same mapInPandas stage applied to
a stream of (doc_id, spans) documents.

The extraction map is stateless per document, so it composes with any
streaming source (file source, Kafka) and sink; exactly-once comes from
the sink's checkpointing.  The reference has no streaming path (its CLI
loop is serial, bp/cli/run_model.py:123-147) — this is the Spark-native
continuous-ingest surface for the same engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..model.nodes import Node
from .pipeline import SPANS_SCHEMA, extract_documents


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
