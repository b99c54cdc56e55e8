"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extract kernels are STUBBED (no image/audio libraries
in this container — see the clearly-marked points below); the Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — is real and tested.  Swap `_decode_stub` for a real
decoder (PIL/torchaudio/ffmpeg) on a cluster with the libs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField('media_ref', StringType()),
    StructField('kind', StringType()),        # image | audio | video
    StructField('payload', BinaryType()),     # opaque encoded bytes
    StructField('width', IntegerType()),
    StructField('height', IntegerType()),
    StructField('duration_ms', IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField('media_ref', StringType()),
    StructField('kind', StringType()),
    StructField('feature', ArrayType(DoubleType())),  # fixed-dim feature
    StructField('decode_status', StringType()),
])

FEATURE_DIM = 16


def synthesize_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
  """Deterministic fake media rows (payload = seeded bytes) for testing
  the plumbing end-to-end without external data."""
  rows = []
  for i in range(n):
    kind = ('image', 'audio', 'video')[i % 3]
    payload = hashlib.sha256(f'media-{i}'.encode()).digest() * 4
    rows.append((f'm/{i}', kind, bytearray(payload), 64 + i % 128,
                 48 + i % 96, 1000 * (1 + i % 30)))
  return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(kind: str, payload: bytes) -> list:
  """STUB decode/feature-extract.

  Real implementation would decode the payload (PIL.Image.open /
  soundfile / pyav frame sampling) and emit a pooled feature vector.
  Container has no media libs, so this produces a deterministic fake
  feature from the payload bytes — keeping schema, batch shape, and
  determinism contract identical to the real path.
  """
  h = hashlib.sha256(kind.encode() + payload).digest()
  return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_media_features(media: DataFrame, *,
                           batch_hint: int = 256) -> DataFrame:
  """Arrow-batched feature extraction over binary media columns.

  mapInPandas keeps payload bytes inside Arrow buffers (no per-row
  Python boxing until the decode call, which is unavoidable for codec
  work).  Partitioning: media tables should be stored bucketed by
  media_ref so feature joins back to the span table are shuffle-free.
  """
  def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
      feats = []
      status = []
      for kind, payload in zip(pdf['kind'], pdf['payload']):
        try:
          feats.append(_decode_stub(kind, bytes(payload)))
          status.append('ok-stub')
        except Exception as e:  # decode failures must not kill the job
          feats.append([0.0] * FEATURE_DIM)
          status.append(f'error: {e}')
      yield pd.DataFrame({
          'media_ref': pdf['media_ref'],
          'kind': pdf['kind'],
          'feature': feats,
          'decode_status': status,
      })

  return media.mapInPandas(run, FEATURE_SCHEMA)


def join_media_features_to_spans(spans_df: DataFrame,
                                 features: DataFrame) -> DataFrame:
  """Attach media features to the media spans of an interleaved document
  table (explode → broadcast/bucketed join → regroup)."""
  exploded = (spans_df
              .select('doc_id', F.explode('spans').alias('s'))
              .where(F.col('s.kind') == 'media'))
  return (exploded
          .join(features, exploded['s.media_ref'] == features.media_ref,
                'left')
          .select('doc_id', F.col('s.media_ref').alias('media_ref'),
                  'feature', 'decode_status'))
