"""Ingest validation / quarantine over the interleaved spans table —
the front-door step of every production bulk pipeline: before the
10^12-document extraction job runs, each row of the input Iceberg
table is checked against the schema CONTRACT (the input-hint shape:
doc_id:string, spans:array<struct<kind,text,media_ref,offset>>), and
violating rows are quarantined with a first-failure reason instead of
aborting tasks mid-job (the media_quality_verdicts convention, applied
to the text side of the house).

The rule taxonomy, in fixed production order (first failure wins):

  null_doc_id        doc_id NULL or ''
  empty_spans        spans NULL or empty
  bad_kind           any span kind outside {html, text, pdf, media}
  text_missing       any non-media span with NULL/'' text
  media_ref_missing  any media span with NULL/'' media_ref
  offset_dup         two spans share an offset (the interleave order
                     would be ambiguous)
  offset_neg         any NULL or negative offset

Everything is one whole-stage-codegen projection over the scan — zero
shuffles, zero Python (pinned by test); quarantining is a filter on
the same projection, so the split costs nothing at 100 TB.

The gate corpus is synthesized valid, so verification plants
deterministic corruption by doc_id arithmetic (`plant_corruptions=`,
the plant_for_verification convention): doc_id % 7 selects which
single rule each doc violates (0 = untouched), letting the DuckDB
oracle recompute every verdict and span count from the raw documents
table by pure integer formulas.  Production default is no planting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ['VALID_KINDS', 'corrupt_interleaved', 'validate_interleaved',
           'validation_reason_expr']

#: The span kinds the extraction pipeline understands
#: (main_content_from_spans' dispatch set).
VALID_KINDS = ('html', 'text', 'pdf', 'media')

_SPAN_DDL = ('array<struct<kind:string,text:string,'
             'media_ref:string,offset:int>>')


def corrupt_interleaved(df: DataFrame) -> DataFrame:
  """Deterministically corrupt an interleaved spans frame for
  validation verification: doc_id % 7 picks the single planted defect
  (1 bad kind appended, 2 first text NULLed, 3 media_ref NULLed,
  4 duplicate offset appended, 5 negative offset appended, 6 spans
  emptied; 0 untouched).  Pure JVM column transforms — the corruption
  is part of the Catalyst plan, not a Python stage — and pure
  doc_id arithmetic, so an oracle recomputes the expected verdicts
  without seeing the corrupted bytes."""
  return df.withColumn('spans', F.expr(f"""
      CASE pmod(CAST(doc_id AS BIGINT), 7)
        WHEN 6 THEN CAST(array() AS {_SPAN_DDL})
        WHEN 1 THEN array_append(spans, named_struct(
            'kind', 'blob', 'text', 'x',
            'media_ref', CAST(NULL AS STRING), 'offset', 9))
        WHEN 2 THEN transform(spans, (s, i) -> IF(i = 0,
            named_struct('kind', s.kind, 'text', CAST(NULL AS STRING),
                         'media_ref', s.media_ref, 'offset', s.offset),
            s))
        WHEN 3 THEN transform(spans, (s, i) -> IF(i = 1,
            named_struct('kind', s.kind, 'text', s.text,
                         'media_ref', CAST(NULL AS STRING),
                         'offset', s.offset),
            s))
        WHEN 4 THEN array_append(spans, named_struct(
            'kind', 'html', 'text', 'dup',
            'media_ref', CAST(NULL AS STRING), 'offset', 0))
        WHEN 5 THEN array_append(spans, named_struct(
            'kind', 'html', 'text', 'neg',
            'media_ref', CAST(NULL AS STRING), 'offset', -1))
        ELSE spans
      END"""))


def validate_interleaved(spark: SparkSession, sf_dir: str, *,
                         spans: DataFrame = None,
                         plant_corruptions: bool = False) -> DataFrame:
  """Per-document ingest verdicts over an interleaved spans table:
    doc_id, n_spans, valid (1/0), reason (first failing rule in the
    fixed taxonomy order above; NULL when valid).

  Defaults to the synthesized north-rule table
  (html_extract.interleaved_html_table); pass `spans=` to validate an
  arbitrary user table (the run_main_content CLI shape).  With
  `plant_corruptions=True` the deterministic doc_id % 7 defects are
  injected first (verification only).

  Scale shape: the verdict is ONE projection of `exists` /
  `array_distinct` higher-order predicates over the per-row span
  array — no shuffle, no Python, no corpus-wide state; quarantine =
  `WHERE valid = 0` on the same frame.  Per-span predicate work is
  linear in the row's own span count, so skewed giant documents cost
  their own task time and nothing else."""
  if spans is None:
    from .html_extract import interleaved_html_table
    spans = interleaved_html_table(spark, sf_dir)
  if plant_corruptions:
    spans = corrupt_interleaved(spans)
  return spans.select(
      'doc_id',
      F.coalesce(F.size('spans'), F.lit(0)).cast('int').alias('n_spans'),
      validation_reason_expr().alias('reason')) \
      .withColumn('valid', F.col('reason').isNull().cast('int')) \
      .select('doc_id', 'n_spans', 'valid', 'reason')


def validation_reason_expr():
  """The first-failure verdict as a single Column over (doc_id, spans)
  — exposed so composed callers (e.g. the streaming front door) can
  evaluate it inline on a frame that keeps the spans payload, paying
  one projection instead of a verdict join."""
  kinds = ', '.join(f"'{k}'" for k in VALID_KINDS)
  return F.expr(f"""
    CASE
      WHEN doc_id IS NULL OR doc_id = '' THEN 'null_doc_id'
      WHEN spans IS NULL OR size(spans) = 0 THEN 'empty_spans'
      WHEN exists(spans, s -> s.kind IS NULL
                              OR s.kind NOT IN ({kinds}))
        THEN 'bad_kind'
      WHEN exists(spans, s -> s.kind <> 'media'
                              AND (s.text IS NULL OR s.text = ''))
        THEN 'text_missing'
      WHEN exists(spans, s -> s.kind = 'media'
                              AND (s.media_ref IS NULL
                                   OR s.media_ref = ''))
        THEN 'media_ref_missing'
      WHEN size(array_distinct(transform(spans, s -> s.offset)))
           < size(spans)
        THEN 'offset_dup'
      WHEN exists(spans, s -> s.offset IS NULL OR s.offset < 0)
        THEN 'offset_neg'
      ELSE CAST(NULL AS STRING)
    END""")
