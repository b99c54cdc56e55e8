"""Curation ops: PII scrubbing + eval-set decontamination.

Each op is cross-checked against an independent pure-Python
recomputation (the DuckDB oracle in __spark_entry__ is the second,
engine-external check), and its physical plan shape is pinned:
pii_scrub must stay a shuffle-free scan projection; decontaminate must
broadcast the eval gram set so the training side never pre-shuffles.
"""

from __future__ import annotations

import re

import pytest

from blueprint_oss_spark.ops import curation as C

SF = '/root/testdata/sf0.001'


def _inject(doc_id: int, text: str) -> str:
  t = text
  if doc_id % 5 == 0:
    t += f' contact u{doc_id}@example.com'
  if doc_id % 7 == 0:
    t += f' call 555-{doc_id % 10000:04d}-0199'
  if doc_id % 11 == 0:
    t += f' from 10.{doc_id % 256}.0.{doc_id % 100}'
  return t


def test_pii_scrub_matches_python_re(spark):
  out = {r['doc_id']: r for r in C.pii_scrub(spark, SF).collect()}
  raw = {r['doc_id']: r['text']
         for r in spark.read.parquet(f'{SF}/documents.parquet').collect()}
  assert set(out) == set(raw)
  email = re.compile(C.EMAIL_PATTERN)
  phone = re.compile(C.PHONE_PATTERN)
  ip = re.compile(C.IPV4_PATTERN)
  n_hits = 0
  for did, text in raw.items():
    t = _inject(did, text)
    r = out[did]
    assert r['n_emails'] == len(email.findall(t))
    assert r['n_phones'] == len(phone.findall(t))
    assert r['n_ips'] == len(ip.findall(t))
    expect = phone.sub('<PHONE>',
                       ip.sub('<IP>', email.sub('<EMAIL>', t)))
    assert r['scrubbed'] == expect
    n_hits += r['n_emails'] + r['n_phones'] + r['n_ips']
  # the injection guarantees the op is actually exercised
  assert n_hits > 0
  assert any(out[d]['n_emails'] == 1 for d in out if d % 5 == 0)


def test_pii_scrub_plan_has_no_shuffle(spark):
  plan = C.pii_scrub(spark, SF)._jdf.queryExecution().executedPlan() \
      .toString()
  body = plan.split('Sort', 1)[0]  # orderBy at the sink is fine
  assert 'Exchange' not in body


def _py_ngrams(text: str, n: int) -> set[str]:
  toks = [t for t in re.split(r'\s+', text.strip().lower()) if t]
  return {' '.join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.parametrize('n', [3, 8])
def test_decontaminate_matches_python(spark, n):
  got = {r['doc_id']: r['n_shared']
         for r in C.decontaminate(spark, SF, n=n).collect()}
  docs = {r['doc_id']: r['text']
          for r in spark.read.parquet(f'{SF}/documents.parquet').collect()}
  ev = set()
  for did, text in docs.items():
    if did % 4 == 0:
      ev |= _py_ngrams(text, n)
  expect = {}
  for did, text in docs.items():
    if did % 4 == 0:
      continue
    shared = len(_py_ngrams(text, n) & ev)
    if shared:
      expect[did] = shared
  assert got == expect
  assert expect  # nonzero on this corpus — the op is exercised


def test_decontaminate_broadcasts_eval_side(spark):
  plan = C.decontaminate(spark, SF)._jdf.queryExecution() \
      .executedPlan().toString()
  assert 'BroadcastHashJoin' in plan
  # allowed shuffles: the eval-side distinct (small, feeds the
  # BroadcastExchange) and the contaminated-rows groupBy — never a
  # shuffle of the full training-side gram stream
  import re as _re
  hashes = _re.findall(r'Exchange hashpartitioning\((\w+)#', plan)
  assert sorted(hashes) == ['doc_id', 'gram']


def test_decontaminate_explicit_eval_table(spark):
  """Production shape: the eval set is an explicit table of texts; every
  training doc (none excluded) is checked against it."""
  docs = spark.read.parquet(f'{SF}/documents.parquet')
  ev = docs.filter('doc_id % 10 = 0').select('text')
  got = {r['doc_id']: r['n_shared']
         for r in C.decontaminate(spark, SF, n=8, eval_texts=ev)
         .collect()}
  raw = {r['doc_id']: r['text'] for r in docs.collect()}
  ev_grams = set()
  for did, text in raw.items():
    if did % 10 == 0:
      ev_grams |= _py_ngrams(text, 8)
  expect = {}
  for did, text in raw.items():
    shared = len(_py_ngrams(text, 8) & ev_grams)
    if shared:
      expect[did] = shared
  assert got == expect
  # eval docs themselves collide with their own grams → included here,
  # proving the explicit-table path checks ALL training docs
  assert any(d % 10 == 0 for d in expect)


def test_curation_pipeline_filtered_doc_cannot_bridge(spark, tmp_path):
  """Sequential curation semantics: dedup edges are computed AMONG the
  quality-filter survivors, so a quality-REJECTED document must not
  bridge two otherwise-unconnected near-dup groups (and must never be
  a group representative whose absence silently drops the group).

  Planted corpus: B (doc_id 5, no stopwords -> quality keep=0) is a
  near-dup of both A (6) and C (9) at Jaccard >= 0.8, while A and C sit
  at 0.75 < 0.8 of each other.  If edges leaked in from the full table,
  {5,6,9} would collapse to one component with min id 5 — a filtered
  doc — and A and C would vanish from the output.  Correct output: A,
  C and the unrelated D (11) all survive as singleton keepers (ids 6,
  9, 11 all pass the md5 'en' sample threshold)."""
  from blueprint_oss_spark.ops.textops import curation_pipeline

  core = ('alpha bravo charlie delta echo foxtrot golf hotel india '
          'juliet kilo lima mike november oscar papa quebec romeo '
          'sierra tango').split()
  assert len(core) == 20

  def shingles(words, n=3):
    return {' '.join(words[i:i + n]) for i in range(len(words) - n + 1)}

  b_words = core
  a_words = core + ['with', 'red', 'apples']
  c_words = core + ['by', 'tall', 'trees']
  j_ab = len(shingles(a_words) & shingles(b_words)) \
      / len(shingles(a_words) | shingles(b_words))
  j_bc = len(shingles(b_words) & shingles(c_words)) \
      / len(shingles(b_words) | shingles(c_words))
  j_ac = len(shingles(a_words) & shingles(c_words)) \
      / len(shingles(a_words) | shingles(c_words))
  assert j_ab >= 0.8 and j_bc >= 0.8 and j_ac < 0.8, (j_ab, j_bc, j_ac)

  rows = [
      (5, ' '.join(b_words), 'en', 'synthetic', 0),   # bridge, keep=0
      (6, ' '.join(a_words), 'en', 'synthetic', 0),
      (9, ' '.join(c_words), 'en', 'synthetic', 0),
      (11, 'the quick brown ferret jumps over seven lazy hounds today',
       'en', 'synthetic', 0),
  ]
  df = spark.createDataFrame(
      rows, 'doc_id long, text string, lang string, source string, '
            'n_chars long')
  df.write.parquet(str(tmp_path / 'documents.parquet'))

  out = {r['doc_id']: r for r in
         curation_pipeline(spark, str(tmp_path)).collect()}
  assert set(out) == {6, 9, 11}, sorted(out)
  for did in (6, 9, 11):
    assert out[did]['group_id'] == did
    assert out[did]['group_size'] == 1


def test_curation_pipeline_keep_best_longest(spark, tmp_path):
  """Keep-best representative (Dolma/RefinedWeb keep-the-longest):
  within a near-dup group the keeper row is still the id-min member,
  but best_id must point at the member with the MOST tokens (ties to
  the smaller doc_id).  Planted: X (id 17) = 20-word core, Y (id 19) =
  core + 4 extra words → 3-shingle Jaccard 18/22 ≈ 0.818 ≥ 0.8, one
  group, keeper 17, best 19 (all ids chosen to pass the md5 'en'
  sample threshold)."""
  from blueprint_oss_spark.ops.textops import curation_pipeline

  core = ('the alpha bravo charlie delta echo foxtrot golf hotel '
          'india juliet kilo lima mike november oscar papa quebec '
          'romeo sierra').split()
  assert len(core) == 20
  x_words = core
  y_words = core + ['verdant', 'meadow', 'beyond', 'ridge']

  rows = [
      (17, ' '.join(x_words), 'en', 'synthetic', 0),
      (19, ' '.join(y_words), 'en', 'synthetic', 0),
      (30, 'the quick brown ferret jumps over seven lazy hounds now',
       'en', 'synthetic', 0),
  ]
  df = spark.createDataFrame(
      rows, 'doc_id long, text string, lang string, source string, '
            'n_chars long')
  df.write.parquet(str(tmp_path / 'documents.parquet'))

  out = {r['doc_id']: r for r in
         curation_pipeline(spark, str(tmp_path)).collect()}
  assert set(out) == {17, 30}, sorted(out)
  assert out[17]['group_size'] == 2
  assert out[17]['best_id'] == 19          # longest member, not id-min
  assert out[17]['best_n_tokens'] == 24
  assert out[30]['best_id'] == 30          # singleton: itself
  assert out[30]['best_n_tokens'] == 10
