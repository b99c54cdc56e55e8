"""Bill-of-lading model parity (reference
examples/bill_of_lading/bill_of_lading.py — the reference ships no
sample documents for it, so parity runs on synthesized ASCII fixtures
through BOTH engines)."""

import random

import pytest

from blueprint_oss_spark.bp_examples.bill_of_lading import root as our_root
from blueprint_oss_spark.engine.entity_gen import build_doc_pool
from blueprint_oss_spark.engine.runner import spans_to_pages
from blueprint_oss_spark.engine.solver import best_extraction
from blueprint_oss_spark.fixtures import ascii_pages_to_spans

from .refshim import load_reference_example, reference_doc_from_spans


def _bol_doc(rng: random.Random):
  """One synthetic bill of lading, ~90 cols x 36 rows (fractional page
  regions matter: numbers upper-right, addresses upper-left, ports in
  the 0.2-0.5 band, ship date in the bottom third)."""
  # reference numbers must be ≤50% letters (is_reference_number)
  bol_no = (''.join(rng.choice('ABCDEFGHIJ') for _ in range(2))
            + ''.join(rng.choice('0123456789') for _ in range(9)))
  book_no = (''.join(rng.choice('KLMNOP') for _ in range(2))
             + ''.join(rng.choice('0123456789') for _ in range(8)))
  port_l = rng.choice(['ROTTERDAM', 'SINGAPORE', 'SHANGHAI'])
  port_d = rng.choice(['OAKLAND', 'HAMBURG', 'BUSAN'])
  vessel = rng.choice(['MV AURORA', 'MV PELICAN', 'MV ORION'])
  date = f'{rng.randrange(1,13):02d}/{rng.randrange(1,29):02d}/21'
  addr = ['ACME EXPORT CO', '12 DOCK ROAD', 'SUITE 9', 'METROPOLIS']

  W = 90
  lines = [''] * 36
  def put(row, col, text):
    s = lines[row]
    s = s + ' ' * max(0, col + len(text) - len(s))
    lines[row] = s[:col] + text + s[col + len(text):]

  put(1, 60, 'Bill of lading no.')
  put(2, 60, bol_no)
  put(4, 60, 'Booking no')
  put(5, 60, book_no)
  put(1, 2, 'Shipper')
  for i, a in enumerate(addr):
    put(2 + i, 2, a)
  put(7, 2, 'Consignee')
  put(8, 2, 'TO ORDER')
  put(9, 30, 'Notify')
  for i, a in enumerate(addr[:3]):
    put(10 + i, 30, a)
  put(10, 2, 'Port of loading')
  put(11, 2, port_l)
  put(13, 2, 'Port of discharge')
  put(14, 2, port_d)
  put(16, 2, 'Vessel')
  put(17, 2, vessel)
  put(30, 4, 'Shipped on board')
  put(30, 24, date)
  put(35, 0, 'x' + ' ' * (W - 2) + 'y')  # pin the page width/height
  return '\n'.join(lines), {
      'BOL_number': bol_no, 'booking_number': book_no,
      'port_of_loading': port_l, 'port_of_discharge': port_d,
      'vessel': vessel, 'ship_date': date,
  }


def test_bol_extraction_matches_reference():
  from bp.config import Config
  from bp.run import run_model

  ns = load_reference_example(
      '/root/reference/examples/bill_of_lading/bill_of_lading.py')
  ref_root = ns['bill_of_lading']

  rng = random.Random(4711)
  hits = 0
  for k in range(3):
    page, truth = _bol_doc(rng)
    spans = ascii_pages_to_spans([page], f'bol-{k}')
    ref_doc = reference_doc_from_spans(f'bol-{k}', spans)
    res = run_model(ref_doc, ref_root, Config(num_samples=100,
                                              timeout=-1))
    tops = res.root.top_20_extractions
    best_score = tops[0].score
    ref_fields = {p.field: (p.entity.entity_text or '')
                  for p in tops[0].extraction.points()}

    pool = build_doc_pool(f'bol-{k}', spans_to_pages(spans))
    assign, _, score = best_extraction(our_root, pool)
    ours = {f: pool.etext[e] for f, e in assign.items()}
    assert score >= best_score - 1e-9, (k, score, best_score, ours,
                                        ref_fields)
    n_tied = sum(1 for se in tops if se.score == best_score)
    if abs(score - best_score) <= 1e-9 and n_tied == 1:
      assert ours == ref_fields, (k, ours, ref_fields)
    # sanity: the model actually finds the planted values
    if ours.get('BOL_number') == truth['BOL_number']:
      hits += 1
  assert hits >= 2, 'model rarely finds the planted BOL number'
