"""Deterministic fixture corpora: ASCII documents → interleaved span rows.

Per FIXTURES.md §1 — each maximal run of non-space characters on a line is
one text span; `offset` packs (page, line, col) so reading order and
synthetic geometry are both recoverable (see engine/runner.py docstring).
Media spans are inserted at seeded positions and must round-trip unchanged.

One corpus per reference example blueprint (README query, label-value /
aze_passports-style, tables, multipage, adversarial dense numerics).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

from .engine.runner import pack_offset

Span = Tuple[str, str, str, int]  # (kind, text, media_ref, offset)


def ascii_pages_to_spans(pages: Sequence[str], doc_id: str,
                         n_media: int = 0,
                         rng: Optional[random.Random] = None) -> List[Span]:
  """Convert ASCII page art to span rows (mock-doc word synthesis,
  reference: blueprint/integration_tests/mock_doc.py:37-80)."""
  spans: List[Span] = []
  for page_no, page in enumerate(pages):
    lines = page.split('\n')
    for line_no, line in enumerate(lines):
      start = None
      for i in range(len(line) + 1):
        ch = line[i] if i < len(line) else ' '
        if ch != ' ' and start is None:
          start = i
        elif ch == ' ' and start is not None:
          spans.append(('text', line[start:i], '',
                        pack_offset(page_no, line_no, start)))
          start = None
  if n_media and rng is not None:
    for k in range(n_media):
      if not spans:
        break
      # nudge media next to an existing span's position (offset+len keeps
      # interleave order deterministic and within packing bounds)
      anchor = rng.randrange(len(spans))
      base = spans[anchor][3]
      spans.append(('media', '', f'm/{doc_id}/{k}', base + 200 + k))
  spans.sort(key=lambda s: s[3])
  return spans


# ---------------------------------------------------------------------------
# Corpora.  Each generator returns a list of (doc_id, spans) rows; the
# matching blueprint comes from the *_blueprint() builders below.
# ---------------------------------------------------------------------------

_NAMES = ['Neil Patel', 'Ada Smith', 'Joe Kim', 'Mia Wong', 'Tom Reed',
          'Sue Park', 'Leo Cruz', 'Ana Bell']
_WORDS = ['alpha', 'beta', 'gamma', 'delta', 'report', 'summary', 'totals',
          'account', 'invoice', 'client', 'note', 'ref']


def _amount(rng: random.Random) -> str:
  d = rng.randrange(1, 99999)
  c = rng.randrange(0, 100)
  whole = f'{d:,}'
  return rng.choice([f'${whole}', f'${whole}.{c:02d}', f'{whole}.{c:02d}'])


def _date(rng: random.Random) -> str:
  m = rng.randrange(1, 13)
  d = rng.randrange(1, 29)
  y = rng.randrange(10, 30)
  return rng.choice([f'{m:02d}/{d:02d}/{y:02d}', f'{m:02d}-{d:02d}-20{y:02d}'])


def readme_corpus(n_docs: int, seed: int = 42,
                  with_media: bool = True) -> List[Tuple[str, List[Span]]]:
  """The README.md:9-26 query layout: a name label bottom-aligned with a
  dollar amount, an 'Annual $' label right-aligned above the amount, plus
  distractors."""
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    name = rng.choice(_NAMES)
    amount = _amount(rng)
    label_col = rng.randrange(0, 6)
    amt_col = label_col + len(name) + rng.randrange(3, 12)
    hdr_col = amt_col + len(amount) - len('Annual $')
    gap = rng.randrange(1, 3)
    lines = []
    lines.append('')
    # distractor line
    lines.append('  '.join(rng.sample(_WORDS, rng.randrange(2, 5))))
    hdr_line = [' '] * max(hdr_col + 9, 1)
    _put(hdr_line, max(hdr_col, 0), 'Annual $')
    lines.append(''.join(hdr_line).rstrip())
    lines.extend([''] * gap)
    row_line = [' '] * (amt_col + len(amount) + 2)
    _put(row_line, label_col, name)
    _put(row_line, amt_col, amount)
    lines.append(''.join(row_line).rstrip())
    lines.append(rng.choice(_WORDS) + ' ' + str(rng.randrange(100, 999)))
    art = '\n'.join(lines)
    doc_id = f'readme-{i:05d}'
    docs.append((doc_id, ascii_pages_to_spans(
        [art], doc_id, n_media=rng.randrange(0, 3) if with_media else 0,
        rng=rng)))
  return docs


def _put(buf: List[str], col: int, text: str) -> None:
  while len(buf) < col + len(text):
    buf.append(' ')
  for k, ch in enumerate(text):
    buf[col + k] = ch


def labelvalue_corpus(n_docs: int, seed: int = 43,
                      with_media: bool = True) \
    -> List[Tuple[str, List[Span]]]:
  """Top-down and left-to-right label/value pairs (dates + dollars),
  patterned on aze_passports.py / rules/label.py."""
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    date = _date(rng)
    amount = _amount(rng)
    col1 = rng.randrange(0, 4)
    col2 = col1 + 24 + rng.randrange(0, 6)
    lines = ['']
    l1 = [' ']
    _put(l1, col1, 'Issue date')
    _put(l1, col2, 'Total due')
    lines.append(''.join(l1).rstrip())
    l2 = [' ']
    _put(l2, col1, date)
    _put(l2, col2, amount)
    lines.append(''.join(l2).rstrip())
    lines.append('')
    l3 = [' ']
    _put(l3, col1, 'Name:')
    _put(l3, col1 + 7, rng.choice(_NAMES))
    lines.append(''.join(l3).rstrip())
    lines.append('  '.join(rng.sample(_WORDS, 3)))
    doc_id = f'lv-{i:05d}'
    docs.append((doc_id, ascii_pages_to_spans(
        ['\n'.join(lines)], doc_id,
        n_media=rng.randrange(0, 2) if with_media else 0, rng=rng)))
  return docs


def table_corpus(n_docs: int, seed: int = 44) \
    -> List[Tuple[str, List[Span]]]:
  """2-D grids with header row/column (paystub-earnings-like,
  reference: examples/paystubs/paystubs.py:362-446)."""
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    c0, c1, c2 = 0, 14, 28
    lines = ['']
    h = [' ']
    _put(h, c1, 'current')
    _put(h, c2, 'ytd')
    lines.append(''.join(h).rstrip())
    r1 = [' ']
    amt11 = f'{rng.randrange(100, 9999)}.{rng.randrange(0, 100):02d}'
    amt12 = f'{rng.randrange(10000, 99999)}.{rng.randrange(0, 100):02d}'
    _put(r1, c0, 'gross')
    _put(r1, c1, amt11)
    _put(r1, c2, amt12)
    lines.append(''.join(r1).rstrip())
    r2 = [' ']
    amt21 = f'{rng.randrange(100, 9999)}.{rng.randrange(0, 100):02d}'
    amt22 = f'{rng.randrange(10000, 99999)}.{rng.randrange(0, 100):02d}'
    _put(r2, c0, 'net')
    _put(r2, c1, amt21)
    _put(r2, c2, amt22)
    lines.append(''.join(r2).rstrip())
    doc_id = f'tbl-{i:05d}'
    docs.append((doc_id,
                 ascii_pages_to_spans(['\n'.join(lines)], doc_id)))
  return docs


def multipage_corpus(n_docs: int, seed: int = 45) \
    -> List[Tuple[str, List[Span]]]:
  """3-page docs with per-page markers (reference:
  integration_tests/test_multipage.py:14-61)."""
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    pages = []
    for p in range(3):
      lines = ['']
      lines.append(f'Page {p + 1}')
      lines.append('')
      lines.append(f'{rng.choice(_WORDS)} {rng.randrange(10, 99)}')
      if p == 1:
        lines.append('Amount due ' + _amount(rng))
      pages.append('\n'.join(lines))
    doc_id = f'mp-{i:05d}'
    docs.append((doc_id, ascii_pages_to_spans(pages, doc_id)))
  return docs


def adversarial_corpus(n_docs: int, seed: int = 46) \
    -> List[Tuple[str, List[Span]]]:
  """Dense numeric rows with missing punctuation — exercises overlapping
  sub-phrase dollar candidates (reference: clustering.py:29-43)."""
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    lines = ['', 'amounts']
    nums = [f'{rng.randrange(10, 99)}' for _ in range(rng.randrange(4, 7))]
    lines.append(' '.join(nums))
    lines.append('total ' + _amount(rng))
    doc_id = f'adv-{i:05d}'
    docs.append((doc_id,
                 ascii_pages_to_spans(['\n'.join(lines)], doc_id)))
  return docs


# ---------------------------------------------------------------------------
# Blueprints for the corpora (our DSL).
# ---------------------------------------------------------------------------

def readme_blueprint():
  """The README.md:9-26 query."""
  from .model.nodes import extract
  from .model.rules import (
      bottom_aligned, is_dollar_amount, right_aligned, text_equals)
  return extract(
      text_equals('Neil Patel')('patel_label'),
      is_dollar_amount('patel_revenue'),
      bottom_aligned('patel_label', 'patel_revenue'),
      text_equals('Annual $')('annual_revenue_label'),
      right_aligned('annual_revenue_label', 'patel_revenue'))


def labelvalue_blueprint():
  from .model.nodes import combine, extract
  from .model.rules import (
      is_date, is_dollar_amount, is_entire_phrase,
      is_left_to_right_label_value_pair, is_top_down_label_value_pair,
      text_equals)
  issue = extract(
      text_equals('Issue date')('issue_label'),
      is_date('issue_date'),
      is_top_down_label_value_pair('issue_label', 'issue_date'))
  total = extract(
      text_equals('Total due')('total_label'),
      is_dollar_amount('total_due'),
      is_top_down_label_value_pair('total_label', 'total_due'))
  name = extract(
      text_equals('Name:')('name_label'),
      is_entire_phrase('name_value'),
      is_left_to_right_label_value_pair('name_label', 'name_value'))
  return combine(issue, total, name).with_name('labelvalue')


def table_blueprint():
  from .model.nodes import extract
  from .model.rules import is_dollar_amount, table, text_equals
  return extract(
      text_equals('current')('cur_label'),
      text_equals('ytd')('ytd_label'),
      text_equals('gross')('gross_label'),
      text_equals('net')('net_label'),
      is_dollar_amount('gross_cur'),
      is_dollar_amount('gross_ytd'),
      is_dollar_amount('net_cur'),
      is_dollar_amount('net_ytd'),
      table([
          [None, 'cur_label', 'ytd_label'],
          ['gross_label', 'gross_cur', 'gross_ytd'],
          ['net_label', 'net_cur', 'net_ytd'],
      ]))


def multipage_blueprint():
  from .model.nodes import extract
  from .model.rules import (
      is_dollar_amount, is_left_to_right_label_value_pair, page_number_is,
      text_equals)
  return extract(
      text_equals('Amount due', taper=3)('due_label'),
      is_dollar_amount('due'),
      is_left_to_right_label_value_pair('due_label', 'due'),
      page_number_is({1: 0.5, 2: 1.0, 3: 0.5})('due'))


def adversarial_blueprint():
  from .model.nodes import extract
  from .model.rules import (
      is_dollar_amount, is_left_to_right_label_value_pair, text_equals)
  return extract(
      text_equals('total')('total_label'),
      is_dollar_amount('total'),
      is_left_to_right_label_value_pair('total_label', 'total'))


ALL_CORPORA = {
    'readme': (readme_corpus, readme_blueprint),
    'labelvalue': (labelvalue_corpus, labelvalue_blueprint),
    'table': (table_corpus, table_blueprint),
    'multipage': (multipage_corpus, multipage_blueprint),
    'adversarial': (adversarial_corpus, adversarial_blueprint),
}
