"""Deterministic check-document fixtures for the checks model.

The reference ships no sample inputs for examples/checks/checks.py, so
parity runs on synthesized ASCII check layouts (same approach as
bill_of_lading): date + check-number labels up top, payor block, pay-to
line with payee and dollar amount, payee address, anchor words.

Every 4th document is a TALL page (content pushed past pixel row 800)
so the is_in_pixel_page_region custom predicates (800px TOP_DOWN /
1000px BOTTOM_UP cutoffs, examples/checks/checks.py:69-104) score
non-trivially — on short pages `y_offset >= page_height` short-circuits
them to 1.0 in both engines.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from ..fixtures import ascii_pages_to_spans

Span = Tuple[str, str, str, int]

_PAYORS = ['Acme Supply Co', 'Globex Corp', 'Initech LLC',
           'Stark Industries', 'Wayne Enterprises', 'Hooli Inc']
_PAYEES = ['John Doe', 'Jane Roe', 'Alex Chen', 'Sam Patel',
           'Max Weber', 'Ada Byron']
_STREETS = ['Main St', 'Oak Dr', 'Elm Road', 'Pine Blvd', 'Lake Drive']
_STATES = ['IL', 'OR', 'NY', 'TX', 'CA', 'WA']


def _amount(rng: random.Random) -> str:
  return f'{rng.randrange(1, 9999):,}.{rng.randrange(0, 100):02d}'


def _date(rng: random.Random) -> str:
  return (f'{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}/'
          f'{rng.randrange(10, 30):02d}')


def _put(buf: List[str], col: int, text: str) -> None:
  while len(buf) < col + len(text):
    buf.append(' ')
  for k, ch in enumerate(text):
    buf[col + k] = ch


def check_corpus(n_docs: int, seed: int = 57) \
    -> List[Tuple[str, List[Span]]]:
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    tall = i % 4 == 3
    payor = rng.choice(_PAYORS)
    payee = rng.choice(_PAYEES)
    street_payor = f'{rng.randrange(10, 999)} {rng.choice(_STREETS)}'
    street_payee = f'{rng.randrange(10, 999)} {rng.choice(_STREETS)}'
    state_payor = f'Springfield {rng.choice(_STATES)}'
    state_payee = f'Portland {rng.choice(_STATES)}'
    amount = _amount(rng)
    number = f'{rng.randrange(10000, 999999)}'
    lines: List[str] = ['']

    def line(*puts, pad: int = 0):
      buf: List[str] = [' '] * pad
      for col, text in puts:
        _put(buf, col, text)
      lines.append(''.join(buf).rstrip())

    line((2, 'Date:'), (9, _date(rng)), (34, 'No.'), (38, number))
    lines.append('')
    line((2, payor))
    line((2, street_payor))
    line((2, state_payor))
    lines.append('')
    line((2, 'Pay to'), (12, payee), (32, '$'), (34, amount))
    line((12, street_payee))
    line((12, state_payee))
    lines.append('')
    if tall:
      # push the anchor deep down the page so the 800px TOP_DOWN and
      # 1000px BOTTOM_UP pixel regions bite
      lines.extend([''] * 840)
    line((2, rng.choice(['Authorized Signature', 'Void',
                         'Signature', 'Watermark'])))
    doc_id = f'chk-{i:05d}'
    docs.append((doc_id,
                 ascii_pages_to_spans(['\n'.join(lines)], doc_id)))
  return docs
