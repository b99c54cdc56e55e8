"""Deterministic paystub-style fixture docs for the flagship paystubs
model (layout families from the reference examples: simple earnings
table, LTR label/value long tail, top-down long tail)."""

from __future__ import annotations

import random
from typing import List, Tuple

from ..fixtures import Span, _put, ascii_pages_to_spans


def _amt(rng: random.Random, lo: int, hi: int) -> Tuple[str, float]:
  d = rng.randrange(lo, hi)
  c = rng.randrange(0, 100)
  return f'{d:,}.{c:02d}', d + c / 100.0


def _date(rng: random.Random) -> str:
  return (f'{rng.randrange(1, 13):02d}/{rng.randrange(1, 29):02d}/'
          f'{rng.randrange(20, 30):02d}')


def paystub_corpus(n_docs: int, seed: int = 52) \
    -> List[Tuple[str, List[Span]]]:
  rng = random.Random(seed)
  docs = []
  for i in range(n_docs):
    layout = i % 3
    gross, gross_v = _amt(rng, 1000, 9000)
    # keep business-logic inequalities satisfied under the engine's
    # punctuation-stripping numeric coercion
    net_cents = int(gross_v * 100 * 0.78)
    net = f'{net_cents // 100:,}.{net_cents % 100:02d}'
    ytd_gross_cents = int(gross_v * 100) * 4
    ytd_gross = f'{ytd_gross_cents // 100:,}.{ytd_gross_cents % 100:02d}'
    ytd_net_cents = int(net_cents) * 4
    ytd_net = f'{ytd_net_cents // 100:,}.{ytd_net_cents % 100:02d}'
    d1, d2, d3 = _date(rng), _date(rng), _date(rng)

    if layout == 0:
      # simple earnings table + LTR net pay + LTR dates
      lines = ['']
      l = [' ']; _put(l, 0, 'Period Beginning:'); _put(l, 19, d1)
      lines.append(''.join(l).rstrip())
      l = [' ']; _put(l, 0, 'Period Ending:'); _put(l, 19, d2)
      lines.append(''.join(l).rstrip())
      l = [' ']; _put(l, 0, 'Pay Date:'); _put(l, 19, d3)
      lines.append(''.join(l).rstrip())
      lines.append('')
      c0, c1, c2 = 0, 22, 40
      l = [' ']; _put(l, c0, 'Earnings')
      _put(l, c1 + 7 - len('Current'), 'Current')
      _put(l, c2 + 12 - len('Year to date'), 'Year to date')
      lines.append(''.join(l).rstrip())
      l = [' ']; _put(l, c0, 'Gross pay')
      _put(l, c1 + 7 - len(gross), gross)
      _put(l, c2 + 12 - len(ytd_gross), ytd_gross)
      lines.append(''.join(l).rstrip())
      lines.append('')
      l = [' ']; _put(l, 0, 'Net pay'); _put(l, 14, net)
      lines.append(''.join(l).rstrip())
    elif layout == 1:
      # LTR label/value long tail everywhere
      lines = ['']
      for label, val in [('Pay period begin', d1),
                         ('Pay period end', d2),
                         ('Check Date:', d3),
                         ('Gross pay', gross),
                         ('Net pay', net),
                         ('YTD gross', ytd_gross),
                         ('YTD net pay', ytd_net)]:
        l = [' ']; _put(l, 1, label); _put(l, 20, val)
        lines.append(''.join(l).rstrip())
        lines.append('')
    else:
      # top-down label/value pairs
      lines = ['']
      c0, c1, c2, c3 = 1, 22, 42, 62
      l = [' ']
      _put(l, c0, 'Current'); _put(l, c1, 'YTD')
      lines.append(''.join(l).rstrip())
      lines.append('')
      l = [' ']
      _put(l, c0, 'Gross pay'); _put(l, c1, 'Gross YTD')
      _put(l, c2, 'Net pay'); _put(l, c3, 'Net YTD')
      lines.append(''.join(l).rstrip())
      l = [' ']
      _put(l, c0, gross); _put(l, c1, ytd_gross)
      _put(l, c2, net); _put(l, c3, ytd_net)
      lines.append(''.join(l).rstrip())
      lines.append('')
      l = [' ']; _put(l, c0, 'Pay Date:'); _put(l, c0 + 11, d3)
      lines.append(''.join(l).rstrip())
    doc_id = f'stub-{i:05d}'
    docs.append((doc_id,
                 ascii_pages_to_spans(['\n'.join(lines)], doc_id)))
  return docs
