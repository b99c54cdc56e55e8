"""Comparison tables for accuracy reports.

Parity surface: bp/compare.py (tabulate / Row / Cluster /
render_cluster(s) / draw_table) — the text-table renderer the reference
uses to compare extracted values against targets and to diff engine
revisions.  Output is byte-identical to the reference renderer for the
same inputs (asserted in tests/test_compare.py).

`targets_comparison_clusters` builds the per-document "extracted vs
targets" clusters from our engine's output + a Targets object, giving
the same report the reference workflow produces.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Sequence, Tuple


def tabulate(rows_in: Iterable[Iterable[Any]]) -> str:
  """Left-justified table; column widths from the widest (maximal) rows;
  None renders as ''."""
  rows = tuple(tuple(str(c) if c is not None else '' for c in row)
               for row in rows_in)
  nonempty = tuple(r for r in rows if len(r) > 0)
  if not nonempty:
    return ''
  width = max(len(r) for r in rows)
  maximal = tuple(r for r in rows if len(r) == width)
  col_widths = tuple(max(len(cell) for cell in col)
                     for col in zip(*maximal))

  def line(row: Tuple[str, ...]) -> str:
    return '  '.join(cell.ljust(w) for cell, w in zip(row, col_widths))

  return '\n'.join(line(r) for r in rows)


@dataclass(frozen=True)
class Row:
  name: str
  dictionary: Dict[str, str]


@dataclass(frozen=True)
class Cluster:
  heading: Tuple[Tuple[str, str], ...]
  rows: Tuple[Row, ...]
  checkmarks: Dict[str, bool]


def render_cluster(cluster: Cluster, keys: Iterable[str]) \
    -> List[List[str]]:
  keys = tuple(keys)

  def header(key: str) -> str:
    return key + (' ✓' if cluster.checkmarks.get(key, False)
                  else ' ✗')

  out: List[List[str]] = [[k, v] for k, v in cluster.heading]
  out.append([''] + [header(k) for k in keys])
  out.extend([row.name] + [str(row.dictionary[k]) for k in keys]
             for row in cluster.rows)
  out.append([])
  return out


def render_clusters(clusters: Iterable[Cluster],
                    keys: Iterable[str]) -> str:
  keys = tuple(keys)
  rows: List[List[str]] = []
  for c in clusters:
    rows.extend(render_cluster(c, keys))
  return tabulate(rows)


def draw_table(rows: Sequence[Sequence[str]]) -> str:
  """Right-justified numeric-style table (first column left-justified);
  all rows must be the same width."""
  lengths = {len(r) for r in rows}
  if len(lengths) > 1:
    raise ValueError('all rows must have same number of entries')
  col_widths = tuple(max(len(cell) for cell in col)
                     for col in zip(*rows))

  def line(row: Sequence[str]) -> str:
    return ' '.join(
        cell.ljust(w) if i == 0 else cell.rjust(w)
        for i, (cell, w) in enumerate(zip(row, col_widths)))

  return '\n'.join(line(r) for r in rows) + '\n'


def targets_comparison_clusters(
    extracted: Dict[str, Dict[str, str]],
    targets) -> Tuple[Tuple[Cluster, ...], Tuple[str, ...]]:
  """Build (clusters, field keys) comparing engine output to targets.

  extracted: doc_name → field → extracted text (missing field =
  unassigned).  targets: model.targets.Targets.  Match rule identical to
  targets.accuracy_dataframe (exact text; None target = must be
  unassigned)."""
  keys = tuple(sorted({a.field
                       for dt in targets.doc_targets
                       for a in dt.assignments}))
  clusters = []
  for dt in targets.doc_targets:
    got = extracted.get(dt.doc_name, {})
    want = {a.field: a.value.text for a in dt.assignments}
    heading = [('doc name', dt.doc_name)]
    if dt.notes:
      heading.append(('notes', dt.notes))
    clusters.append(Cluster(
        heading=tuple(heading),
        rows=(Row('extracted', {k: got.get(k) or '' for k in keys}),
              Row('targets', {k: want.get(k) or '' for k in keys})),
        checkmarks={k: got.get(k) == want.get(k)
                    for k in keys if k in want}))
  return tuple(clusters), keys
