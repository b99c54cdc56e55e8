"""Blueprint synthesis: induce a PatternNode from one labeled example,
and a PickBest-of-patterns model from a labeled corpus.

Semantics mirror the reference synthesizer
(bp/synthesis/synthesize.py:30-128, bp/synthesis/rules.py:43-253):
  * labels get exact-text rules (quote-stripped; tolerance 0 for short
    texts, 1 otherwise)
  * typed fields get is_date / is_dollar_amount / ... schema rules; any
    field whose assignment is a maximal phrase gets is_entire_phrase
  * spatial structure: pairwise bottom/left/right alignment at score
    ≥ 0.8 → connected components → row/column rules + ordering rules +
    nothing-between impingement rules, all validated at score > 0.8
  * documents whose synthesized spatial rule-sets coincide group into one
    PatternNode; the model is a pick_best over the groups.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain, combinations
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

from ..model.nodes import Node, PatternNode, PickBestNode
from ..model.rules import (
    Atom, Field, Rule, bottom_aligned, bottom_aligned_pair, is_date,
    is_dollar_amount, is_entire_phrase, is_person_name, is_address,
    left_aligned, left_aligned_pair, left_to_right, left_to_right_pair,
    nothing_between_horizontally, nothing_between_vertically,
    right_aligned, right_aligned_pair, text_is_one_of, top_down,
    top_down_pair,
)
from .docmodel import DocPool
from .kernels import score_predicate

MINIMUM_SCORE = 0.8  # reference: bp/synthesis/rules.py:43


@dataclass(frozen=True)
class SchemaEntry:
  """reference: bp/targets.py schema rows (field, type, is_label)."""
  field: Field
  type: str = 'Text'
  is_label: bool = False


Point = Tuple[Field, int]  # (field, entity id)


def _text_equals_rule(text: str):
  """reference: bp/synthesis/rules.py:57-62."""
  text = text.replace('"', '')
  tolerance = 0 if len(text) < 4 else 1
  return text_is_one_of((text,), tolerance=tolerance)


def find_textual_rules(assign: Dict[Field, int], labels: FrozenSet[Field],
                       doc: DocPool) -> Tuple[Rule, ...]:
  return tuple(
      Atom((f,), _text_equals_rule(doc.etext[assign[f]]))
      for f in assign if f in labels)


_TYPE_PREDICATES = {
    'Date': is_date,
    'DollarAmount': is_dollar_amount,
    'PersonName': is_person_name,
    'Address': is_address,
}


def find_type_rules(assign: Dict[Field, int],
                    schema: Sequence[SchemaEntry],
                    doc: DocPool) -> Tuple[Rule, ...]:
  out: List[Rule] = []
  for f in assign:
    if score_predicate(is_entire_phrase, doc,
                       (assign[f],)) >= MINIMUM_SCORE:
      out.append(Atom((f,), is_entire_phrase))
  type_map = {e.field: e.type for e in schema if e.field in assign}
  for f in type_map:
    if type_map[f] in _TYPE_PREDICATES:
      out.append(Atom((f,), _TYPE_PREDICATES[type_map[f]]))
  return tuple(out)


def _components(pairs: Sequence[Tuple[Point, Point]]) \
    -> List[FrozenSet[Point]]:
  parent: Dict[Point, Point] = {}

  def find(x: Point) -> Point:
    while parent[x] != x:
      parent[x] = parent[parent[x]]
      x = parent[x]
    return x

  for (a, b) in pairs:
    parent.setdefault(a, a)
    parent.setdefault(b, b)
    ra, rb = find(a), find(b)
    if ra != rb:
      parent[rb] = ra
  comps: Dict[Point, set] = {}
  for p in parent:
    comps.setdefault(find(p), set()).add(p)
  return [frozenset(v) for v in comps.values()]


def find_spatial_rules(assign: Dict[Field, int],
                       doc: DocPool) -> Tuple[Rule, ...]:
  """reference: bp/synthesis/rules.py:65-188."""
  points = sorted(assign.items())  # extraction.points() is field-sorted

  def tabular_components(pred, sort_by_x: bool) \
      -> List[Tuple[Point, ...]]:
    key = (lambda p: float(doc.ex0[p[1]])) if sort_by_x \
        else (lambda p: float(doc.ey0[p[1]]))
    spts = sorted(points, key=key)
    pairs = [
        (p1, p2) for (p1, p2) in combinations(spts, 2)
        if score_predicate(pred, doc, (p1[1], p2[1])) >= MINIMUM_SCORE]
    comps = _components(pairs)
    return [tuple(sorted(c, key=key)) for c in comps]

  rows = tabular_components(bottom_aligned_pair(), sort_by_x=True)
  left_cols = tabular_components(left_aligned_pair(), sort_by_x=False)
  right_cols = tabular_components(right_aligned_pair(), sort_by_x=False)

  def trim(components: List[Tuple[Point, ...]], left_side: bool) \
      -> List[Tuple[Point, ...]]:
    """Drop row-mates from a column, keeping the point whose center is
    closest to the column edge (bp/synthesis/rules.py:98-121)."""
    def edge(p: Point) -> float:
      return float(doc.ex0[p[1]] if left_side else doc.ex1[p[1]])

    out = []
    for comp in components:
      comp = tuple(comp)
      for row_ in rows:
        if not comp:
          break
        col_edge = sum(edge(p) for p in comp) / len(comp)

        def offset(p: Point) -> float:
          cx = (doc.ex0[p[1]] + doc.ex1[p[1]]) / 2
          return abs(col_edge - float(cx))

        if frozenset(p[0] for p in row_) <= frozenset(p[0] for p in comp):
          keep = min(row_, key=offset)  # arg_min keeps first minimum...
          # reference arg_min returns the first strict improvement
          # (functional.py:8-24) — min() with key is equivalent (first
          # minimal wins ties in both)
          comp = tuple(p for p in comp if p not in row_ or p == keep)
      if comp:
        out.append(comp)
    return out

  left_cols = trim(left_cols, True)
  right_cols = trim(right_cols, False)

  def eliminate_subsets(c1, c2):
    return [a for a in c1
            if all(not frozenset(b) >= frozenset(a) for b in c2)]

  left_cols = eliminate_subsets(left_cols, right_cols)
  right_cols = eliminate_subsets(right_cols, left_cols)

  def component_rules(comp: Tuple[Point, ...], builder, order_builder,
                      order_pred) -> Tuple[Rule, ...]:
    validated: set = set()
    for (p1, p2) in zip(comp, comp[1:]):
      if score_predicate(order_pred, doc,
                         (p1[1], p2[1])) > MINIMUM_SCORE:
        validated.add(p1[0])
        validated.add(p2[0])
    fields = tuple(p[0] for p in comp if p[0] in validated)
    if len(fields) < 2:
      return tuple()
    return (builder(*fields), order_builder(*fields))

  def impingement_rules(components, pred) -> Tuple[Rule, ...]:
    out = []
    for comp in components:
      for (p1, p2) in zip(comp, comp[1:]):
        if score_predicate(pred, doc, (p1[1], p2[1])) >= MINIMUM_SCORE:
          out.append(Atom((p1[0], p2[0]), pred))
    return tuple(out)

  rules: List[Rule] = []
  for comp in rows:
    rules.extend(component_rules(comp, bottom_aligned, left_to_right,
                                 left_to_right_pair()))
  for comp in left_cols:
    rules.extend(component_rules(comp, left_aligned, top_down,
                                 top_down_pair()))
  for comp in right_cols:
    rules.extend(component_rules(comp, right_aligned, top_down,
                                 top_down_pair()))
  rules.extend(impingement_rules(left_cols + right_cols,
                                 nothing_between_vertically))
  rules.extend(impingement_rules(rows, nothing_between_horizontally))

  return validate_rules(tuple(rules), assign, doc)


def validate_rules(rules: Tuple[Rule, ...], assign: Dict[Field, int],
                   doc: DocPool) -> Tuple[Rule, ...]:
  """Keep only rules scoring > 0.8 on the example
  (bp/synthesis/rules.py:191-215; atoms first, then conjunctions with
  invalid atoms dropped)."""
  def valid_atom(a: Rule) -> Optional[Rule]:
    s = score_predicate(a.predicate, doc,
                        tuple(assign[f] for f in a.fields))
    return a if s > MINIMUM_SCORE else None

  atoms = [valid_atom(r) for r in rules if isinstance(r, Atom)]
  conjs = []
  for r in rules:
    if not isinstance(r, Atom):
      kept = tuple(a for a in (valid_atom(x) for x in r.rules)
                   if a is not None)
      conjs.append(
          type(r)(rules=kept, name=r.name) if kept else None)
  return tuple(r for r in atoms + conjs if r is not None)


def find_rules_for_extraction(assign: Dict[Field, int],
                              schema: Sequence[SchemaEntry],
                              doc: DocPool):
  labels = frozenset(e.field for e in schema if e.is_label)
  return (find_textual_rules(assign, labels, doc),
          find_type_rules(assign, schema, doc),
          find_spatial_rules(assign, doc))


def synthesize_pattern_node(assign: Dict[Field, int],
                            schema: Sequence[SchemaEntry],
                            doc: DocPool) -> PatternNode:
  """One labeled example → PatternNode
  (reference: bp/synthesis/synthesize.py:30-39)."""
  textual, typed, spatial = find_rules_for_extraction(assign, schema, doc)
  type_map = {f: doc.etype[e] for f, e in assign.items()}
  node = PatternNode(rules=tuple(chain(textual, typed, spatial)),
                     fields=tuple(sorted(type_map.items())))
  node.validate()
  return node


def synthesize_model(examples: Sequence[Tuple[Dict[Field, int], DocPool]],
                     schema: Sequence[SchemaEntry]) -> Node:
  """Labeled corpus → pick_best of PatternNodes, grouping documents with
  identical spatial rule-sets and unioning label vocabularies
  (reference: bp/synthesis/synthesize.py:72-128)."""
  groups: Dict[Tuple, List] = {}
  for assign, doc in examples:
    textual, typed, spatial = find_rules_for_extraction(
        assign, schema, doc)
    key = tuple(spatial)
    groups.setdefault(key, []).append((textual, typed, spatial, assign,
                                       doc))

  nodes: List[PatternNode] = []
  for rule_sets in groups.values():
    spatial = rule_sets[0][2]
    typed = rule_sets[0][1]
    text_options: Dict[Field, FrozenSet[str]] = {}
    for (textual, _, _, _, _) in rule_sets:
      for rule in textual:
        f = rule.fields[0]
        texts = frozenset(rule.predicate.p('texts'))
        text_options[f] = text_options.get(f, frozenset()) | texts
    generalized = tuple(
        Atom((f,), text_is_one_of(tuple(text_options[f])))
        for f in frozenset(text_options))
    rules = tuple(chain(spatial, generalized, typed))
    fields = frozenset(chain.from_iterable(r.fields for r in rules))
    type_map = {e.field: e.type for e in schema}
    node = PatternNode(
        rules=rules,
        fields=tuple(sorted((f, type_map.get(f, 'Text'))
                            for f in fields)))
    node.validate()
    nodes.append(node)

  if not nodes:
    raise RuntimeError('No rule sets found')
  root = PickBestNode(children=tuple(nodes))
  root.validate()
  return root
