"""WIIF ("why is it failing"): score every decidable rule of a model
against a target extraction — the reference's debugging utility
(bp/synthesis/wiif.py:25-51), driver-side."""

from __future__ import annotations

from typing import Dict, List

from ..model.nodes import Node
from ..model.rules import Field, Rule
from .docmodel import DocPool
from .solver import _rule_score, _ScoreCache


def get_rule_scores(assign: Dict[Field, int], node: Node,
                    doc: DocPool) -> Dict[int, float]:
  """rid → score for every rule in the tree decidable under `assign`."""
  sc = _ScoreCache(doc)

  def all_rules(n: Node) -> List[Rule]:
    out = list(n.rules)
    for c in n.child_nodes:
      out.extend(all_rules(c))
    return out

  fields = frozenset(assign)
  return {r.rid: _rule_score(r, assign, sc)
          for r in all_rules(node)
          if frozenset(r.fields) <= fields}


def why_is_it_failing(assign: Dict[Field, int], node: Node,
                      doc: DocPool) -> dict:
  """Per-node decidable rule scores as a nested dict tree."""
  rule_scores = get_rule_scores(assign, node, doc)

  def build(n: Node) -> dict:
    return {
        'name': n.name or type(n).__name__,
        'rule_scores': {str(r): rule_scores[r.rid]
                        for r in n.rules if r.rid in rule_scores},
        'children': [build(c) for c in n.child_nodes],
    }

  return build(node)
