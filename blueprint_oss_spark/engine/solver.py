"""Per-document extraction solver.

Re-implements the execution semantics of blueprint-oss's bound tree
(bp/tree.py, bp/bound_tree.py, bp/scoring.py) as materialized candidate
lists with exact merge scoring.  The solver returns the *best* extraction —
the same result as the reference pumped to exhaustion
(run_model with Config(num_samples=-1), bp/run.py:50-67).

Replicated reference quirks (intentional, for output parity):
  * PatternNode flattens connective rules to atoms, so a Disjunction inside
    a pattern behaves conjunctively (bp/tree.py:340-341).
  * Leaf-level connective rules act as validity filters only; their scores
    are discarded (BoundLeafNode yields the pre-merge extraction,
    bp/bound_tree.py:112-129).
  * MergeNode's own spanning rules are never scored
    (BoundMergeNode.__next__ passes the child through,
    bp/bound_tree.py:197-199).
  * Leaf candidate counting for join ordering uses the pattern's original
    atoms with field-set == {field}; the final bound leaves use the
    flattened atoms (bp/tree.py:324-338 vs 761-802).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

from ..model.nodes import (
    CombineNode, EmptyNode, LeafNode, MergeNode, Node, PatternNode,
    PickBestNode, combine, optimize_rule_distribution,
)
from ..model.rules import (
    Atom, Conjunction, Connective, Disjunction, Field, Rule, get_atoms,
)
from .docmodel import DocPool
from .kernels import score_predicate

MINIMUM_FIELD_SCORE = 0.1  # strict lower bound (bp/scoring.py:196-200)

# (pattern id, candidate-count signature) → per-doc ordered combine tree.
_ORDERED_TREE_CACHE: Dict = {}

# Safety valve for candidate-list materialization (the reference has a 45 s
# per-doc SIGALRM instead, bp/cli/run_model.py:32).
MAX_PAIRS_PER_COMBINE = 4_000_000


class SolverBudgetError(RuntimeError):
  pass


class SolverTimeoutError(RuntimeError):
  pass


# Per-document wall-clock deadline (reference: 45 s SIGALRM per doc,
# bp/cli/run_model.py:32 + bp/timeout.py — executors can't use signals, so
# the hot loops poll time.monotonic() instead).  Thread-local, not a
# module global: the threaded Studio server solves concurrent requests
# in one process, and one request's deadline must not cancel another's.
import threading as _threading

_DEADLINE_TLS = _threading.local()


def set_deadline(t: Optional[float]) -> None:
  _DEADLINE_TLS.t = t


def _check_deadline() -> None:
  t = getattr(_DEADLINE_TLS, 't', None)
  if t is not None:
    import time
    if time.monotonic() > t:
      raise SolverTimeoutError()


@dataclass(slots=True)
class SE:
  """A scored extraction (reference: bp/scoring.py:44-171)."""
  assign: Dict[Field, int]          # field -> entity id (assigned only)
  field_scores: Dict[Field, float]  # may include 0.0 for absent fields
  rule_scores: Dict[int, float]     # rid -> score cache
  mass: int
  score: float

  @property
  def is_empty(self) -> bool:
    return not self.assign

  def valid(self) -> bool:
    for f in self.assign:
      if not self.field_scores[f] > MINIMUM_FIELD_SCORE:
        return False
    return True


class _ScoreCache:
  """Per-document (predicate, entity-ids) → score memo.  Scores are pure
  functions of (predicate, entities, doc), so cross-merge caching cannot
  change semantics — it only avoids recomputing e.g. impingement sweeps
  for the same entity pair under different partial assignments."""

  __slots__ = ('doc', 'memo')

  def __init__(self, doc: DocPool):
    self.doc = doc
    self.memo: Dict = {}

  def atom_score(self, atom: Atom, eids: Tuple[int, ...]) -> float:
    # keyed by predicate object identity — the tree is fixed for the
    # lifetime of the cache, and id() avoids re-hashing large predicate
    # param tuples in the hot loop
    key = (id(atom.predicate), eids)
    got = self.memo.get(key)
    if got is None:
      got = score_predicate(atom.predicate, self.doc, eids)
      self.memo[key] = got
    return got


class _RuleMeta:
  """Bind-time metadata for one rule at one node."""

  __slots__ = ('rule', 'fields', 'is_atom', 'atoms')

  def __init__(self, rule: Rule):
    self.rule = rule
    self.fields = rule.fieldset
    self.is_atom = isinstance(rule, Atom)
    # (atom, fields_frozenset) pairs for the atom-cache pass
    self.atoms = tuple((a, a.fieldset) for a in get_atoms(rule))


def _rule_score(rule: Rule, assign: Dict[Field, int],
                sc: _ScoreCache) -> float:
  """Score a rule against an assignment; atoms with missing fields score 1
  (bp/rule.py:249-256, conjunction/disjunction bp/rule.py:306-321)."""
  if isinstance(rule, Atom):
    if any(f not in assign for f in rule.fields):
      return 1.0
    return sc.atom_score(rule, tuple(assign[f] for f in rule.fields))
  if isinstance(rule, Disjunction):
    return max(_rule_score(r, assign, sc) for r in rule.rules)
  # Conjunction
  s = 1.0
  for r in rule.rules:
    s *= _rule_score(r, assign, sc)
  return s


def _upper_bound(rule: Rule, akeys, cache: Dict[int, float]) -> float:
  """reference: bp/scoring.py:267-284.  All decidable atoms were already
  cached by the merge atom pass, so no predicate evaluation happens here —
  non-decidable atoms bound to 1."""
  got = cache.get(rule.rid)
  if got is not None:
    return got
  if isinstance(rule, Atom):
    return 1.0  # decidable atoms are always in the cache
  if isinstance(rule, Disjunction):
    subs = [_upper_bound(r, akeys, cache) for r in rule.rules]
    return max(subs) if subs else 1.0
  s = 1.0
  for r in rule.rules:
    s *= _upper_bound(r, akeys, cache)
  return s


def merge_fast(ses: Sequence[SE], meta: Sequence[_RuleMeta], mass: int,
               sc: _ScoreCache) -> SE:
  """Exact replica of bp/scoring.py:217-264 over precomputed rule
  metadata."""
  if len(ses) == 2:
    a, b = ses
    assign = {**a.assign, **b.assign}
    rule_scores = {**a.rule_scores, **b.rule_scores}
    field_scores = {**a.field_scores, **b.field_scores}
  else:
    assign = {}
    field_scores = {}
    rule_scores = {}
    for se in ses:
      assign.update(se.assign)
      rule_scores.update(se.rule_scores)
      field_scores.update(se.field_scores)
  akeys = frozenset(assign)

  # Cache all decidable atoms of all rules (bp/scoring.py:234-237).
  for m in meta:
    for atom, afields in m.atoms:
      if afields <= akeys and atom.rid not in rule_scores:
        rule_scores[atom.rid] = sc.atom_score(
            atom, tuple(assign[f] for f in atom.fields))

  decidable = []
  early_exits = []
  for m in meta:
    if m.fields <= akeys:
      decidable.append(m)
    elif not m.is_atom:
      # Early exits BEFORE multiplication (bp/scoring.py:249-251); a
      # non-decidable Atom always has upper bound 1, so only
      # connectives can early-exit.
      if _upper_bound(m.rule, akeys, rule_scores) == 0:
        early_exits.append(m)

  for m in decidable:
    rid = m.rule.rid
    s = rule_scores[rid] if rid in rule_scores \
        else _rule_score(m.rule, assign, sc)
    for f in m.rule.fields:
      if f in assign:
        field_scores[f] *= s
    rule_scores[rid] = s

  for m in early_exits:
    for f in m.rule.fields:
      if f in assign:
        field_scores[f] = 0.0

  score = sum(field_scores.values()) / mass
  return SE(assign, field_scores, rule_scores, mass, score)


def merge(ses: Sequence[SE], rules: Sequence[Rule], mass: int,
          doc: DocPool) -> SE:
  """Back-compat wrapper building metadata on the fly."""
  return merge_fast(ses, [_RuleMeta(r) for r in rules], mass,
                    _ScoreCache(doc))


# ---------------------------------------------------------------------------
# Leaf candidate generation (bp/tree.py:68-96, 228-262).
# ---------------------------------------------------------------------------

def leaf_candidates(doc: DocPool, etype: str,
                    atom_rules: Sequence[Atom],
                    memo: Dict, count_only: bool = False) \
    -> List[Tuple[int, float, Dict[int, float]]]:
  """Scored (entity, field_score, atom_scores) candidates of one leaf,
  sorted by score descending (stable), validity-cutoff applied.

  Memoized per (predicate multiset, type) — the reference's lru-cached
  `assignments()` (bp/tree.py:68-96)."""
  key = (tuple(a.predicate for a in atom_rules), etype)
  got = memo.get(key)
  if got is None:
    import numpy as np

    from .kernels import predicate_scores_bounded_01, \
        score_predicate_batch

    cur = doc.entities_of_type(etype)
    score = np.ones(len(cur))
    per_atom: List[Tuple[int, np.ndarray]] = []
    # Progressive cutoff: predicate scores live in [0,1] (unless a
    # custom predicate is present), so the running product only shrinks
    # — entities at or below MINIMUM_FIELD_SCORE after any atom can be
    # dropped immediately.  The per-atom multiply order matches the
    # reference exactly (1.0·s₁·s₂·…), so survivors' floats are
    # bit-identical to the scalar path.
    can_mask = all(predicate_scores_bounded_01(a.predicate)
                   for a in atom_rules)
    for a in atom_rules:
      if len(cur) == 0:
        per_atom.append((a.rid, np.zeros(0)))
        continue
      s = score_predicate_batch(a.predicate, doc, cur)
      score = score * s
      if can_mask:
        keep = score > MINIMUM_FIELD_SCORE
        if not keep.all():
          cur = cur[keep]
          score = score[keep]
          s = s[keep]
          per_atom = [(rid, arr[keep]) for rid, arr in per_atom]
      per_atom.append((a.rid, s))
    if not can_mask and len(cur):
      keep = score > MINIMUM_FIELD_SCORE
      cur = cur[keep]
      score = score[keep]
      per_atom = [(rid, arr[keep]) for rid, arr in per_atom]
    cands = [
        (int(cur[i]), float(score[i]),
         {rid: float(arr[i]) for rid, arr in per_atom})
        for i in range(len(cur))]
    cands.sort(key=lambda c: -c[1])  # stable
    memo[key] = cands
    got = cands
  return got


# ---------------------------------------------------------------------------
# Bound nodes with materialized candidate lists.
# ---------------------------------------------------------------------------

@dataclass(slots=True)
class Bound:
  legal_fields: FrozenSet[Field]
  mass: int
  cands: List[SE]  # sorted score-descending; includes/ends with the empty SE


def _empty_se(fields: FrozenSet[Field], atom_rules: Sequence[Atom],
              mass: int) -> SE:
  # Leaf empty extraction carries 0.0 field scores and 1.0 atom scores
  # (bp/scoring.py:287-307 with assignment None).
  return SE({}, {f: 0.0 for f in fields},
            {a.rid: 1.0 for a in atom_rules}, mass, 0.0)


def bind_node(node: Node, doc: DocPool, memo: Dict,
              need_all: bool = True) -> Bound:
  if isinstance(node, EmptyNode):
    return Bound(frozenset(), 1, [])
  return _continue_bind(node, doc, memo, need_all)

def _score_cache(doc: DocPool, memo: Dict) -> _ScoreCache:
  sc = memo.get('_score_cache')
  if sc is None:
    sc = _ScoreCache(doc)
    memo['_score_cache'] = sc
  return sc


#: rid-keyed process-global _RuleMeta cache: rules are immutable and
#: rids are process-unique (re-drawn at unpickle), so metadata survives
#: across documents instead of being rebuilt per (doc, node) bind.
_RULE_META_CACHE: Dict[int, _RuleMeta] = {}


def _rule_meta(rules: Sequence[Rule], memo: Dict) -> List[_RuleMeta]:
  key = ('_meta', tuple(id(r) for r in rules))
  got = memo.get(key)
  if got is None:
    got = []
    for r in rules:
      m = _RULE_META_CACHE.get(r.rid)
      if m is None or m.rule is not r:
        m = _RuleMeta(r)
        if len(_RULE_META_CACHE) < 65536:
          _RULE_META_CACHE[r.rid] = m
      got.append(m)
    memo[key] = got
  return got


def _continue_bind(node: Node, doc: DocPool, memo: Dict,
                   need_all: bool = True) -> Bound:
  sc = _score_cache(doc, memo)

  if isinstance(node, LeafNode):
    atoms = [r for r in node.rules if isinstance(r, Atom)]
    others = [r for r in node.rules if not isinstance(r, Atom)]
    raw = leaf_candidates(doc, node.entity_type, atoms, memo)
    cands: List[SE] = []
    for (e, score, scores) in raw:
      if others:
        # Validity-only connective check; score discarded
        # (bp/bound_tree.py:112-129).
        v = score
        for r in others:
          v *= _rule_score(r, {node.field: e}, sc)
        if not v > MINIMUM_FIELD_SCORE:
          continue
      cands.append(SE({node.field: e}, {node.field: score}, dict(scores),
                      1, score))
    cands.append(_empty_se(node.legal_fields, atoms, 1))
    return Bound(node.legal_fields, 1, cands)

  if isinstance(node, CombineNode):
    b1 = bind_node(node.node1, doc, memo)
    b2 = bind_node(node.node2, doc, memo)
    meta = _rule_meta(node.rules, memo)
    if not need_all:
      return _bind_combine_best(b1, b2, meta, node.all_or_nothing, sc)
    return _bind_combine(b1, b2, meta, node.all_or_nothing, sc)

  if isinstance(node, MergeNode):
    # MergeNode executes as a fresh combine chain; its own spanning rules
    # are never scored (bp/tree.py:455-461, bp/bound_tree.py:197-199).
    return bind_node(combine(*node.children), doc, memo, need_all)

  if isinstance(node, PickBestNode):
    if not need_all and not node.rules:
      # Only the best is needed and there are no node rules (rule
      # pushdown always empties PickBest rules, bp/tree.py:854-858):
      # renormalization sum(fs)/mass is order-preserving within each
      # (sorted) child list, so the argmax over children's heads is the
      # argmax over the whole union — and each child therefore only
      # needs its own best (need=1 propagates).
      children = [bind_node(c, doc, memo, need_all=False)
                  for c in node.children]
      mass = max(c.mass for c in children)
      legal = frozenset().union(*(c.legal_fields for c in children))
      meta = _rule_meta(node.rules, memo)
      out = []
      for c in children:
        if c.cands:
          out.append(merge_fast([c.cands[0]], meta, mass, sc))
      out.sort(key=lambda s: -s.score)
      return Bound(legal, mass, out)
    children = [bind_node(c, doc, memo) for c in node.children]
    mass = max(c.mass for c in children)
    legal = frozenset().union(*(c.legal_fields for c in children))
    meta = _rule_meta(node.rules, memo)
    out = []
    for c in children:
      for se in c.cands:
        m = merge_fast([se], meta, mass, sc)
        if m.valid():
          out.append(m)
    out.sort(key=lambda s: -s.score)
    return Bound(legal, mass, out)

  if isinstance(node, PatternNode):
    return bind_pattern(node, doc, memo)

  raise TypeError(f'unknown node type {type(node)}')


def _merge_plan(meta: Sequence[_RuleMeta], akeys: FrozenSet[Field],
                bkeys: FrozenSet[Field]) -> List[tuple]:
  """Precompute, for one (assigned-fields-of-a, assigned-fields-of-b)
  bucket, exactly the work _merge_pair does per pair: which rules are
  decidable, which side supplies each atom field, which undecidable
  connectives get their decidable atoms cached + an upper-bound check.
  Candidate lists contain only a handful of distinct assigned-field sets
  (full or empty under all_or_nothing), so this hoists the per-pair
  field-membership scans out of the O(|a|·|b|) loop.  Semantics are
  byte-identical to the original fused merge (bp/scoring.py:217-264):
  ops execute in meta order, preserving the extra-atom-cache
  accumulation the upper bound sees."""
  union = akeys | bkeys
  plan: List[tuple] = []
  for m in meta:
    if m.fields <= union:
      rule = m.rule
      src = tuple((f in akeys, f) for f in rule.fields) if m.is_atom \
          else None
      plan.append(('d', m, rule.rid, m.is_atom, rule, src))
    elif not m.is_atom:
      cached_atoms = tuple(
          (atom, atom.rid, tuple((f in akeys, f) for f in atom.fields))
          for (atom, afields) in m.atoms if afields <= union)
      touches = bool(m.fields & union)
      plan.append(('p', m, cached_atoms, touches))
  return plan


def _merge_pair_planned(a: SE, b: SE, plan: Sequence[tuple], mass: int,
                        sc: _ScoreCache) -> Optional[SE]:
  """_merge_pair with the bucket-invariant work precomputed by
  _merge_plan.  See _merge_pair for the semantics contract."""
  a_assign = a.assign
  b_assign = b.assign
  a_rs = a.rule_scores
  b_rs = b.rule_scores

  decidable: List = []
  # incremental dict (insertion-ordered like the former pair list);
  # _bound_fast only READS it, so sharing one growing dict across ops
  # is behavior-identical to rebuilding dict(pairs) per op
  extra_atom_scores: Dict[int, float] = {}

  for op in plan:
    if op[0] == 'd':
      _, m, rid, is_atom, rule, src = op
      s = a_rs.get(rid)
      if s is None:
        s = b_rs.get(rid)
      if s is None:
        if is_atom:
          s = sc.atom_score(rule, tuple(
              a_assign[f] if fa else b_assign[f] for fa, f in src))
        else:
          s = _connective_score(rule, a_assign, b_assign, sc)
        extra_atom_scores[rid] = s
      if s == 0.0:
        return None
      decidable.append((m, s))
    else:
      _, m, cached_atoms, touches = op
      for (atom, rid, src) in cached_atoms:
        s = a_rs.get(rid)
        if s is None:
          s = b_rs.get(rid)
        if s is None:
          s = sc.atom_score(atom, tuple(
              a_assign[f] if fa else b_assign[f] for fa, f in src))
        extra_atom_scores[rid] = s
      bound = _bound_fast(m.rule, a_assign, b_assign, a_rs, b_rs,
                          extra_atom_scores)
      if bound == 0.0 and touches:
        return None

  field_scores = {**a.field_scores, **b.field_scores}
  for (m, s) in decidable:
    if s != 1.0:
      for f in m.rule.fields:
        field_scores[f] *= s

  assign = {**a_assign, **b_assign}
  for f in assign:
    if not field_scores[f] > MINIMUM_FIELD_SCORE:
      return None

  rule_scores = {**a_rs, **b_rs}
  for rid, s in extra_atom_scores.items():
    if rid not in rule_scores:
      rule_scores[rid] = s
  for (m, s) in decidable:
    rule_scores[m.rule.rid] = s

  score = sum(field_scores.values()) / mass
  return SE(assign, field_scores, rule_scores, mass, score)


def _merge_pair(a: SE, b: SE, meta: Sequence[_RuleMeta], mass: int,
                sc: _ScoreCache) -> Optional[SE]:
  """Fused 2-way merge: one metadata scan; the output dicts are built
  only when the pair survives.  Exactly bp/scoring.py:217-264 for pairs
  that survive; pairs returning None are exactly the ones merge would
  produce as invalid (a decidable rule scored 0, a 0-upper-bound early
  exit touched an assigned field, or a field score fell to ≤ 0.1)."""
  a_assign = a.assign
  b_assign = b.assign
  a_rs = a.rule_scores
  b_rs = b.rule_scores

  decidable: List = []       # (_RuleMeta, score)
  early_exit_meta: List = []
  extra_atom_scores: List = []  # (rid, score) cached-atom pass results

  for m in meta:
    decid = True
    for f in m.rule.fields:
      if f not in a_assign and f not in b_assign:
        decid = False
        break
    if decid:
      rid = m.rule.rid
      s = a_rs.get(rid)
      if s is None:
        s = b_rs.get(rid)
      if s is None:
        if m.is_atom:
          atom = m.rule
          s = sc.atom_score(atom, tuple(
              a_assign[f] if f in a_assign else b_assign[f]
              for f in atom.fields))
          extra_atom_scores.append((rid, s))
        else:
          # connective: recompute from atoms (reference recomputes too,
          # bp/scoring.py:243-247 TODO note)
          s = _connective_score(m.rule, a_assign, b_assign, sc)
          extra_atom_scores.append((rid, s))
      if s == 0.0:
        return None  # zeroes an assigned field → invalid
      decidable.append((m, s))
    else:
      if not m.is_atom:
        # early exit check (bp/scoring.py:249-261); cache decidable
        # atoms of this rule first, as the reference's atom pass does
        bound = 1.0
        for atom, afields in m.atoms:
          ok = True
          for f in atom.fields:
            if f not in a_assign and f not in b_assign:
              ok = False
              break
          if ok:
            rid = atom.rid
            s = a_rs.get(rid)
            if s is None:
              s = b_rs.get(rid)
            if s is None:
              s = sc.atom_score(atom, tuple(
                  a_assign[f] if f in a_assign else b_assign[f]
                  for f in atom.fields))
            extra_atom_scores.append((rid, s))
        bound = _bound_fast(m.rule, a_assign, b_assign, a_rs, b_rs,
                            dict(extra_atom_scores))
        if bound == 0.0:
          touches = any(f in a_assign or f in b_assign
                        for f in m.rule.fields)
          if touches:
            return None
          early_exit_meta.append(m)

  field_scores = {**a.field_scores, **b.field_scores}
  for (m, s) in decidable:
    if s != 1.0:
      for f in m.rule.fields:
        if f in a_assign or f in b_assign:
          field_scores[f] *= s

  assign = {**a_assign, **b_assign}
  for f in assign:
    if not field_scores[f] > MINIMUM_FIELD_SCORE:
      return None

  rule_scores = {**a_rs, **b_rs}
  for rid, s in extra_atom_scores:
    if rid not in rule_scores:
      rule_scores[rid] = s
  for (m, s) in decidable:
    rule_scores[m.rule.rid] = s

  score = sum(field_scores.values()) / mass
  return SE(assign, field_scores, rule_scores, mass, score)


def _connective_score(rule: Rule, a_assign: Dict[Field, int],
                      b_assign: Dict[Field, int], sc: _ScoreCache) \
    -> float:
  if isinstance(rule, Atom):
    for f in rule.fields:
      if f not in a_assign and f not in b_assign:
        return 1.0
    return sc.atom_score(rule, tuple(
        a_assign[f] if f in a_assign else b_assign[f]
        for f in rule.fields))
  if isinstance(rule, Disjunction):
    return max(_connective_score(r, a_assign, b_assign, sc)
               for r in rule.rules)
  s = 1.0
  for r in rule.rules:
    s *= _connective_score(r, a_assign, b_assign, sc)
  return s


def _bound_fast(rule: Rule, a_assign, b_assign, a_rs, b_rs,
                extra: Dict[int, float]) -> float:
  got = extra.get(rule.rid)
  if got is None:
    got = a_rs.get(rule.rid)
  if got is None:
    got = b_rs.get(rule.rid)
  if got is not None:
    return got
  if isinstance(rule, Atom):
    return 1.0  # decidable atoms were cached above
  if isinstance(rule, Disjunction):
    subs = [_bound_fast(r, a_assign, b_assign, a_rs, b_rs, extra)
            for r in rule.rules]
    return max(subs) if subs else 1.0
  s = 1.0
  for r in rule.rules:
    s *= _bound_fast(r, a_assign, b_assign, a_rs, b_rs, extra)
  return s


def _bind_combine_best(b1: Bound, b2: Bound, meta: Sequence[_RuleMeta],
                       all_or_nothing: bool, sc: _ScoreCache) -> Bound:
  """Exact best-only combine via branch-and-bound over the sorted child
  lists.  The merged score is bounded by
      (a.score·a.mass + b.score·b.mass) / mass
  since node rules only multiply field scores by values ≤ 1, so pairs
  whose bound cannot exceed the best-so-far are skipped.  Pairs are
  visited in the materializing path's (i, j) order with strictly-better
  replacement, so the tie-winner is identical to sorting the full list
  and taking the head."""
  legal = b1.legal_fields | b2.legal_fields
  mass = b1.mass + b2.mass
  gate_aon = all_or_nothing and b1.legal_fields and b2.legal_fields
  n_legal = len(legal)
  m1, m2 = b1.mass, b2.mass
  bkeys_of = [frozenset(b.assign) for b in b2.cands]
  plans: Dict[Tuple[FrozenSet[Field], FrozenSet[Field]], List[tuple]] = {}
  best: Optional[SE] = None
  for a in b1.cands:
    _check_deadline()
    a_sum = a.score * m1
    if best is not None and b2.cands \
        and (a_sum + b2.cands[0].score * m2) / mass <= best.score:
      break  # b1 sorted desc → no later a can beat best either
    a_assign = a.assign
    a_empty = not a_assign
    na = len(a_assign)
    akeys = frozenset(a_assign)
    for j, b in enumerate(b2.cands):
      if best is not None \
          and (a_sum + b.score * m2) / mass <= best.score:
        break  # b2 sorted desc
      if gate_aon:
        if a_empty != (not b.assign):
          continue
        if not a_empty and na + len(b.assign) != n_legal:
          continue
      pkey = (akeys, bkeys_of[j])
      plan = plans.get(pkey)
      if plan is None:
        plan = _merge_plan(meta, akeys, bkeys_of[j])
        plans[pkey] = plan
      m = _merge_pair_planned(a, b, plan, mass, sc)
      if m is None:
        continue
      if all_or_nothing and not m.is_empty \
          and len(m.assign) != n_legal:
        continue
      if best is None or m.score > best.score:
        best = m
  return Bound(legal, mass, [best] if best is not None else [])


def _bind_combine(b1: Bound, b2: Bound, meta: Sequence[_RuleMeta],
                  all_or_nothing: bool, sc: _ScoreCache) -> Bound:
  legal = b1.legal_fields | b2.legal_fields
  mass = b1.mass + b2.mass
  if len(b1.cands) * len(b2.cands) > MAX_PAIRS_PER_COMBINE:
    raise SolverBudgetError(
        f'combine product {len(b1.cands)}x{len(b2.cands)} exceeds budget')
  gate_aon = all_or_nothing and b1.legal_fields and b2.legal_fields
  n_legal = len(legal)
  bkeys_of = [frozenset(b.assign) for b in b2.cands]
  plans: Dict[Tuple[FrozenSet[Field], FrozenSet[Field]], List[tuple]] = {}
  out: List[SE] = []
  for a in b1.cands:
    _check_deadline()
    a_assign = a.assign
    a_empty = not a_assign
    na = len(a_assign)
    akeys = frozenset(a_assign)
    for j, b in enumerate(b2.cands):
      if gate_aon:
        # full-or-empty gate before any scoring work
        if a_empty != (not b.assign):
          continue
        if not a_empty and na + len(b.assign) != n_legal:
          continue
      pkey = (akeys, bkeys_of[j])
      plan = plans.get(pkey)
      if plan is None:
        plan = _merge_plan(meta, akeys, bkeys_of[j])
        plans[pkey] = plan
      m = _merge_pair_planned(a, b, plan, mass, sc)
      if m is None:
        continue
      if all_or_nothing and not m.is_empty \
          and len(m.assign) != n_legal:
        continue
      out.append(m)
  out.sort(key=lambda s: -s.score)  # stable; ties keep (i, j) order
  return Bound(legal, mass, out)


# ---------------------------------------------------------------------------
# Pattern binding: per-document join ordering (bp/tree.py:302-423, 761-802).
# ---------------------------------------------------------------------------

def _flatten_rules(rules: Sequence[Rule]) -> List[Atom]:
  """Connectives → their atoms (bp/tree.py:340-341)."""
  out: List[Atom] = []
  for r in rules:
    if isinstance(r, Connective):
      out.extend(r.atoms)
    else:
      out.append(r)
  return out


def _components(atoms: Sequence[Atom]) -> List[FrozenSet[Field]]:
  """Connected components of the field multigraph
  (bp/graphs.py:81-102)."""
  parent: Dict[Field, Field] = {}

  def find(x: Field) -> Field:
    while parent[x] != x:
      parent[x] = parent[parent[x]]
      x = parent[x]
    return x

  for a in atoms:
    for f in a.fields:
      parent.setdefault(f, f)
    fs = list(a.fields)
    for f in fs[1:]:
      ra, rb = find(fs[0]), find(f)
      if ra != rb:
        parent[rb] = ra

  comps: Dict[Field, set] = {}
  for f in parent:
    comps.setdefault(find(f), set()).add(f)
  return [frozenset(v) for v in comps.values()]


def bind_pattern(node: PatternNode, doc: DocPool, memo: Dict) -> Bound:
  field_types = node.field_types
  fields = node.legal_fields

  # Leaf-candidate counts for ordering (bp/tree.py:324-338): original
  # pattern rules with field-set == {f}, atoms only, plus the empty.
  counts: Dict[Field, int] = {}
  for f in fields:
    f_only = frozenset((f,))
    leaf_rules = [r for r in node.rules if r.fieldset == f_only]
    atoms = [r for r in leaf_rules if isinstance(r, Atom)]
    counts[f] = len(leaf_candidates(doc, field_types[f], atoms, memo)) + 1

  flat = _flatten_rules(node.rules)
  comps = _components(flat)

  # Weighted multigraphs per component (bp/tree.py:348-373).
  graphs = []
  for comp in comps:
    edges: Dict[Tuple[Field, Field], List[float]] = {}
    for a in flat:
      if not comp.issuperset(a.fields):
        continue
      if len(a.fields) == 1:
        edge = (a.fields[0], a.fields[0])
      elif len(a.fields) == 2:
        v1, v2 = a.fields
        edge = (v1, v2) if v1 < v2 else (v2, v1)
      else:
        continue  # no ≥3-ary base predicates get graph edges
      edges.setdefault(edge, []).append(a.predicate.leniency())
    graphs.append((comp, edges))

  def estimated_valid(comp: FrozenSet[Field],
                      edges: Dict[Tuple[Field, Field], List[float]]) \
      -> float:
    leniency = 1.0
    for ws in edges.values():
      for w in ws:
        leniency *= w
    total = 1.0
    for f in comp:
      total *= counts[f]
    return total * leniency

  graphs.sort(key=lambda g: (estimated_valid(*g), tuple(sorted(g[0]))))

  # The ordered tree depends on the pattern and the per-field candidate
  # counts only; documents with identical counts share it (worker-global
  # cache — the tree objects are immutable).
  cache_key = (id(node), tuple(sorted(counts.items())))
  entry = _ORDERED_TREE_CACHE.get(cache_key)
  # The entry pins `node` so its id() cannot be recycled by a later
  # unpickle; the identity check guards against a stale entry whose node
  # address was freed before this cache was last cleared.
  if entry is not None and entry[0] is node:
    child = bind_node(entry[1], doc, memo)
    return _pattern_public(node, child)

  def plan_tree(comp: FrozenSet[Field],
                edges: Dict[Tuple[Field, Field], List[float]]) \
      -> Tuple[Tuple[Field, Field], ...]:
    """Greedy min-cost pairing (bp/tree.py:761-802), scalar phase only:
    returns the (survivor, absorbed) merge steps.  The (cheap) pairing
    depends on the per-doc candidate counts; the (expensive) Node
    construction + rule pushdown depend only on these steps, so they are
    cached by step signature across documents whose counts differ but
    pair identically."""
    def prod_weight(ws: List[float]) -> float:
      p = 1.0
      for w in ws:
        p *= w
      return p

    vertex_w: Dict[Field, float] = {
        f: counts[f] * (prod_weight(edges[(f, f)]) if (f, f) in edges
                        else 1.0)
        for f in comp}
    cur_edges = dict(edges)
    vertices = set(comp)
    steps: List[Tuple[Field, Field]] = []

    def edge_key(e: Tuple[Field, Field]) -> float:
      return vertex_w[e[0]] * vertex_w[e[1]] * prod_weight(cur_edges[e])

    while len(vertices) > 1:
      nonself = [e for e in sorted(cur_edges) if e[0] != e[1]]
      if not nonself:
        raise SolverBudgetError(
            f'component {sorted(vertices)} has no pairable edges')
      best = min(nonself, key=edge_key)
      w = edge_key(best)
      steps.append(best)
      vertex_w[best[0]] = w
      # collapse best[1] into best[0] (bp/graphs.py:144-162)
      u, old = best[0], best[1]
      new_edges: Dict[Tuple[Field, Field], List[float]] = {}
      for (a, b), ws in cur_edges.items():
        a2 = u if a == old else a
        b2 = u if b == old else b
        e2 = (a2, b2) if (a2 <= b2) else (b2, a2)
        if e2 in new_edges:
          new_edges[e2] = ws + new_edges[e2]
        else:
          new_edges[e2] = ws
      cur_edges = new_edges
      vertices.discard(old)

    return tuple(steps)

  if not graphs:
    # A pattern with no rules yields only the empty extraction.
    return Bound(node.public_fields, max(1, len(node.public_fields)),
                 [SE({}, {}, {}, 1, 0.0)])

  plans = [(comp, plan_tree(comp, edges)) for comp, edges in graphs]

  # Second-level cache: counts differ across documents far more often
  # than the pairing they induce does, so the realized + rule-pushed
  # tree is keyed by the merge-step signature.
  sig_key = (id(node), tuple((tuple(sorted(comp)), steps)
                             for comp, steps in plans))
  entry = _ORDERED_TREE_CACHE.get(sig_key)
  if entry is not None and entry[0] is node:
    root = entry[1]
  else:
    def realize(comp: FrozenSet[Field],
                steps: Tuple[Tuple[Field, Field], ...]) -> Node:
      nodes: Dict[Field, Node] = {
          f: LeafNode(field=f, entity_type=field_types[f]) for f in comp}
      for (u, old) in steps:
        nodes[u] = combine(nodes[u], nodes[old], all_or_nothing=True)
      remaining = set(comp) - {old for _, old in steps}
      return nodes[next(iter(remaining))]

    trees = [realize(comp, steps) for comp, steps in plans]
    root = reduce(lambda a, b: combine(a, b, all_or_nothing=True), trees)
    root = optimize_rule_distribution(root, tuple(flat))
    if len(_ORDERED_TREE_CACHE) > 4096:
      _ORDERED_TREE_CACHE.clear()
    _ORDERED_TREE_CACHE[sig_key] = (node, root)
  # The sig_key-hit path inserts here too, so the cap must also guard
  # this insert — many distinct count profiles can map to few pairings.
  if len(_ORDERED_TREE_CACHE) > 4096:
    _ORDERED_TREE_CACHE.clear()
  _ORDERED_TREE_CACHE[cache_key] = (node, root)
  child = bind_node(root, doc, memo)
  return _pattern_public(node, child)


def _pattern_public(node: PatternNode, child: Bound) -> Bound:
  """Filter the pattern child's extractions to public fields
  (bp/bound_tree.py:150-175)."""
  public = node.public_fields
  mass = len(public)
  out: List[SE] = []
  for se in child.cands:
    out.append(SE(
        {f: e for f, e in se.assign.items() if f in public},
        {f: s for f, s in se.field_scores.items() if f in public},
        se.rule_scores, mass, se.score))
  return Bound(public, mass, out)


# ---------------------------------------------------------------------------
# Entry point.
# ---------------------------------------------------------------------------

def best_extraction(root: Node, doc: DocPool,
                    pre_optimized: bool = False) \
    -> Tuple[Dict[Field, int], Dict[Field, float], float]:
  """Best extraction of the optimized tree on one document — matches the
  reference pumped to exhaustion (first strictly-better kept,
  bp/bound_tree.py:61-65).

  Returns (assignment field→entity id, field scores, score)."""
  if pre_optimized:
    optimized = root
  else:
    optimized = optimize_rule_distribution(root)
    optimized.validate()
  memo: Dict = {}
  bound = bind_node(optimized, doc, memo, need_all=False)
  if not bound.cands:
    return {}, {}, 0.0
  best = bound.cands[0]  # lists are sorted desc, stable
  return dict(best.assign), dict(best.field_scores), best.score


def top_extractions(root: Node, doc: DocPool, k: int = 20) \
    -> List[Tuple[Dict[Field, int], float]]:
  """Top-k extractions of the optimized tree (the reference results sink
  records top-20 per node, bp/results.py:57-68).  Runs the full
  materializing path (no need-1 pruning)."""
  optimized = optimize_rule_distribution(root)
  optimized.validate()
  memo: Dict = {}
  bound = bind_node(optimized, doc, memo, need_all=True)
  return [(dict(se.assign), se.score) for se in bound.cands[:k]]
