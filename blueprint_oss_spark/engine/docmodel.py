"""Per-document entity pool, array-backed.

Re-expresses the reference's object-graph Document/Entity model
(blueprint-oss `bp/document.py`, `bp/entity.py`) as flat parallel arrays,
friendly to numpy kernels inside Arrow-batched UDFs.

Entities are rows: (type, text, bbox, word_ids, maximality_score,
ocr_score, likeness_score).  The child DAG collapses to `word_ids` — every
predicate in the reference only needs bbox, text, and the leaf word set
(e.g. bp/rules/logical.py:182-190).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

TYPE_TEXT = 'Text'
TYPE_DATE = 'Date'
TYPE_DOLLAR = 'DollarAmount'
TYPE_PAGE = 'Page'


@dataclass
class DocPool:
  """All entities of one document.

  Word geometry arrays are indexed by global word id (reading order).
  Entity arrays are indexed by entity id.
  """
  name: str

  # words
  word_text: List[str] = field(default_factory=list)
  wx0: np.ndarray = None  # type: ignore
  wx1: np.ndarray = None  # type: ignore
  wy0: np.ndarray = None  # type: ignore
  wy1: np.ndarray = None  # type: ignore

  # pages
  page_number: List[int] = field(default_factory=list)
  px0: np.ndarray = None  # type: ignore
  px1: np.ndarray = None  # type: ignore
  py0: np.ndarray = None  # type: ignore
  py1: np.ndarray = None  # type: ignore

  # entities
  etype: List[str] = field(default_factory=list)
  etext: List[str] = field(default_factory=list)
  ewords: List[Tuple[int, ...]] = field(default_factory=list)
  ex0: np.ndarray = None  # type: ignore
  ex1: np.ndarray = None  # type: ignore
  ey0: np.ndarray = None  # type: ignore
  ey1: np.ndarray = None  # type: ignore
  maximality: np.ndarray = None  # type: ignore  (nan = None)
  ocr_score: np.ndarray = None  # type: ignore
  likeness: np.ndarray = None  # type: ignore

  median_line_height: float = 0.0

  # doc bbox = union of all entity bboxes incl. pages
  # (reference: bp/document.py:41-47)
  dx0: float = 0.0
  dx1: float = 0.0
  dy0: float = 0.0
  dy1: float = 0.0

  # caches
  _by_type: Optional[Dict[str, np.ndarray]] = None
  _word_entity_ids: Optional[np.ndarray] = None  # entity ids of 1-word Texts
  _wordsets: Optional[List[frozenset]] = None
  _entity_pages: Optional[List[Tuple[int, ...]]] = None

  @property
  def n_entities(self) -> int:
    return len(self.etype)

  @property
  def n_words(self) -> int:
    return len(self.word_text)

  def entities_of_type(self, t: str) -> np.ndarray:
    if self._by_type is None:
      by: Dict[str, List[int]] = {}
      for i, et in enumerate(self.etype):
        by.setdefault(et, []).append(i)
      self._by_type = {k: np.asarray(v, dtype=np.int64)
                       for k, v in by.items()}
    return self._by_type.get(t, np.empty(0, dtype=np.int64))

  def single_word_text_ids(self) -> np.ndarray:
    """Entity ids of 1-word Text entities — the impingement "word" index
    (reference: bp/document.py:167-177)."""
    if self._word_entity_ids is None:
      ids = [i for i in range(self.n_entities)
             if self.etype[i] == TYPE_TEXT and len(self.ewords[i]) == 1]
      self._word_entity_ids = np.asarray(ids, dtype=np.int64)
    return self._word_entity_ids

  def wordset(self, eid: int) -> frozenset:
    if self._wordsets is None:
      self._wordsets = [None] * self.n_entities  # type: ignore
    ws = self._wordsets[eid]
    if ws is None:
      ws = frozenset(self.ewords[eid])
      self._wordsets[eid] = ws
    return ws

  def pages_of_entity(self, eid: int) -> Tuple[int, ...]:
    """Indices into the page arrays of pages intersecting this entity
    (reference: bp/document.py:162-164)."""
    if self._entity_pages is None:
      self._entity_pages = [None] * self.n_entities  # type: ignore
    got = self._entity_pages[eid]
    if got is None:
      x0, x1 = self.ex0[eid], self.ex1[eid]
      y0, y1 = self.ey0[eid], self.ey1[eid]
      out = []
      for p in range(len(self.page_number)):
        if not (self.px1[p] < x0 or x1 < self.px0[p]
                or self.py1[p] < y0 or y1 < self.py0[p]):
          out.append(p)
      got = tuple(out)
      self._entity_pages[eid] = got
    return got


def median_word_height(heights: List[float]) -> float:
  """Exact median with even/odd averaging (reference: bp/document.py:71-78).

  Input is the *multiset* of word heights contributed by every entity's
  word list (words counted once per containing entity), matching
  bp/document.py:58-62.
  """
  if not heights:
    return 0.0
  hs = sorted(heights)
  n = len(hs)
  if n % 2 == 0:
    return 0.5 * (hs[n // 2 - 1] + hs[n // 2])
  return hs[(n - 1) // 2]
