"""Reference-format Document JSON round-trip.

Parity surface: bp/document.py:188-207 (`load_doc_from_json`,
`dump_to_json`, `save_doc`) with the typed-entity registry dispatched on
the `type` tag (bp/entity.py:514-537, bp/instantiate.py:10-155).

Loading maps the object-graph JSON onto our array-backed DocPool: embedded
Word dicts are deduplicated by (text, bbox) into global word ids, every
composite entity flattens to its leaf word-id tuple, and
median_line_height reproduces the reference's per-entity word multiset
semantics (bp/document.py:58-78).  Saving emits JSON that the reference's
own `load_doc_from_json` accepts (verified in tests/test_doc_json.py).
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .docmodel import DocPool, median_word_height

# Both round-trip directions support the full word-bearing registry
# (Text/Date/DollarAmount/Number/Integer/Time/PersonName/Address/
# NamedEntity); Number/Integer/Time/NamedEntity re-save with
# value=None — DocPool keeps text + scores, not parsed values.

def _bbox_dict(x0: float, x1: float, y0: float, y1: float) -> Dict[str, Any]:
  return {'ix': {'a': x0, 'b': x1}, 'iy': {'a': y0, 'b': y1}}


def _bbox_vals(b: Dict[str, Any]) -> Tuple[float, float, float, float]:
  return (float(b['ix']['a']), float(b['ix']['b']),
          float(b['iy']['a']), float(b['iy']['b']))


def _leaf_words(ent: Dict[str, Any]) -> List[Dict[str, Any]]:
  """Leaf Word dicts of one entity blob — the JSON analogue of
  Entity.entity_words() (bp/entity.py:40-50)."""
  t = ent.get('type')
  if t == 'Word':
    return [ent]
  out: List[Dict[str, Any]] = []
  for child_key in ('words', 'lines', 'name_parts', 'content', 'rows',
                    'cells'):
    for child in ent.get(child_key) or []:
      out.extend(_leaf_words(child))
  return out


def pool_from_doc_json(blob: Dict[str, Any]) -> DocPool:
  """Reference Document JSON → DocPool.

  Accepts exactly what `bp.document.dump_to_json` produces (and what
  `bp.document.load_doc_from_json` consumes)."""
  pool = DocPool(name=blob.get('name', ''))

  word_ids: Dict[Tuple[str, float, float, float, float], int] = {}
  word_text: List[str] = []
  wx0: List[float] = []; wx1: List[float] = []
  wy0: List[float] = []; wy1: List[float] = []

  def word_id(w: Dict[str, Any]) -> int:
    x0, x1, y0, y1 = _bbox_vals(w['bbox'])
    key = (w.get('text') or '', x0, x1, y0, y1)
    wid = word_ids.get(key)
    if wid is None:
      wid = len(word_text)
      word_ids[key] = wid
      word_text.append(key[0])
      wx0.append(x0); wx1.append(x1); wy0.append(y0); wy1.append(y1)
    return wid

  etype: List[str] = []; etext: List[str] = []
  ewords: List[Tuple[int, ...]] = []
  ex0: List[float] = []; ex1: List[float] = []
  ey0: List[float] = []; ey1: List[float] = []
  emax: List[float] = []; eocr: List[float] = []; elik: List[float] = []
  heights: List[float] = []

  ppn: List[int] = []
  ppx0: List[float] = []; ppx1: List[float] = []
  ppy0: List[float] = []; ppy1: List[float] = []

  for ent in blob.get('entities') or []:
    t = ent.get('type')
    x0, x1, y0, y1 = _bbox_vals(ent['bbox'])
    if t == 'Page':
      ppn.append(int(ent['page_number']))
      ppx0.append(x0); ppx1.append(x1); ppy0.append(y0); ppy1.append(y1)
      continue  # Pages have no children (bp/entity.py:86-92)
    leaves = _leaf_words(ent)
    tup = tuple(word_id(w) for w in leaves)
    for w in leaves:
      _, _, a, b = _bbox_vals(w['bbox'])
      heights.append(b - a)
    etype.append(t)
    etext.append(ent.get('text') or '')
    ewords.append(tup)
    ex0.append(x0); ex1.append(x1); ey0.append(y0); ey1.append(y1)

    def _f(key: str) -> float:
      v = ent.get(key)
      return float('nan') if v is None else float(v)

    emax.append(_f('maximality_score'))
    eocr.append(_f('ocr_score'))
    elik.append(_f('likeness_score'))

  pool.word_text = word_text
  pool.wx0 = np.asarray(wx0, dtype=np.float64)
  pool.wx1 = np.asarray(wx1, dtype=np.float64)
  pool.wy0 = np.asarray(wy0, dtype=np.float64)
  pool.wy1 = np.asarray(wy1, dtype=np.float64)
  pool.page_number = ppn
  pool.px0 = np.asarray(ppx0, dtype=np.float64)
  pool.px1 = np.asarray(ppx1, dtype=np.float64)
  pool.py0 = np.asarray(ppy0, dtype=np.float64)
  pool.py1 = np.asarray(ppy1, dtype=np.float64)
  pool.etype = etype
  pool.etext = etext
  pool.ewords = ewords
  pool.ex0 = np.asarray(ex0, dtype=np.float64)
  pool.ex1 = np.asarray(ex1, dtype=np.float64)
  pool.ey0 = np.asarray(ey0, dtype=np.float64)
  pool.ey1 = np.asarray(ey1, dtype=np.float64)
  pool.maximality = np.asarray(emax, dtype=np.float64)
  pool.ocr_score = np.asarray(eocr, dtype=np.float64)
  pool.likeness = np.asarray(elik, dtype=np.float64)
  pool.median_line_height = median_word_height(heights)

  dbb = blob.get('bbox')
  if dbb is not None:
    pool.dx0, pool.dx1, pool.dy0, pool.dy1 = _bbox_vals(dbb)
  return pool


def _opt(v: float) -> Optional[float]:
  return None if (v is None or math.isnan(v)) else float(v)


def doc_json_from_pool(pool: DocPool) -> Dict[str, Any]:
  """DocPool → reference Document JSON (loadable by
  `bp.document.load_doc_from_json`)."""

  def word_dict(wid: int) -> Dict[str, Any]:
    return {
        'bbox': _bbox_dict(float(pool.wx0[wid]), float(pool.wx1[wid]),
                           float(pool.wy0[wid]), float(pool.wy1[wid])),
        'type': 'Word',
        'text': pool.word_text[wid],
        'origin': None,
    }

  entities: List[Dict[str, Any]] = []
  for p in range(len(pool.page_number)):
    entities.append({
        'bbox': _bbox_dict(float(pool.px0[p]), float(pool.px1[p]),
                           float(pool.py0[p]), float(pool.py1[p])),
        'type': 'Page',
        'page_number': int(pool.page_number[p]),
    })

  for i in range(pool.n_entities):
    t = pool.etype[i]
    base = {
        'bbox': _bbox_dict(float(pool.ex0[i]), float(pool.ex1[i]),
                           float(pool.ey0[i]), float(pool.ey1[i])),
        'type': t,
    }
    words = [word_dict(w) for w in pool.ewords[i]]

    def text_blob() -> Dict[str, Any]:
      # A Text phrase spanning this entity's leaf words — used where the
      # reference declares Tuple[Text, ...] children (PersonName
      # name_parts, Address lines; bp/entity.py:424-460).
      return {
          'bbox': base['bbox'], 'type': 'Text', 'text': pool.etext[i],
          'words': words, 'maximality_score': None, 'ocr_score': None,
      }

    # Every branch emits exactly the declared dataclass fields of the
    # reference type (bp/entity.py) so `instantiate` round-trips it.
    # Parsed `value`s are not retained by DocPool (only text + scores
    # are), so Number/Integer/Time/NamedEntity save with value=None —
    # lossy on that one field, symmetric on everything the engine reads.
    if t == 'Word':
      base.update(text=pool.etext[i], origin=None)
    elif t == 'Text':
      base.update(text=pool.etext[i], words=words,
                  maximality_score=_opt(pool.maximality[i]),
                  ocr_score=_opt(pool.ocr_score[i]))
    elif t == 'DollarAmount':
      base.update(text=pool.etext[i], words=words, units=None,
                  likeness_score=_opt(pool.likeness[i]))
    elif t == 'Date':
      base.update(text=pool.etext[i], words=words,
                  likeness_score=_opt(pool.likeness[i]))
    elif t in ('Number', 'Integer'):
      base.update(words=words, value=None)
    elif t == 'Time':
      base.update(words=words, value=None,
                  likeness_score=_opt(pool.likeness[i]))
    elif t == 'NamedEntity':
      base.update(text=pool.etext[i], words=words, value=None,
                  label=None)
    elif t == 'PersonName':
      base.update(text=pool.etext[i], name_parts=[text_blob()],
                  likeness_score=_opt(pool.likeness[i]))
    elif t == 'Address':
      base.update(text=pool.etext[i], lines=[text_blob()],
                  address_parts=[],
                  likeness_score=_opt(pool.likeness[i]))
    else:
      raise ValueError(
          f'cannot serialize entity type {t!r} to reference doc JSON')
    entities.append(base)

  return {
      'bbox': _bbox_dict(pool.dx0, pool.dx1, pool.dy0, pool.dy1),
      'entities': entities,
      'name': pool.name,
  }


def load_doc(path: str) -> DocPool:
  with open(path) as f:
    return pool_from_doc_json(json.load(f))


def save_doc(pool: DocPool, path: str) -> None:
  with open(path, 'w') as f:
    f.write(json.dumps(doc_json_from_pool(pool)) + '\n')


def target_assign_from_json(blob: Dict[str, Any],
                            pool: DocPool) -> Dict[str, int]:
  """Extraction JSON (field → entity object) → field → pool entity id.
  Entities are matched by (type, text, bbox) — the identity a
  serialized extraction carries (reference bp/extraction.py asdict;
  loaded there by load_extraction, bp/extraction.py:185-195)."""
  out: Dict[str, int] = {}
  points = blob.get('assignments') or blob.get('points') or []
  for p in points:
    f = p['field']
    ent = p['entity']
    t = ent.get('type')
    text = ent.get('text') or ''
    b = ent.get('bbox') or {}
    x0 = float(b.get('ix', {}).get('a', 0.0))
    y0 = float(b.get('iy', {}).get('a', 0.0))
    found = None
    for eid in range(pool.n_entities):
      if (pool.etype[eid] == t and pool.etext[eid] == text
          and abs(pool.ex0[eid] - x0) < 1e-9
          and abs(pool.ey0[eid] - y0) < 1e-9):
        found = eid
        break
    if found is None:
      raise ValueError(f'entity for field {f!r} not found in document')
    out[f] = found
  return out
