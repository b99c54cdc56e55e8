"""Test-only shim that imports the reference engine (pure Python) from
/root/reference as the parity oracle (FIXTURES.md §2, SURVEY.md §5).

The reference targets Python 3.7; two compatibility patches are applied at
import time without touching the read-only checkout:
  * bp/__init__.py pulls CLI deps (hocr_parser, flask) we don't have — we
    register a namespace package pointing at the reference dir instead so
    submodule imports skip __init__.
  * bp/targets.py uses an unfrozen dataclass as a default value (illegal
    on py3.11) — we pre-exec a patched copy into sys.modules.

Production code NEVER imports this module; it exists so pytest can assert
span-sequence equality against the reference's own engine.
"""

from __future__ import annotations

import logging
import pathlib
import sys
import types
from typing import Dict, List, Optional, Sequence, Tuple

REF = '/root/reference/blueprint/py'

Span = Tuple[str, str, str, int]


def _ensure_reference_loaded() -> None:
  if 'bp' in sys.modules and getattr(sys.modules['bp'], '__bp_shim__', False):
    return
  pkg = types.ModuleType('bp')
  pkg.__path__ = [REF + '/bp']
  pkg.__bp_shim__ = True
  sys.modules['bp'] = pkg
  src = pathlib.Path(REF + '/bp/targets.py').read_text()
  src = src.replace('@dataclass\nclass OutputConfig:',
                    '@dataclass(frozen=True)\nclass OutputConfig:')
  mod = types.ModuleType('bp.targets')
  mod.__package__ = 'bp'
  mod.__file__ = REF + '/bp/targets.py'
  sys.modules['bp.targets'] = mod
  # dont_inherit: this module's `from __future__ import annotations`
  # must not leak into the compiled copy — PEP 563 string annotations
  # break bp.instantiate's type-driven loader.
  exec(compile(src, mod.__file__, 'exec', dont_inherit=True),
       mod.__dict__)
  logging.disable(logging.CRITICAL)


_ensure_reference_loaded()

from bp.build_document import InputPage, build_document  # noqa: E402
from bp.config import Config  # noqa: E402
from bp.entity import Page  # noqa: E402
from bp.geometry import BBox, Interval  # noqa: E402
from bp.ocr import InputWord  # noqa: E402
from bp.run import run_model  # noqa: E402

from blueprint_oss_spark.engine.runner import (  # noqa: E402
    canonical_out_spans, spans_to_pages)


def load_reference_example(path: str):
  """Exec a reference example program (e.g. examples/paystubs/paystubs.py)
  against the shimmed bp package and return its module namespace.

  The real bp/__init__ star-imports the rule modules and the CLI; we
  populate the shim package the same way minus the CLI (bp_cli_main is a
  no-op so the trailing `if __name__` block is inert)."""
  import importlib
  pkg = sys.modules['bp']
  if not getattr(pkg, '__bp_star_ready__', False):
    for sub in ('rules.impingement', 'rules.label', 'rules.logical',
                'rules.numeric', 'rules.semantic', 'rules.spatial',
                'rules.tabular', 'rules.textual'):
      mod = importlib.import_module(f'bp.{sub}')
      for name in dir(mod):
        if not name.startswith('_'):
          setattr(pkg, name, getattr(mod, name))
    from bp.config import Config as _Config
    from bp.tree import Node as _Node, combine as _combine, \
        extract as _extract, pick_best as _pick_best
    from bp.extraction import Field as _Field
    from bp.rule import Predicate as _Predicate, \
        all_rules_hold as _arh, any_rule_holds as _anyrh
    pkg.Config = _Config
    pkg.Node = _Node
    pkg.combine = _combine
    pkg.extract = _extract
    pkg.pick_best = _pick_best
    pkg.Field = _Field
    pkg.Predicate = _Predicate
    pkg.all_rules_hold = _arh
    pkg.any_rule_holds = _anyrh
    pkg.bp_cli_main = lambda *a, **k: None
    pkg.__bp_star_ready__ = True
  src = pathlib.Path(path).read_text()
  # exec into a REGISTERED module: examples defining @dataclass at
  # module level (checks.py) need sys.modules[cls.__module__] to exist.
  mod_name = 'reference_example_' + pathlib.Path(path).stem
  mod = types.ModuleType(mod_name)
  mod.__file__ = path
  sys.modules[mod_name] = mod
  exec(compile(src, path, 'exec'), mod.__dict__)
  return mod.__dict__


def reference_doc_from_pages(doc_id: str, pages):
  """Build a reference Document directly from parser-format pages
  ([{'page_number','width','height','words':[(t,x0,x1,y0,y1)]}]) —
  the shape every OCR/PDF parser in spark/sources.py emits."""
  input_pages = []
  offset = 0.0
  for pg in pages:
    page = Page(BBox(Interval(0, pg['width']),
                     Interval(offset, offset + pg['height'])),
                pg['page_number'])
    words = tuple(
        InputWord(BBox(Interval(x0, x1), Interval(y0, y1)), t, None,
                  None, None)
        for (t, x0, x1, y0, y1) in pg['words'])
    input_pages.append(InputPage(page, words))
    offset += pg['height']
  return build_document(tuple(input_pages), doc_id)


def reference_doc_from_spans(doc_id: str, spans: Sequence[Span]):
  """Build a reference Document from span rows via the SAME page/word
  derivation our engine uses (engine/runner.spans_to_pages), so both
  engines see identical geometry."""
  return reference_doc_from_pages(doc_id, spans_to_pages(spans))


def reference_best(doc_id: str, spans: Sequence[Span], root,
                   num_samples: int = -1) \
    -> Tuple[Dict[str, str], float, List[Span]]:
  """Run the reference engine to exhaustion; return (fields→text, score,
  canonical out spans)."""
  fields, score, outs = reference_best_set(doc_id, spans, root,
                                           num_samples)
  return fields, score, outs[0]


def reference_best_set(doc_id: str, spans: Sequence[Span], root,
                       num_samples: int = -1) \
    -> Tuple[Dict[str, str], float, List[List[Span]]]:
  """Like reference_best, but returns the canonical out-span sequences of
  ALL top-score-tied extractions (the reference breaks exact score ties by
  id()-ordered set iteration — bp/scoring.py:124-148 — so any tied argmax
  is an acceptable parity target)."""
  doc = reference_doc_from_spans(doc_id, spans)
  res = run_model(doc, root, Config(num_samples=num_samples, timeout=-1))
  assert res.root is not None
  tops = res.root.top_20_extractions
  best_score = tops[0].score
  outs = []
  best_fields = None
  for se in tops:
    if se.score != best_score:
      break
    fields = {p.field: (p.entity.entity_text or '')
              for p in se.extraction.points()}
    if best_fields is None:
      best_fields = fields
    outs.append(canonical_out_spans(fields, spans))
  return best_fields or {}, best_score, outs


# ---------------------------------------------------------------------------
# Reference-side blueprint builders mirroring blueprint_oss_spark.fixtures.
# ---------------------------------------------------------------------------

def ref_readme_blueprint():
  from bp.tree import extract
  from bp.rules.semantic import is_dollar_amount
  from bp.rules.spatial import bottom_aligned, right_aligned
  from bp.rules.textual import text_equals
  return extract(
      text_equals('Neil Patel')('patel_label'),
      is_dollar_amount('patel_revenue'),
      bottom_aligned('patel_label', 'patel_revenue'),
      text_equals('Annual $')('annual_revenue_label'),
      right_aligned('annual_revenue_label', 'patel_revenue'))


def ref_labelvalue_blueprint():
  from bp.tree import combine, extract
  from bp.rules.label import (
      is_left_to_right_label_value_pair, is_top_down_label_value_pair)
  from bp.rules.semantic import is_date, is_dollar_amount, is_entire_phrase
  from bp.rules.textual import text_equals
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


def ref_table_blueprint():
  from bp.tree import extract
  from bp.rules.semantic import is_dollar_amount
  from bp.rules.tabular import table
  from bp.rules.textual import text_equals
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


def ref_multipage_blueprint():
  from bp.tree import extract
  from bp.rules.label import is_left_to_right_label_value_pair
  from bp.rules.semantic import is_dollar_amount
  from bp.rules.spatial import PageNumberIs
  from bp.rules.textual import text_equals
  return extract(
      text_equals('Amount due', taper=3)('due_label'),
      is_dollar_amount('due'),
      is_left_to_right_label_value_pair('due_label', 'due'),
      PageNumberIs({1: 0.5, 2: 1.0, 3: 0.5})('due'))


def ref_adversarial_blueprint():
  from bp.tree import extract
  from bp.rules.label import is_left_to_right_label_value_pair
  from bp.rules.semantic import is_dollar_amount
  from bp.rules.textual import text_equals
  return extract(
      text_equals('total')('total_label'),
      is_dollar_amount('total'),
      is_left_to_right_label_value_pair('total_label', 'total'))


REF_BLUEPRINTS = {
    'readme': ref_readme_blueprint,
    'labelvalue': ref_labelvalue_blueprint,
    'table': ref_table_blueprint,
    'multipage': ref_multipage_blueprint,
    'adversarial': ref_adversarial_blueprint,
}
