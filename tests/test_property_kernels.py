"""Property-based cross-checks of the correctness-critical scalar
kernels against the reference's own functions (hypothesis over random
inputs — broader than the sampled-corpus parity suites):

  * Levenshtein / substring / pattern edit distance vs bp.string_algos
  * edit_distance_capped ≡ min(edit_distance, cap) (the lossless-cap
    contract the text_equals / date-likeness fast paths rely on)
  * both taper variants vs bp.rules.{spatial,textual}._taper_error
  * count_score lerp vs bp.rules.textual.count_score
  * comparison massaging vs bp.rules.textual._text_comparison_massage
  * numeric coercion/sum quirks vs bp.rules.numeric._sum
"""

import math

from hypothesis import given, settings, strategies as st

from .refshim import _ensure_reference_loaded

_ensure_reference_loaded()

from bp import string_algos as ref_sa  # noqa: E402
from bp.rules import numeric as ref_num  # noqa: E402
from bp.rules import spatial as ref_sp  # noqa: E402
from bp.rules import textual as ref_tx  # noqa: E402

from blueprint_oss_spark.engine.entity_gen import (  # noqa: E402
    edit_distance, edit_distance_capped)
from blueprint_oss_spark.engine import kernels as K  # noqa: E402

# small alphabet → dense collisions; mixed case + specials for massage
_TEXT = st.text(alphabet='ab9 .$-X', max_size=12)
_SETTINGS = dict(max_examples=300, deadline=None)


@settings(**_SETTINGS)
@given(_TEXT, _TEXT)
def test_edit_distance_matches_reference(s1, s2):
  assert edit_distance(s1, s2) == ref_sa.edit_distance(s1, s2)


@settings(**_SETTINGS)
@given(_TEXT, _TEXT, st.integers(min_value=1, max_value=8))
def test_edit_distance_capped_contract(s1, s2, cap):
  assert edit_distance_capped(s1, s2, cap) == \
      min(ref_sa.edit_distance(s1, s2), cap)


@settings(**_SETTINGS)
@given(_TEXT, _TEXT)
def test_substring_edit_distance_matches_reference(s, t):
  assert K.substring_edit_distance(s, t) == \
      ref_sa.substring_edit_distance(s, t)


@settings(**_SETTINGS)
@given(_TEXT, st.text(alphabet='9aX-', max_size=8))
def test_pattern_edit_distance_matches_reference(s, pattern):
  stands_for = {'9': '0123456789'}
  assert K.pattern_edit_distance(s, pattern, stands_for) == \
      ref_sa.pattern_edit_distance(s, pattern, stands_for)


@settings(**_SETTINGS)
@given(st.floats(0, 100), st.floats(0, 10), st.floats(0, 10))
def test_taper_float_matches_reference(raw, tol, taper):
  assert K.taper_error_float(raw, tol, taper) == \
      ref_sp._taper_error(raw, tol, taper)


@settings(**_SETTINGS)
@given(st.integers(0, 50), st.integers(0, 10), st.integers(0, 10))
def test_taper_int_matches_reference(raw, tol, taper):
  assert K.taper_error_int(raw, tol, taper) == \
      ref_tx._taper_error(raw, tol, taper)


@settings(**_SETTINGS)
@given(st.dictionaries(st.integers(0, 20), st.floats(0, 1),
                       min_size=1, max_size=6),
       st.integers(-2, 25))
def test_count_score_matches_reference(score_dict, count):
  ours = K.count_score(score_dict, count)
  ref = ref_tx.count_score(score_dict, count)
  assert ours == ref or (math.isnan(ours) and math.isnan(ref))


@settings(**_SETTINGS)
@given(st.integers(0, 15), _TEXT)
def test_massage_matches_reference(flags, s):
  assert K.massage(flags, s) == ref_tx._text_comparison_massage(
      ref_tx.TextComparisonFlags(flags), s)


class _FakeEntity:
  def __init__(self, text):
    self.entity_text = text


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet='0123456789.,-$x', max_size=10),
                min_size=1, max_size=3),
       st.booleans(), st.booleans())
def test_numeric_sum_matches_reference(texts, period, force):
  coeffs = tuple(float(i + 1) for i in range(len(texts)))
  ours = K.numeric_sum(texts, coeffs, period, force)
  ref = ref_num._sum(tuple(_FakeEntity(t) for t in texts), coeffs,
                     period, force)
  if ours is None or ref is None:
    assert ours == ref
  else:
    assert ours == ref
