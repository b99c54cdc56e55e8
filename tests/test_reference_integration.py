"""The reference's own integration-test suite (golden extractions over
ASCII mock docs, blueprint/integration_tests/*) ported to run natively
against this engine.  Same documents, same models, same expectations."""

import pytest

from blueprint_oss_spark.engine.runner import run_doc
from blueprint_oss_spark.fixtures import ascii_pages_to_spans
from blueprint_oss_spark.model.nodes import (
    MergeNode, combine, extract)
from blueprint_oss_spark.model.rules import (
    bottom_aligned, left_aligned, left_aligned_pair, left_to_right,
    non_fatal, nop, nothing_between_vertically_custom, page_number_is,
    right_aligned, text_equals, text_is_one_of, top_down)


def _doc(pages, doc_id='t'):
  return ascii_pages_to_spans(pages, doc_id)


def _best(pages, root):
  return run_doc('t', _doc(pages), root)['fields']


def _exact(pages, root, expected):
  got = _best(pages, root)
  assert got == expected, (got, expected)


def _contains(pages, root, expected):
  got = _best(pages, root)
  for f, v in expected.items():
    assert got.get(f) == v, (got, expected)


def _empty(pages, root):
  got = _best(pages, root)
  assert got == {}, got


ROW_DOC = ["""
      Apple     Orange  Banana
      """]


def test_row_column():
  """reference: integration_tests/test_spatial.py:13-45."""
  _exact(ROW_DOC,
         extract(left_to_right('apple', 'orange', 'banana')),
         {'apple': 'Apple', 'orange': 'Orange', 'banana': 'Banana'})
  _exact(ROW_DOC,
         combine(
             extract(text_is_one_of(('Peach',))('peach'),
                     field_types={'peach': 'Text'}),
             extract(left_to_right('apple', 'orange', 'banana'))),
         {'apple': 'Apple', 'orange': 'Orange', 'banana': 'Banana'})
  _empty(ROW_DOC, extract(top_down('apple', 'orange', 'banana')))


def test_table():
  """reference: integration_tests/test_spatial.py:47-77."""
  doc = ["""
      Apple   Orange   Banana

      Peach   Cherry   Mango
      """]
  _exact(doc,
         extract(
             left_to_right('apple', 'orange', 'banana'),
             left_to_right('peach', 'cherry', 'mango'),
             bottom_aligned('apple', 'orange', 'banana'),
             bottom_aligned('peach', 'cherry', 'mango'),
             top_down('apple', 'peach'),
             top_down('orange', 'cherry'),
             top_down('banana', 'mango'),
             left_aligned('apple', 'peach'),
             left_aligned('orange', 'cherry'),
             left_aligned('banana', 'mango')),
         {'apple': 'Apple', 'orange': 'Orange', 'banana': 'Banana',
          'peach': 'Peach', 'cherry': 'Cherry', 'mango': 'Mango'})


def test_alignment():
  """reference: integration_tests/test_spatial.py:79-109."""
  doc = ["""
      Apple

      Mango
      """]
  expected = {'apple': 'Apple', 'mango': 'Mango'}
  _exact(doc, extract(top_down('apple', 'mango'),
                      left_aligned('apple', 'mango')), expected)
  _exact(doc, extract(top_down('apple', 'mango'),
                      right_aligned('apple', 'mango')), expected)
  _exact(doc, extract(top_down('apple', 'mango'),
                      left_aligned('apple', 'mango'),
                      right_aligned('apple', 'mango')), expected)


def test_multipage():
  """reference: integration_tests/test_multipage.py:14-61."""
  # NOTE: the span encoding derives page height from the last non-blank
  # line (runner.py docstring), so each page carries a trailing '.'
  # marker to reproduce the reference doc's inter-page gap (mock_doc
  # counts trailing blank lines into the page height).
  pages = ["""

      Page number:   1

      .""", """

      Page number:   2

      .""", """

      Page number:   3

      ."""]
  _exact(pages,
         extract(
             text_equals('Page number:')('page_number_label_1'),
             text_equals('Page number:')('page_number_label_2'),
             text_equals('Page number:')('page_number_label_3'),
             top_down('page_number_label_1', 'page_number_label_2'),
             page_number_is({2: 0, 3: 1, 4: 0})('page_number_label_3'),
             bottom_aligned('page_number_label_1', 'page_number_1'),
             left_to_right('page_number_label_1', 'page_number_1'),
             bottom_aligned('page_number_label_2', 'page_number_2'),
             left_to_right('page_number_label_2', 'page_number_2'),
             bottom_aligned('page_number_label_3', 'page_number_3'),
             left_to_right('page_number_label_3', 'page_number_3')),
         {'page_number_label_1': 'Page number:', 'page_number_1': '1',
          'page_number_label_2': 'Page number:', 'page_number_2': '2',
          'page_number_label_3': 'Page number:', 'page_number_3': '3'})


def test_rule_non_fatal():
  """reference: integration_tests/test_rule.py:44-57."""
  doc = ['OK      Good      Bad']
  _contains(doc,
            extract(
                text_equals('Good')('good'),
                text_equals('OK')('ok'),
                non_fatal(left_aligned_pair())('good', 'ok'),
                field_types={'good': 'Text', 'ok': 'Text'}),
            {'good': 'Good'})


def test_impingement_intervals():
  """reference: integration_tests/test_impingement.py:14-48."""
  doc = ["""
      Pineapple

          Apple

      Pear
      """]
  _exact(doc,
         extract(
             text_equals('Apple')('apple'),
             top_down('pineapple', 'pear'),
             nothing_between_vertically_custom(maximum_impingement=0.5)
             ('pineapple', 'pear')),
         {'apple': 'Apple', 'pineapple': 'Pineapple', 'pear': 'Pear'})
  _empty(doc,
         extract(
             text_equals('Apple')('apple'),
             top_down('pineapple', 'pear'),
             nothing_between_vertically_custom(
                 spanning=True, maximum_impingement=0.5)
             ('pineapple', 'pear')))


def test_merge_validation():
  """reference: integration_tests/test_validation.py:8-19."""
  with pytest.raises(ValueError):
    MergeNode(children=(
        extract(nop('f1'), nop('f_int'),
                field_types={'f1': 'Text', 'f_int': 'Text'}),
        extract(nop('f2'), nop('f_int'),
                field_types={'f2': 'Text', 'f_int': 'Text'}),
    )).validate()
