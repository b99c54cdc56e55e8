"""extract_links — anchor/href harvesting from HTML pages.

Verification: full python recomputation of the expected link list from
the boilerplate template structure (the same recoverable-ground-truth
device as html_main_content), compared row-for-row; plus the seam
contract (arbitrary html frames, hostile input degrades to zero rows,
zero-shuffle zero-Python plan) and the pagerank integration the
operator exists to feed.
"""

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.html_extract import _MENUS, extract_links

SF_DIR = '/root/testdata/sf0.001'


def _py_links(doc_id: int):
  """Expected (href, anchor) list in page order for the default
  synthesis (variant = doc_id % 3) — mirrors wrap_in_boilerplate's
  template structure."""
  menu = _MENUS[(doc_id % 3) % len(_MENUS)]
  links = [('/', 'Example Site')]
  links += [('/' + m.lower(), m) for m in menu]
  links += [('/buy', 'BUY NOW limited offer')]
  links += [(f'/story/{i}',
             f'Related story number {i} about {menu[i % len(menu)]}')
            for i in range(5)]
  links += [(f'/user/{i}', f'reply to thread {i}') for i in range(2)]
  links += [('/subscribe', 'Subscribe for more')]
  links += [('/terms', 'Terms'), ('/privacy', 'Privacy'),
            ('/contact', 'Contact')]
  return links


def test_matches_template_recomputation(spark):
  rows = extract_links(spark, SF_DIR).collect()
  got = {}
  for r in rows:
    got.setdefault(int(r['doc_id']), []).append(
        (r['link_pos'], r['href'], r['anchor_text']))
  n = spark.read.parquet(f'{SF_DIR}/documents.parquet').count()
  assert set(got) == set(range(n))
  for i in range(n):
    expect = [(p, h, a) for p, (h, a) in enumerate(_py_links(i))]
    assert sorted(got[i]) == expect, i


def test_seam_hostile_and_empty(spark):
  docs = spark.createDataFrame(
      [(1, '<p>no links at all</p>'),
       (2, '<a href="/x" class="big" rel="nofollow">first</a> mid '
           '<a href="/y">second</a>'),
       # unclosed anchor, nested tag inside anchor text, stray quote:
       # none may crash; the nested-tag anchor is skipped ([^<]*)
       (3, '<a href="/dangling">never closed <a href="/z"><b>bold'
           '</b></a> <a href="broken'),
       (4, None)],
      'doc_id long, html string')
  got = {(r['doc_id'], r['link_pos'], r['href'], r['anchor_text'])
         for r in extract_links(spark, '', docs=docs).collect()}
  assert got == {(2, 0, '/x', 'first'), (2, 1, '/y', 'second')}


def test_plan_zero_shuffle_zero_python(spark):
  docs = spark.createDataFrame([(1, '<a href="/a">a</a>')],
                               'doc_id long, html string')
  plan = extract_links(spark, '', docs=docs) \
      ._jdf.queryExecution().executedPlan().toString()
  assert 'Exchange' not in plan
  assert 'MapInPandas' not in plan and 'BatchEvalPython' not in plan


def test_feeds_pagerank_edges_seam(spark):
  # the loop the operator exists to close: pages linking pages by
  # /doc/<id> hrefs -> edge list -> exact-integer pagerank
  from blueprint_oss_spark.ops.graph import pagerank
  n = 12
  rows = [(i, ''.join(f'<a href="/doc/{(i * 5 + k) % n}">see</a>'
                      for k in range(2))) for i in range(n)]
  docs = spark.createDataFrame(rows, 'doc_id long, html string')
  links = extract_links(spark, '', docs=docs)
  edges = (links
           .select(F.col('doc_id').alias('src'),
                   F.regexp_extract('href', r'^/doc/(\d+)$', 1)
                   .cast('long').alias('dst'))
           .where(F.col('dst').isNotNull()))
  node_df = docs.select('doc_id')
  out = pagerank(spark, '', iterations=3, docs=node_df,
                 edges=edges).collect()
  assert len(out) == n
  total = sum(r['pr_num'] for r in out)
  assert 0 < total <= n * 80 ** 3
  # every page has out-degree 2 (self-links possible here: (i*5+k)%n
  # may equal i — the seam imposes no self-link remap); in-degrees
  # must sum to the edge count
  assert sum(r['out_deg'] for r in out) == 2 * n
  assert sum(r['in_deg'] for r in out) == 2 * n


def test_anchor_stats_matches_python(spark):
  from blueprint_oss_spark.ops.html_extract import anchor_stats
  n = spark.read.parquet(f'{SF_DIR}/documents.parquet').count()
  # recompute the whole anchor-text corpus sequentially
  per_anchor = {}
  per_href_docs = {}
  for i in range(n):
    for href, anchor in _py_links(i):
      per_anchor[(href, anchor)] = per_anchor.get((href, anchor), 0) + 1
      per_href_docs.setdefault(href, set()).add(i)
  expect = {}
  for href, docs in per_href_docs.items():
    pairs = [(c, a) for (h, a), c in per_anchor.items() if h == href]
    n_links = sum(c for c, _ in pairs)
    top_n, top_a = max(pairs)
    expect[href] = (n_links, len(docs), top_a, top_n)
  got = {r['href']: (r['n_links'], r['n_docs'], r['top_anchor'],
                     r['top_anchor_n'])
         for r in anchor_stats(spark, SF_DIR).collect()}
  assert got == expect
  # the footer/nav dual-appearance case must be present: more links
  # than linking docs for at least one target
  assert any(nl > nd for nl, nd, _, _ in got.values())


def test_anchor_stats_plan_is_partial_agg_no_collect(spark):
  from blueprint_oss_spark.ops.html_extract import anchor_stats
  links = spark.createDataFrame(
      [(1, 0, '/a', 'x'), (2, 0, '/a', 'x'), (2, 1, '/b', 'y')],
      'doc_id long, link_pos int, href string, anchor_text string')
  plan = anchor_stats(spark, '', links=links) \
      ._jdf.queryExecution().executedPlan().toString()
  # hub absorption: map-side partial counts, never an anchor array
  assert 'partial_count' in plan
  assert 'collect_list' not in plan and 'collect_set' not in plan
