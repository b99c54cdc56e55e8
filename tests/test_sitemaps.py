"""Sitemap synthesis / parsing / coverage verdicts.

Verification: full python recomputation of every publishing domain's
sitemap.xml bytes and every doc's coverage verdict from the synthesis
congruences, parser grammar units (multiline blocks, attribute noise,
missing optional fields, missing <loc>, empty urlset), the exact-URL
membership semantics (query-bearing normalized URLs are distinct
resources and stay unlisted), and the corpus-side plan pin (the
frontier join adds no Python and no corpus shuffle).
"""

import pytest
from pyspark.sql import functions as F

from blueprint_oss_spark.ops.curation import _URL_TLDS, _URL_WORDS
from blueprint_oss_spark.ops.sitemaps import (_SM_CHANGEFREQS, _SM_HEADER,
                                              parse_sitemaps,
                                              sitemap_coverage,
                                              synth_sitemaps)

SF_DIR = '/root/testdata/sf0.001'


def _py_entries():
  """(domain -> [(uk, loc, lastmod, changefreq, priority)]) for
  publishing domains, plus the full publishing-domain set."""
  entries, pubs = {}, set()
  for uk in range(350):
    s, t, k = uk % 53, uk % 5, uk // 53
    if s % 2:
      continue
    d = f'site{s}{_URL_TLDS[t]}'
    pubs.add(d)
    entries.setdefault(d, [])
    if uk % 3 == 0:
      continue
    entries[d].append(
        (uk, f'https://{d}/{_URL_WORDS[uk % 8]}/p{k}',
         f'2026-{uk % 12 + 1:02d}-{uk % 28 + 1:02d}',
         _SM_CHANGEFREQS[uk % 3 - 1], f'0.{uk % 10}'))
  return entries, pubs


def _py_xml(rows):
  es = ['  <url>\n    <loc>{}</loc>\n    <lastmod>{}</lastmod>\n'
        '    <changefreq>{}</changefreq>\n    <priority>{}</priority>'
        '\n  </url>'.format(loc, lm, cf, pr)
        for _, loc, lm, cf, pr in sorted(rows)]
  body = ('\n' + '\n'.join(es)) if es else ''
  return _SM_HEADER + body + '\n</urlset>'


def test_synthesis_bytes_match_python(spark):
  entries, pubs = _py_entries()
  got = {r['domain']: r['sitemap_xml']
         for r in synth_sitemaps(spark).collect()}
  assert set(got) == pubs
  for d in pubs:
    assert got[d] == _py_xml(entries[d]), d
  # the zero-entry publishing domains exist and publish empty urlsets
  empty = [d for d in pubs if not entries[d]]
  assert empty and all('<url>' not in got[d] for d in empty)


def test_parse_matches_python(spark):
  entries, _ = _py_entries()
  exp = {(d, i): row[1:]
         for d, rows in entries.items()
         for i, row in enumerate(sorted(rows))}
  got = parse_sitemaps(spark).collect()
  assert len(got) == len(exp)
  for r in got:
    assert exp[(r['domain'], r['entry_pos'])] == \
        (r['loc'], r['lastmod'], r['changefreq'], r['priority'])


def test_parse_grammar_edge_cases(spark):
  xml = '\n'.join([
      _SM_HEADER,
      # attribute noise + odd whitespace inside a block
      '<url >',  # malformed tag: NOT matched as a block open
      '<url>',
      '  <lastmod>2026-01-01</lastmod>',
      '  <loc>https://a.com/x</loc>',
      '</url>',
      # missing optional fields -> NULLs, no alignment shift
      '<url><loc>https://a.com/y</loc></url>',
      # missing <loc> -> dropped
      '<url><lastmod>2026-02-02</lastmod></url>',
      # empty <loc> -> dropped
      '<url><loc></loc><priority>0.9</priority></url>',
      '</urlset>'])
  sm = spark.createDataFrame([('a.com', xml)],
                             'domain string, sitemap_xml string')
  rows = parse_sitemaps(spark, sitemaps=sm).orderBy('entry_pos').collect()
  # block 0 spans '<url>'..'</url>' with fields in any order
  assert [(r['loc'], r['lastmod'], r['changefreq'], r['priority'])
          for r in rows] == [
      ('https://a.com/x', '2026-01-01', None, None),
      ('https://a.com/y', None, None, None)]
  # entry_pos is the block position among well-formed blocks
  assert [r['entry_pos'] for r in rows] == [0, 1]


def test_coverage_matches_python(spark):
  entries, pubs = _py_entries()
  listed = {loc: (lm, cf, pr)
            for rows in entries.values()
            for _, loc, lm, cf, pr in rows}
  rows = sitemap_coverage(spark, SF_DIR).collect()
  n = spark.read.parquet(f'{SF_DIR}/documents.parquet').count()
  assert len(rows) == n
  three_way = set()
  for r in rows:
    has = int(r['domain'] in pubs)
    assert r['has_sitemap'] == has, r
    meta = listed.get(r['norm_url'])
    if meta is not None:
      assert (r['sm_listed'], r['sm_lastmod'], r['sm_changefreq'],
              r['sm_priority']) == (1,) + meta, r
    else:
      assert (r['sm_listed'], r['sm_lastmod']) == (0, None), r
    three_way.add((has, r['sm_listed']))
  # corpus exercises no-sitemap / unlisted / listed
  assert three_way == {(0, 0), (1, 0), (1, 1)}


def test_query_bearing_urls_are_distinct_resources(spark):
  # a normalized URL that retains a non-tracking query param is a
  # different resource than the canonical path the sitemap lists
  cov = sitemap_coverage(spark, SF_DIR)
  q = cov.where(F.col('norm_url').contains('?'))
  assert q.count() > 0
  assert q.where(F.col('sm_listed') == 1).count() == 0


def test_frontier_side_plan_is_joins_only(spark):
  plan = sitemap_coverage(spark, SF_DIR)._jdf.queryExecution() \
      .executedPlan().toString()
  # no Python on the frontier side (synthesis + parse are codegen)
  assert 'Python' not in plan and 'InMemoryTableScan' not in plan
  # the publishing-domain dimension is broadcast
  assert 'BroadcastHashJoin' in plan


def test_seam_accepts_real_url_frame(spark):
  urls = spark.createDataFrame(
      [(1, 'https://site0.com/news/p0', 'site0.com'),
       (2, 'https://nosuch.org/a', 'nosuch.org')],
      'doc_id long, norm_url string, domain string')
  rows = {r['doc_id']: r for r in
          sitemap_coverage(spark, '', urls=urls).collect()}
  assert rows[2]['has_sitemap'] == 0 and rows[2]['sm_listed'] == 0
  assert rows[1]['has_sitemap'] == 1
