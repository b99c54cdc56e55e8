"""HTML main-content extraction (boilerplate strip / DOM heuristics):
the extractor must recover the article text from boilerplate-heavy
pages — synthetic wrappers, hand-written adversarial layouts, and
malformed HTML — and the Spark op's ground truth is the original text
column (the same equality the DuckDB oracle re-checks per round)."""

import pyarrow.parquet as pq

from blueprint_oss_spark.ops.html_extract import (
    extract_main_content, html_main_content, wrap_in_boilerplate)


def test_wrapped_corpus_recovers_exactly():
  t = pq.read_table('/root/testdata/sf0.001/documents.parquet') \
      .to_pandas()
  for i, (d, txt) in enumerate(zip(t.doc_id, t.text)):
    page = wrap_in_boilerplate(str(d), txt, i % 3)
    assert extract_main_content(page) == ' '.join(txt.split()), d


def test_handwritten_adversarial_layouts():
  art = ('The quick brown fox jumped over the lazy dog while the '
         'committee debated the annual budget for nearly three hours '
         'before reaching a unanimous decision on the proposal.')
  # link-farm sidebar longer (by tag count) than the article; nested
  # divs; inline markup inside the article; entities
  page = f'''<html><body>
    <div id="menu"><a href="/a">aaaa aaaa aaaa</a><a href="/b">bbbb
    bbbb bbbb</a><a href="/c">cccc cccc cccc</a><a href="/d">dddd dddd
    dddd dddd</a></div>
    <div id="wrap"><div id="art"><p>{art[:90]}<b>bold</b>
    {art[90:]} &amp; more</p></div></div>
    <div id="footer"><a href="/t">Terms of service and privacy
    policy</a> <a href="/c">Contact our team</a></div>
    </body></html>'''
  got = extract_main_content(page)
  assert 'committee' in got and 'unanimous' in got
  assert 'Terms of service' not in got
  assert 'aaaa' not in got
  assert '& more' in got  # entity decoded

  # script/style/nav content never leaks
  page2 = ('<body><script>var x = "SECRET";</script>'
           '<style>.x{color:red}</style>'
           f'<nav>Home Products Pricing</nav><main><p>{art}</p></main>'
           '</body>')
  got2 = extract_main_content(page2)
  assert got2 == art
  assert 'SECRET' not in got2

  # malformed: unclosed tags, stray close tags — must not crash
  page3 = f'<div><p>{art}<div><b>x</p></span></html>'
  assert 'committee' in extract_main_content(page3)
  assert extract_main_content('') == ''
  assert extract_main_content('<body><a href="/x">only links'
                              '</a></body>') in ('', 'only links')


def test_spark_op_matches_original_text(spark):
  out = html_main_content(spark, '/root/testdata/sf0.001').collect()
  src = {r['doc_id']: r['text'] for r in
         spark.read.parquet(
             '/root/testdata/sf0.001/documents.parquet').collect()}
  assert len(out) == len(src)
  for r in out:
    assert r['main_text'] == ' '.join(src[r['doc_id']].split())
