"""HTML main-content extraction: boilerplate stripping via DOM
heuristics (north rule: "HTML boilerplate strip, ... DOM heuristics").

A readability-lite block scorer over the stdlib HTML parser — no
external libs:

  * the DOM is segmented into BLOCKS at block-level container
    boundaries (div/article/section/main/p/td/li/...);
  * hard boilerplate containers (script/style/nav/header/footer/aside/
    form/noscript/iframe/button/svg) are skipped subtree-wide;
  * every block scores text_len · (1 − link_density)² — long
    low-link-density prose wins, menus/footers (all-link, short) lose;
  * the winning CONTAINER is the parent owning the best direct block,
    and its contiguous text is returned.

The Spark operator wraps the `documents` table's text into deterministic
boilerplate-heavy page templates (menu/nav/sidebar/ads/footer) and
strips it back — so the ground truth IS the original text column and
the DuckDB oracle is `SELECT doc_id, text AS main_text FROM documents`:
a from-scratch, engine-independent oracle for the whole
wrap→parse→strip loop.
"""

from __future__ import annotations

import html as html_mod
from html.parser import HTMLParser
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

_SKIP_SUBTREE = {'script', 'style', 'nav', 'header', 'footer', 'aside',
                 'form', 'noscript', 'iframe', 'button', 'svg',
                 'template'}
_BLOCK_TAGS = {'div', 'article', 'section', 'main', 'p', 'td', 'li',
               'blockquote', 'pre', 'body', 'ul', 'ol', 'table', 'tr',
               'h1', 'h2', 'h3', 'h4', 'h5', 'h6'}


class _Blocks(HTMLParser):
  """Accumulate (container_id, text, link_text) per block."""

  def __init__(self):
    super().__init__(convert_charrefs=True)
    self._skip = 0
    self._link = 0
    self._stack: List[int] = []   # ids of open block containers
    self._next_id = 0
    self.parent_of = {}           # block container id -> parent id
    self.blocks: List[List] = []  # [container_id, [text], [link_text]]
    self._open_block()

  def _open_block(self):
    cid = self._next_id
    self._next_id += 1
    self.parent_of[cid] = self._stack[-1] if self._stack else None
    self._stack.append(cid)
    self.blocks.append([cid, [], []])
    return cid

  def handle_starttag(self, tag, attrs):
    if tag in _SKIP_SUBTREE:
      self._skip += 1
      return
    if self._skip:
      return
    if tag == 'a':
      self._link += 1
    elif tag in _BLOCK_TAGS:
      self._open_block()

  def handle_endtag(self, tag):
    if tag in _SKIP_SUBTREE:
      self._skip = max(0, self._skip - 1)
      return
    if self._skip:
      return
    if tag == 'a':
      self._link = max(0, self._link - 1)
    elif tag in _BLOCK_TAGS and len(self._stack) > 1:
      self._stack.pop()
      # text after a closed child belongs to a fresh block of the parent
      parent = self._stack[-1]
      self.blocks.append([parent, [], []])

  def handle_data(self, data):
    if self._skip or not data.strip():
      return
    cid = self._stack[-1]
    self.blocks[-1][0] = cid
    self.blocks[-1][1].append(data)
    if self._link:
      self.blocks[-1][2].append(data)


def extract_main_content(html: str) -> str:
  """Boilerplate-stripped main text of an HTML page (DOM-heuristic
  block scoring; deterministic, stdlib-only)."""
  p = _Blocks()
  p.feed(html)
  p.close()
  best_cid, best_score = None, -1.0
  per_container: dict = {}
  for cid, texts, links in p.blocks:
    if not texts:
      continue
    t = ''.join(texts)
    lt = ''.join(links)
    entry = per_container.setdefault(cid, [0, 0, []])
    entry[0] += len(t.strip())
    entry[1] += len(lt.strip())
    entry[2].append(t)
  for cid, (n, nl, texts) in per_container.items():
    if n == 0:
      continue
    link_density = nl / n
    score = n * (1.0 - link_density) ** 2
    if score > best_score:
      best_score, best_cid = score, cid
  if best_cid is None:
    return ''
  return ' '.join(''.join(per_container[best_cid][2]).split())


# ---------------------------------------------------------------------------
# Deterministic boilerplate templates (derived per doc_id).
# ---------------------------------------------------------------------------

_MENUS = [
    ['Home', 'Products', 'Pricing', 'About us', 'Contact', 'Careers'],
    ['News', 'Sports', 'Tech', 'Science', 'Opinion', 'Archive'],
    ['Login', 'Register', 'Help', 'Terms', 'Privacy'],
]


def wrap_in_boilerplate(doc_id: str, text: str, variant: int) -> str:
  """Wrap text in a boilerplate-heavy page: nav menus, link-farm
  sidebar, ad blocks, footers — everything a main-content extractor
  must strip.  Deterministic per (doc_id, variant)."""
  menu = _MENUS[variant % len(_MENUS)]
  nav = ''.join(f'<li><a href="/{m.lower()}">{m}</a></li>' for m in menu)
  related = ''.join(
      f'<p><a href="/story/{i}">Related story number {i} about '
      f'{menu[i % len(menu)]}</a></p>' for i in range(5))
  body = html_mod.escape(text)
  return f'''<!DOCTYPE html>
<html><head><title>{html_mod.escape(doc_id)}</title>
<style>.ad {{color: red}}</style>
<script>var tracker = "{doc_id}";</script></head>
<body>
<header><h1><a href="/">Example Site</a></h1>
<nav><ul>{nav}</ul></nav></header>
<div class="ad"><a href="/buy">BUY NOW limited offer</a></div>
<main><article><p>{body}</p></article></main>
<aside><h3>Related</h3>{related}</aside>
<div class="ad"><a href="/subscribe">Subscribe for more</a></div>
<footer><p>© 2026 Example Site — <a href="/terms">Terms</a>
<a href="/privacy">Privacy</a> <a href="/contact">Contact</a></p>
</footer></body></html>'''


def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
  """documents.text → boilerplate-heavy HTML (deterministic template
  per doc) → DOM-heuristic strip back to main text.  Arrow-batched
  mapInPandas; ground truth is the original text column, so the DuckDB
  oracle recomputes the expected output engine-independently."""
  docs = spark.read.parquet(f'{sf_dir}/documents.parquet') \
      .select('doc_id', 'text') \
      .withColumn('variant',
                  F.pmod(F.xxhash64('doc_id'), F.lit(3)).cast('int'))
  id_type = docs.schema['doc_id'].dataType

  out_schema = StructType([
      StructField('doc_id', id_type),
      StructField('main_text', StringType()),
  ])

  def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
      outs = []
      for doc_id, text, variant in zip(pdf['doc_id'], pdf['text'],
                                       pdf['variant']):
        page = wrap_in_boilerplate(str(doc_id), text, int(variant))
        outs.append(extract_main_content(page))
      yield pd.DataFrame({'doc_id': pdf['doc_id'], 'main_text': outs})

  return docs.mapInPandas(run, out_schema).orderBy('doc_id')
