"""HTML → clean-text main-content extraction (stdlib, Arrow-batched).

The operator a crawl pipeline runs between the WARC response scan and
the quality/dedup family: strip markup, drop script/style/template
payloads and page chrome (nav/header/footer/aside — the main-content
heuristic), decode entities, collapse whitespace, and keep block
structure as newlines. CommonCrawl's WET files are exactly this
transform applied to WARC captures.

Reference parity: the reference dispatches each input format through a
provider that yields clean records from a raw envelope
(/root/reference/src/main/java/de/soderer/dbimport/dataprovider/
DataProvider.java:166-197); HTML-as-envelope is that same pattern
applied to crawl payloads (beyond-reference scale-pipeline scope from
the builder's brief).

Design notes (public-spec behavior, no third-party libs):

* ``html.parser.HTMLParser`` with ``convert_charrefs=True`` — entities
  and character references arrive as decoded text; ``<script>``/
  ``<style>`` contents are CDATA to the parser, so fake tags inside
  string literals never surface as markup.
* DROP elements (``script style noscript template head svg``) are
  removed wholesale; CHROME elements (``nav header footer aside``) are
  removed by the main-content heuristic; both nest (a ``<nav>`` inside
  ``<footer>`` closing does not resurrect the footer text) via depth
  counters rather than booleans.
* BLOCK elements flush the current text run as one output block;
  within a block all whitespace (including NBSP — ``str.split()``
  handles unicode spaces) collapses to single spaces; blocks join with
  ``"\n"``. Inline elements (``a b i span em code …``) contribute
  their text to the enclosing block, so a link mid-sentence never
  splits the sentence.
* Malformed markup: the stdlib parser is tolerant (unclosed tags,
  stray ``</..>``, bare ``&``); depth counters never go negative.

Scale shape: one Python kernel call per Arrow batch inside a map-only
projection — no shuffle, no driver path; at 100 TB this rides the same
member-range-split WARC scan tasks as the payload read itself.
"""

from __future__ import annotations

from html.parser import HTMLParser

# module-level: pandas_udf resolves string type hints in module
# globals, and `from __future__ import annotations` makes hints strings
import pandas as pd

from pyspark.sql import functions as F

DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe"}
)
CHROME_TAGS = frozenset({"nav", "header", "footer", "aside"})
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "html",
        "ul", "ol", "li", "dl", "dt", "dd",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "table", "thead", "tbody", "tr", "td", "th", "caption",
        "blockquote", "pre", "figure", "figcaption", "form",
        "hr", "br", "title",
    }
)
VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})


class MainTextParser(HTMLParser):
    """One-pass extractor: main text blocks, <title>, and every
    ``<a href>`` target (links are collected everywhere, including
    dropped chrome — the link graph does not care where on the page an
    outlink sits)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop = 0
        self._chrome = 0
        self._in_title = 0
        self._head_open = False  # unclosed <head> recovery (see <body>)
        self._buf: list[str] = []
        self._blocks: list[str] = []
        self._title_parts: list[str] = []
        self.links: list[str] = []

    # -- block bookkeeping -------------------------------------------
    def _flush(self) -> None:
        if self._buf:
            text = " ".join("".join(self._buf).split())
            self._buf.clear()
            if text:
                self._blocks.append(text)

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    self.links.append(v if v is not None else "")
                    break
        if tag == "body" and self._head_open:
            # real-world recovery: an unclosed <head> must not swallow
            # the whole document once <body> starts
            self._head_open = False
            if self._drop:
                self._drop -= 1
        if tag in DROP_TAGS:
            self._drop += 1
            if tag == "head":
                self._head_open = True
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome += 1
            return
        if tag == "title":
            self._in_title += 1
        if tag in BLOCK_TAGS:
            self._flush()
        # VOID tags never get an endtag; nothing to track for them

    def handle_startendtag(self, tag, attrs):
        # <tag/> — treat as start immediately followed by end
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            if self._drop:
                self._drop -= 1
            if tag == "head":
                self._head_open = False
            return
        if tag in CHROME_TAGS:
            if self._chrome:
                self._flush()
                self._chrome -= 1
            return
        if tag == "title" and self._in_title:
            self._in_title -= 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            # <title> lives inside <head> (a DROP region) — capture it
            # anyway; it is the one head element with user-facing text
            self._title_parts.append(data)
            return
        if self._drop or self._chrome:
            return
        self._buf.append(data)

    # comments / decls / PIs: ignored (default no-ops)

    def result(self) -> tuple[str, str, int]:
        self._flush()
        title = " ".join("".join(self._title_parts).split())
        return title, "\n".join(self._blocks), len(self.links)


def extract_main_text(html: str) -> tuple[str, str, int]:
    """(title, main_text, n_links) for one HTML document."""
    p = MainTextParser()
    p.feed(html or "")
    p.close()
    return p.result()


def extract_links(html: str) -> list:
    """Every <a href> target on the page, document order, duplicates
    kept (the crawl frontier / link graph wants raw edges)."""
    p = MainTextParser()
    p.feed(html or "")
    p.close()
    return p.links


_SCHEMA = "struct<title:string, main_text:string, n_links:int>"


def html_extract_udf():
    """Arrow-batched kernel: html string column → struct<title,
    main_text, n_links>. One parser instance per row, one Python
    round-trip per batch."""

    @F.pandas_udf(_SCHEMA)
    def _kernel(html: pd.Series) -> pd.DataFrame:
        rows = [extract_main_text(h) for h in html.fillna("")]
        return pd.DataFrame(rows, columns=["title", "main_text", "n_links"])

    return _kernel


def html_links_udf():
    """Arrow-batched kernel: html string column → array<string> of every
    <a href> target — the crawl-frontier / link-graph extraction pass."""

    @F.pandas_udf("array<string>")
    def _kernel(html: pd.Series) -> pd.Series:
        return html.fillna("").map(extract_links)

    return _kernel
