"""HTML → main-text extraction: adversarial markup vectors for the
stdlib-parser kernel (functions/htmltext.py) plus the Arrow-batched
Spark wrapper. The oracle-graded end-to-end path is
src_warc_html_extract (plans/warc_queries.py)."""

from dbimport_spark.functions.htmltext import extract_main_text


class TestKernelVectors:
    def test_full_page_chrome_dropped(self):
        title, text, links = extract_main_text(
            "<!DOCTYPE html><html><head><title>T &amp; U</title>"
            "<style>p{color:red}</style>"
            "<script>var x='<p>fake</p>'; if(1<2){}</script></head>"
            "<body><header><h1>Banner</h1>"
            '<nav><a href="/a">Home</a> <a href="/b">About</a></nav></header>'
            "<!-- comment noise -->"
            '<main><p>Hello <a href="/x">world</a> &lt;tag&gt;.</p>'
            "<p>Second&nbsp;&nbsp;para&#46;</p></main>"
            "<aside>Ad text</aside>"
            '<footer>&copy; <a href="/c">link</a></footer></body></html>'
        )
        assert title == "T & U"
        assert text == "Hello world <tag>.\nSecond para."
        assert links == 4

    def test_script_rawtext_hides_fake_markup(self):
        # '<p>' inside a script string literal must never open a block,
        # and '</p>' there must not close one
        _, text, links = extract_main_text(
            "<p>real</p><script>document.write('<p>fake</p>"
            '<a href="/evil">no</a>\');</script><p>more</p>'
        )
        assert text == "real\nmore"
        assert links == 0

    def test_entities_and_charrefs_decode(self):
        _, text, _ = extract_main_text(
            "<p>Q&amp;A &lt;notes&gt; &#35;7 &quot;x&quot; &hellip;</p>"
        )
        assert text == 'Q&A <notes> #7 "x" …'

    def test_inline_elements_do_not_split_blocks(self):
        _, text, _ = extract_main_text(
            "<p>a <b>bold</b> and <i>ital</i> and <span>span</span> end</p>"
        )
        assert text == "a bold and ital and span end"

    def test_block_elements_emit_newlines(self):
        _, text, _ = extract_main_text(
            "<div>one</div><ul><li>two</li><li>three</li></ul>"
            "<h2>four</h2>five<br>six"
        )
        assert text == "one\ntwo\nthree\nfour\nfive\nsix"

    def test_whitespace_collapses_including_nbsp(self):
        _, text, _ = extract_main_text(
            "<p>  a\n\t b&nbsp;&nbsp;c   </p>"
        )
        assert text == "a b c"

    def test_nested_chrome_depth_tracking(self):
        # a nav INSIDE a footer closing must not resurrect footer text
        _, text, _ = extract_main_text(
            "<div><footer>f1<nav>n</nav>f2</footer>keep</div>"
        )
        assert text == "keep"

    def test_unclosed_head_recovers_at_body(self):
        title, text, _ = extract_main_text(
            "<head><title>T</title><meta charset='x'>"
            "<body><p>kept</p>"
        )
        assert title == "T"
        assert text == "kept"

    def test_title_inside_head_is_captured(self):
        title, text, _ = extract_main_text(
            "<head><title>Only Title</title></head><body><p>b</p></body>"
        )
        assert title == "Only Title"
        assert text == "b"

    def test_links_counted_everywhere_but_only_with_href(self):
        _, _, links = extract_main_text(
            '<nav><a href="/1">x</a><a name="anchor">no href</a></nav>'
            '<p><a href="/2">y</a></p><footer><a href="/3">z</a></footer>'
            '<script>var a = \'<a href="/fake">f</a>\';</script>'
        )
        assert links == 3

    def test_malformed_markup_tolerated(self):
        _, text, _ = extract_main_text(
            "<p>unclosed para<div>stray </b> close & bare amp<p>tail"
        )
        assert text == "unclosed para\nstray close & bare amp\ntail"

    def test_empty_and_none_safe(self):
        assert extract_main_text("") == ("", "", 0)
        assert extract_main_text("   ") == ("", "", 0)
        assert extract_main_text("<p></p><p>  </p>") == ("", "", 0)

    def test_self_closing_and_void_tags(self):
        _, text, _ = extract_main_text(
            "<p>a<br/>b</p><hr/><p>c<img src='x'/>d</p>"
        )
        # no whitespace around the inline <img/> in the source → the
        # text runs are adjacent ("cd"), exactly as a renderer lays out
        assert text == "a\nb\ncd"

    def test_iframe_and_svg_dropped(self):
        _, text, _ = extract_main_text(
            "<p>k</p><svg><text>vector label</text></svg>"
            "<iframe>fallback junk</iframe><p>k2</p>"
        )
        assert text == "k\nk2"

    def test_table_structure_blocks(self):
        _, text, _ = extract_main_text(
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
        )
        assert text == "a\nb\nc"


def test_spark_wrapper_batches(spark):
    from pyspark.sql import functions as F

    from dbimport_spark.functions.htmltext import html_extract_udf

    df = spark.createDataFrame(
        [
            (1, "<head><title>A</title></head><p>x <b>y</b></p>"),
            (2, None),
            (3, "<nav><a href='/l'>n</a></nav><main><p>z&amp;w</p></main>"),
        ],
        "id long, html string",
    )
    got = {
        r["id"]: (r["x"]["title"], r["x"]["main_text"], r["x"]["n_links"])
        for r in df.select(
            "id", html_extract_udf()(F.col("html")).alias("x")
        ).collect()
    }
    assert got == {
        1: ("A", "x y", 0),
        2: ("", "", 0),
        3: ("", "z&w", 1),
    }


class TestLinkExtraction:
    def test_links_document_order_duplicates_kept(self):
        from dbimport_spark.functions.htmltext import extract_links

        assert extract_links(
            '<nav><a href="/a">1</a></nav><p><a href="/b">2</a>'
            '<a href="/a">3</a><a name="x">no href</a></p>'
            '<script>var s=\'<a href="/fake">f</a>\';</script>'
            "<footer><a href='/c'>4</a></footer>"
        ) == ["/a", "/b", "/a", "/c"]
        assert extract_links("") == []
        assert extract_links("<a href=''>empty</a>") == [""]

    def test_links_spark_wrapper(self, spark):
        from pyspark.sql import functions as F

        from dbimport_spark.functions.htmltext import html_links_udf

        df = spark.createDataFrame(
            [(1, '<a href="/x">x</a><a href="/y">y</a>'), (2, None)],
            "id long, html string",
        )
        got = {
            r["id"]: r["ls"]
            for r in df.select(
                "id", html_links_udf()(F.col("html")).alias("ls")
            ).collect()
        }
        assert got == {1: ["/x", "/y"], 2: []}


class TestPropertyRandomPages:
    """Hypothesis: build structured random pages from KNOWN content and
    assert the extraction invariants — planted title recovered, planted
    block texts recovered in order with whitespace collapsed, planted
    hrefs recovered exactly, chrome/script text never leaks, and no
    markup survives in the output."""

    def test_random_structured_pages(self):
        import html as _h

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dbimport_spark.functions.htmltext import (
            extract_links,
            extract_main_text,
        )

        word = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz&<>'\"",
            min_size=1,
            max_size=8,
        )
        chunk = st.lists(word, min_size=1, max_size=6).map(" ".join)
        block_tag = st.sampled_from(["p", "div", "li", "h2", "blockquote", "td"])
        inline_tag = st.sampled_from(["b", "i", "em", "span", "code"])

        @st.composite
        def page(draw):
            blocks = draw(st.lists(chunk, min_size=0, max_size=6))
            hrefs = draw(
                st.lists(
                    st.text(alphabet="abc/0123456789", min_size=1, max_size=10),
                    min_size=0,
                    max_size=4,
                )
            )
            title = draw(chunk)
            chrome = draw(chunk)
            script = draw(chunk)
            parts = [
                "<html><head>",
                f"<title>{_h.escape(title)}</title>",
                f"<script>var x = '<p>{_h.escape(script)}</p>';</script>",
                "</head><body>",
                f"<nav>{_h.escape(chrome)}</nav>",
            ]
            for j, b in enumerate(blocks):
                t = draw(block_tag)
                inner = _h.escape(b)
                if draw(st.booleans()):
                    it = draw(inline_tag)
                    inner = f"<{it}>{inner}</{it}>"
                parts.append(f"<{t}>{inner}</{t}>")
            for h in hrefs:
                parts.append(f'<footer><a href="{h}">x</a></footer>')
            parts.append("</body></html>")
            return "".join(parts), title, blocks, hrefs, chrome, script

        @settings(max_examples=120, deadline=None)
        @given(page())
        def check(case):
            html, title, blocks, hrefs, chrome, script = case
            got_title, got_text, n_links = extract_main_text(html)
            assert got_title == " ".join(title.split())
            want = [" ".join(b.split()) for b in blocks]
            want = [b for b in want if b]
            # planted blocks recovered exactly, in order, collapsed —
            # which also proves chrome/nav/script text never leaks in
            assert got_text == "\n".join(want)
            assert n_links == len(hrefs)
            assert extract_links(html) == hrefs

        check()
