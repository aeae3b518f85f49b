"""Unit vectors for the robots.txt (RFC 9309) parser/matcher and the
charset sniff/decode kernel — the crawl politeness + encoding steps."""

import codecs

import pytest

from dbimport_spark.functions.charset import decode_payload, sniff_charset
from dbimport_spark.functions.robots import (
    is_allowed,
    parse_robots,
    rule_pattern_to_regex,
)


# --------------------------------------------------------------- robots


def verdict(txt: str, agent: str, path: str) -> bool:
    return is_allowed(parse_robots(txt, agent), path)


class TestRobotsParse:
    def test_blanket_disallow(self):
        assert not verdict("User-agent: *\nDisallow: /\n", "bot", "/any")

    def test_empty_disallow_allows_all(self):
        assert verdict("User-agent: *\nDisallow:\n", "bot", "/doc/1")

    def test_no_robots_rules_at_all(self):
        assert verdict("", "bot", "/doc/1")
        assert verdict("Sitemap: https://x/s.xml\n", "bot", "/doc/1")

    def test_longest_match_allow_override(self):
        txt = "User-agent: *\nDisallow: /doc/\nAllow: /doc/public\n"
        assert not verdict(txt, "bot", "/doc/private")
        assert verdict(txt, "bot", "/doc/public/x")

    def test_equal_length_tie_allow_wins(self):
        # RFC 9309 §2.2.2: with equivalent-length rules, the least
        # restrictive (Allow) MUST be used
        txt = "User-agent: *\nDisallow: /page\nAllow: /page\n"
        assert verdict(txt, "bot", "/page/1")

    def test_wildcard_star_and_dollar(self):
        txt = "User-agent: *\nDisallow: /*.pdf$\n"
        assert not verdict(txt, "bot", "/a/b/report.pdf")
        assert verdict(txt, "bot", "/a/b/report.pdf?x=1")
        assert verdict(txt, "bot", "/a/b/report.pdfx")

    def test_group_selection_specific_beats_star(self):
        txt = (
            "User-agent: graftbot\nDisallow: /private\n\n"
            "User-agent: *\nDisallow: /\n"
        )
        assert verdict(txt, "graftbot", "/doc/1")
        assert not verdict(txt, "graftbot", "/private/x")
        assert not verdict(txt, "otherbot", "/doc/1")

    def test_group_selection_longest_product_token_prefix(self):
        txt = (
            "User-agent: graft\nDisallow: /a\n\n"
            "User-agent: graftbot\nDisallow: /b\n"
        )
        assert verdict(txt, "graftbot-v2", "/a/x")
        assert not verdict(txt, "graftbot-v2", "/b/x")

    def test_group_selection_case_insensitive(self):
        txt = "User-Agent: GraftBot\nDisallow: /x\n"
        assert not verdict(txt, "graftbot", "/x/1")

    def test_consecutive_ua_lines_share_group(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert not verdict(txt, "b", "/x/1")
        assert not verdict(txt, "a", "/x/1")

    def test_ua_line_after_rules_starts_new_group(self):
        txt = (
            "User-agent: a\nDisallow: /a\n"
            "User-agent: b\nDisallow: /b\n"
        )
        assert verdict(txt, "b", "/a/1")
        assert not verdict(txt, "b", "/b/1")

    def test_comments_and_unknown_directives_ignored(self):
        txt = (
            "# policy\nUser-agent: * # all\n"
            "Crawl-delay: 2\nDisallow: /x # no x\n"
        )
        assert not verdict(txt, "bot", "/x/1")
        assert verdict(txt, "bot", "/y")

    def test_rules_before_any_group_are_dropped(self):
        assert verdict("Disallow: /\nUser-agent: *\nDisallow:\n", "b", "/p")

    def test_same_token_groups_merge(self):
        # RFC 9309 §2.2.1: groups naming the same product token MUST be
        # combined — the second graftbot group here is not shadowed
        txt = (
            "User-agent: graftbot\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: graftbot\nDisallow: /b\n"
        )
        assert not verdict(txt, "graftbot", "/a/x")
        assert not verdict(txt, "graftbot", "/b/x")
        assert verdict(txt, "graftbot", "/c")

    def test_star_groups_merge(self):
        txt = (
            "User-agent: *\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /b\n"
        )
        assert not verdict(txt, "bot", "/a")
        assert not verdict(txt, "bot", "/b")

    def test_pattern_regex_escapes_metacharacters(self):
        rx = rule_pattern_to_regex("/a+b(c).d")
        assert is_allowed([(False, "/a+b(c).d", 9, rx)], "/a+b(c).d") is False
        assert is_allowed([(False, "/a+b(c).d", 9, rx)], "/aab(c)xd") is True


# --------------------------------------------------------------- charset


class TestCharset:
    def test_bom_beats_conflicting_header(self):
        body = codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
        cs, text = decode_payload(body, "text/plain; charset=utf-8")
        assert (cs, text) == ("utf-16-le", "héllo")

    def test_utf32_bom_checked_before_utf16(self):
        body = codecs.BOM_UTF32_LE + "ab".encode("utf-32-le")
        assert sniff_charset(body, None)[0] == "utf-32-le"

    def test_utf8_bom_stripped(self):
        cs, text = decode_payload(codecs.BOM_UTF8 + "hi".encode(), None)
        assert (cs, text) == ("utf-8", "hi")

    def test_header_charset_case_and_quotes(self):
        cs, _ = decode_payload(b"abc", 'text/html; charset="ISO-8859-1"')
        assert cs == "iso-8859-1"

    def test_meta_prescan_within_1024(self):
        body = b"<html><meta charset=windows-1252>" + b"\x80 euro"
        cs, text = decode_payload(body, "text/html")
        assert cs == "windows-1252"
        assert "€" in text

    def test_meta_beyond_1024_not_scanned(self):
        body = b" " * 1100 + b'<meta charset="utf-16">plain'
        assert sniff_charset(body, None)[0] == "utf-8"

    def test_unknown_label_falls_through(self):
        assert sniff_charset(b"x", "text/plain; charset=not-a-charset")[0] == "utf-8"

    def test_invalid_utf8_label_backstops_to_cp1252(self):
        cs, text = decode_payload(b"caf\xe9", "text/plain; charset=utf-8")
        assert (cs, text) == ("windows-1252", "café")

    def test_cp1252_undefined_byte_backstops_to_latin1(self):
        # 0x81 is undefined in cp1252; latin-1 maps it to a C1 control —
        # the decode must not raise
        cs, text = decode_payload(b"a\x81b", None)
        assert cs == "windows-1252"
        assert text == "a\x81b"

    def test_plain_ascii_defaults_utf8(self):
        assert decode_payload(b"plain", None) == ("utf-8", "plain")

    @pytest.mark.parametrize("label,name", [
        ("latin1", "iso-8859-1"), ("UTF8", "utf-8"), ("cp1252", "windows-1252"),
    ])
    def test_label_canonicalization(self, label, name):
        assert sniff_charset(b"x", f"t/p; charset={label}")[0] == name


# ------------------------------------------------------ property tests


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _pattern_chars = st.text(
        alphabet="/abc123*$.+()[]{}|\\^?&~# \t",
        min_size=0,
        max_size=12,
    )
    _path = st.text(
        alphabet="/abc123*$.+()[]{}|\\^? ", min_size=0, max_size=16
    )
    _line = st.one_of(
        st.just("User-agent: *"),
        st.just("User-agent: graftbot"),
        _pattern_chars.map(lambda p: f"Disallow: {p}"),
        _pattern_chars.map(lambda p: f"Allow: {p}"),
        st.just("Crawl-delay: 3"),
        st.just("# comment"),
        st.just(""),
        st.text(max_size=20),  # garbage lines
    )
    _robots = st.lists(_line, max_size=12).map("\n".join)

    class TestRobotsProperties:
        @given(_robots, _path)
        @settings(max_examples=300, deadline=None)
        def test_never_raises_and_returns_bool(self, txt, path):
            v = is_allowed(parse_robots(txt, "graftbot"), path)
            assert isinstance(v, bool)

        @given(_robots, _pattern_chars, _path)
        @settings(max_examples=300, deadline=None)
        def test_adding_allow_rule_is_monotone(self, txt, pat, path):
            """An extra Allow rule can flip a verdict blocked->allowed
            but never allowed->blocked (it competes in the longest-match
            ordering with the allow tie-break, so it only ever wins FOR
            allowing)."""
            base = is_allowed(parse_robots(txt, "graftbot"), path)
            widened = txt + f"\nUser-agent: *\nAllow: {pat}"
            after = is_allowed(parse_robots(widened, "graftbot"), path)
            if base:
                assert after, (txt, pat, path)

        @given(_robots, _path)
        @settings(max_examples=200, deadline=None)
        def test_trailing_star_groups_never_shadow_a_specific_group(
            self, txt, path
        ):
            """With a specific graftbot group present, appending any
            text containing only *-or-foreign user-agent lines must not
            change the verdict (group choice is by agent token, not
            file order). Lines that could merge into the graftbot
            token are filtered out of the suffix."""
            kept = [
                ln
                for ln in txt.splitlines()
                if not (
                    ln.lower().startswith("user-agent:")
                    and "graftbot".startswith(
                        ln.split(":", 1)[1].strip().lower()
                    )
                )
            ]
            # groups are delimited by user-agent lines, not blanks: bare
            # rule lines at the top of the suffix would legitimately
            # extend the graftbot group, so start at the first UA line
            while kept and not kept[0].lower().startswith("user-agent:"):
                kept.pop(0)
            suffix = "\n".join(kept)
            base = "User-agent: graftbot\nDisallow: /blocked"
            assert parse_robots(f"{base}\n\n{suffix}", "graftbot") == (
                parse_robots(base, "graftbot")
            )

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# ------------------------------------------- regex-dialect cross-check


def test_rule_regex_same_verdict_in_java_and_python(spark):
    """The production verdict evaluates rule_pattern_to_regex output with
    Java's regex engine (rlike inside the higher-order aggregate) while
    the unit matcher uses Python re — the two dialects disagree on some
    escape forms, so pin them to identical verdicts over a hostile grid
    of pattern metacharacters, wildcards, anchors and unicode."""
    import re as _re

    patterns = [
        "/", "/*", "/a*b$", "/doc/", "/doc/*/x$", "/$", "/*$", "/a+b",
        "/a.b", "/a(b)c", "/a[b]c", "/a{2}", "/a|b", "/a\\b", "/a^b",
        "/a?q=1", "/ümlaut/*", "/sp ace", "/a&b~c#d", "/doc/1$",
    ]
    paths = [
        "/", "/doc/1", "/doc/12", "/a*b", "/axb", "/a.b", "/aXb",
        "/a(b)c", "/a[b]c", "/a{2}", "/a|b", "/a\\b", "/a^b", "/a+b",
        "/a?q=1", "/ümlaut/x", "/sp ace", "/a&b~c#d", "/doc/1x",
        "/aab", "/doc/", "",
    ]
    cases = [
        (p, rule_pattern_to_regex(p), path) for p in patterns for path in paths
    ]
    df = spark.createDataFrame(
        [(rx, path) for _p, rx, path in cases], "rx string, path string"
    )
    got = [
        bool(r.m)
        for r in df.selectExpr("path rlike rx AS m").collect()
    ]
    want = [bool(_re.match(rx, path)) for _p, rx, path in cases]
    diverged = [
        (cases[i][0], cases[i][2])
        for i, (g, w) in enumerate(zip(got, want))
        if g != w
    ]
    assert not diverged, f"Java/Python regex verdicts diverge: {diverged}"
