"""robots.txt parsing + rule matching (Robots Exclusion Protocol).

From-scratch implementation of RFC 9309 (public spec,
https://www.rfc-editor.org/rfc/rfc9309): group selection by product
token, Allow/Disallow rules with ``*`` wildcards and the ``$``
end-anchor, longest-match precedence with Allow winning length ties.

The parse step produces plain (allow, pattern, precedence, regex) rows
so the MATCH can run JVM-side: the rules table for a crawl is tiny
relative to the captures (one record per host), so the engine broadcasts
it and evaluates the compiled pattern with ``rlike`` inside the join —
the 100 TB capture set never leaves the scan stage for the verdict.

Beyond-reference scale-pipeline scope (builder's brief); the reference's
closest analogue is its per-format record envelope
(/root/reference/src/main/java/de/soderer/dbimport/dataprovider/
DataProvider.java:166-197).
"""

from __future__ import annotations

import re

_RULE_KEYS = {"allow": True, "disallow": False}


def rule_pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex (Java- and Python-
    compatible escapes): ``*`` matches any run of octets, a trailing
    ``$`` anchors at end-of-path, everything else is literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def parse_robots(text: str, agent: str) -> list[tuple[bool, str, int, str]]:
    """Parse a robots.txt body and return the rules of the group that
    applies to ``agent``: [(allow, pattern, precedence, regex), ...].

    Group selection per RFC 9309 §2.2.1: the user-agent product token
    that is the longest case-insensitive prefix of ``agent`` wins;
    absent any such token, the ``*`` groups apply; absent both, no
    rules (everything allowed). Multiple groups naming the SAME token
    are merged into one rule set, as the RFC requires. Consecutive
    ``User-agent`` lines share one group; empty ``Disallow:``
    contributes no rule; unknown directives (Crawl-delay, Sitemap,
    comments) are ignored."""
    agent_lc = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules or not groups:
                groups.append(([], []))
                in_rules = False
            groups[-1][0].append(val.lower())
            cur_agents = groups[-1][0]
        elif key in _RULE_KEYS:
            if not cur_agents:
                continue  # rules before any user-agent line: undefined, skip
            in_rules = True
            if val:
                groups[-1][1].append((_RULE_KEYS[key], val))
        else:
            in_rules = in_rules or bool(groups)
    by_token: dict[str, list[tuple[bool, str]]] = {}
    for agents, rules in groups:
        for a in agents:
            by_token.setdefault(a, []).extend(rules)
    best_token: str | None = None
    for a in by_token:
        if a != "*" and agent_lc.startswith(a):
            if best_token is None or len(a) > len(best_token):
                best_token = a
    if best_token is None and "*" in by_token:
        best_token = "*"
    chosen = by_token.get(best_token, []) if best_token is not None else []
    return [
        (allow, pat, len(pat), rule_pattern_to_regex(pat))
        for allow, pat in chosen
    ]


def is_allowed(rules: list[tuple[bool, str, int, str]], path: str) -> bool:
    """Reference (single-node) verdict for tests: longest-match wins,
    Allow beats Disallow on equal length, no match means allowed."""
    verdict = True
    best = (-1, -1)
    for allow, _pat, prec, rx in rules:
        if re.match(rx, path):
            key = (prec, 1 if allow else 0)
            if key > best:
                best, verdict = key, allow
    return verdict
