"""JSON5 → strict-JSON pre-pass (stdlib, char-level tokenizer).

Reference: dataprovider/JsonDataProvider.java reads every JSON input
through a JSON5-tolerant reader; Spark's reader is strict JSON, so JSON5
files are converted driver-side before ``spark.read.json``. The probe +
conversion run only when strict parsing fails, so the big-data fast path
(splittable JVM-side JSON scan) is untouched for well-formed files —
JSON5 inputs are config-sized in practice (same stance as JSON-schema
validation).

Supported JSON5 syntax: ``//`` and ``/* */`` comments, trailing commas,
unquoted identifier keys (incl. ``$``/``_``), single-quoted strings,
string line-continuations (backslash-newline), ``\\x..`` escapes, hex
integers, numbers with leading ``+`` / bare leading or trailing decimal
point. ``Infinity``/``NaN`` literals become ``null`` (strict JSON cannot
represent them — documented deviation).
"""

from __future__ import annotations

import json as _json

_IDENT_START = set("$_abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_IDENT_CONT = _IDENT_START | set("0123456789")
_WORD_LITERALS = {
    "true": "true",
    "false": "false",
    "null": "null",
    "Infinity": "null",
    "NaN": "null",
}


def _convert_string(text: str, i: int, quote: str) -> tuple[str, int]:
    """Parse a JSON5 string starting at the opening quote; return the
    strict-JSON double-quoted form and the index after the closing quote."""
    out = ['"']
    i += 1
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\\":
            if i + 1 >= n:
                break
            nxt = text[i + 1]
            if nxt in "\r\n":  # line continuation: swallow
                i += 2
                if nxt == "\r" and i < n and text[i] == "\n":
                    i += 1
                continue
            if nxt == "x" and i + 3 < n:  # \xNN → \u00NN
                out.append("\\u00" + text[i + 2 : i + 4])
                i += 4
                continue
            if nxt == "'":  # escaped single quote: plain quote in strict JSON
                out.append("'")
                i += 2
                continue
            if nxt == "v":  # vertical tab escape
                out.append("\\u000b")
                i += 2
                continue
            out.append(ch + nxt)
            i += 2
            continue
        if ch == quote:
            out.append('"')
            return "".join(out), i + 1
        if ch == '"':  # double quote inside single-quoted string
            out.append('\\"')
            i += 1
            continue
        out.append(ch)
        i += 1
    raise ValueError("unterminated string in JSON5 input")


def _convert_number(word: str) -> str:
    w = word
    sign = ""
    if w and w[0] in "+-":
        sign = "" if w[0] == "+" else "-"
        w = w[1:]
    if w.lower().startswith("0x"):
        return sign + str(int(w, 16))
    if w.startswith("."):
        w = "0" + w
    if w.endswith("."):
        w = w + "0"
    mant, e, exp = w.partition("e") if "e" in w else w.partition("E")
    if e and mant.endswith("."):
        mant = mant + "0"
        w = mant + "e" + exp
    return sign + w


def json5_to_json(text: str) -> str:
    """Convert JSON5 text to strict JSON (raises ValueError on syntax it
    cannot place, e.g. an unterminated string)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"":
            s, i = _convert_string(text, i, ch)
            out.append(s)
            continue
        if ch == "/" and i + 1 < n and text[i + 1] == "/":
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "/" and i + 1 < n and text[i + 1] == "*":
            j = text.find("*/", i + 2)
            if j < 0:
                raise ValueError("unterminated /* comment in JSON5 input")
            i = j + 2
            continue
        if ch == ",":
            # trailing comma: lookahead (skipping ws/comments) for ] or }
            j = i + 1
            while j < n:
                c = text[j]
                if c in " \t\r\n":
                    j += 1
                elif c == "/" and j + 1 < n and text[j + 1] == "/":
                    k = text.find("\n", j)
                    j = n if k < 0 else k
                elif c == "/" and j + 1 < n and text[j + 1] == "*":
                    k = text.find("*/", j + 2)
                    if k < 0:
                        raise ValueError("unterminated /* comment in JSON5 input")
                    j = k + 2
                else:
                    break
            if j < n and text[j] in "]}":
                i += 1  # drop the comma; the lookahead region re-processes
                continue
            out.append(ch)
            i += 1
            continue
        if ch in _IDENT_START:
            j = i
            while j < n and text[j] in _IDENT_CONT:
                j += 1
            word = text[i:j]
            # identifier key? lookahead for ':'
            k = j
            while k < n and text[k] in " \t\r\n":
                k += 1
            if k < n and text[k] == ":":
                out.append('"' + word + '"')
            elif word in _WORD_LITERALS:
                out.append(_WORD_LITERALS[word])
            else:
                raise ValueError(f"bare word {word!r} is not valid JSON5 here")
            i = j
            continue
        if ch in "+-." or ch.isdigit():
            j = i
            if text[j] in "+-":
                j += 1
            if text[j : j + 8] == "Infinity" or text[j : j + 3] == "NaN":
                out.append("null")
                i = j + (8 if text[j] == "I" else 3)
                continue
            start_num = j
            while j < n and (text[j] in ".xXabcdefABCDEF+-" or text[j].isdigit()):
                # '+'/'-' only valid right after e/E (exponent sign)
                if text[j] in "+-" and text[j - 1] not in "eE":
                    break
                j += 1
            if j == start_num:
                raise ValueError(f"stray {ch!r} in JSON5 input")
            word = text[i:j]
            if word in ("Infinity", "-Infinity", "+Infinity"):
                out.append("null")
            else:
                out.append(_convert_number(word))
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def is_strict_json(text: str) -> bool:
    try:
        _json.loads(text)
        return True
    except ValueError:
        return False


def maybe_convert_file(path: str) -> str | None:
    """Probe one file: None when it is already strict JSON (or strict
    JSON-lines), else the converted strict-JSON text."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if is_strict_json(text):
        return None
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if lines and all(is_strict_json(ln) for ln in lines):
        return None  # valid JSON-lines
    converted = json5_to_json(text)
    _json.loads(converted)  # converted output must be strict — else raise
    return converted
