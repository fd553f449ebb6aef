"""KQL tokenizer.

Token kinds: IDENT, NUMBER, STRING, TIMESPAN, OP, PUNCT, PIPE, EOF.
Timespan literals (`1h`, `30m`, `10s`, `2d`, `100ms`) are first-class —
they are central to an events store (`bin(ts, 1h)`), reference
README.md:15,27."""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "and", "or", "not", "by", "on", "kind", "asc", "desc", "nulls",
    "first", "last", "in", "has", "has_cs", "contains", "contains_cs",
    "startswith", "endswith", "matches", "regex", "between", "let",
    "with", "from", "to", "step", "true", "false", "null",
}

_TIMESPAN_RE = re.compile(r"(?P<num>\d+(?:\.\d+)?)(?P<unit>ms|microsecond|tick|d|h|m|s)\b")
_NUMBER_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_HEX_RE = re.compile(r"0[xX][0-9a-fA-F]+")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# multi-char operators first
_OPS = [
    "==", "!=", "<=", ">=", "=~", "!~", "!in~", "!in",
    # negated string predicates (longest first — '!has' prefixes others)
    "!hasprefix_cs", "!hassuffix_cs", "!hasprefix", "!hassuffix",
    "!has_cs", "!has", "!contains_cs", "!contains",
    "!startswith_cs", "!startswith", "!endswith_cs", "!endswith",
    "!between",
    "..", "=>", "<", ">",
    "+", "-", "*", "/", "%", "=",
]
_PUNCT = ["|", "(", ")", "[", "]", "{", "}", ",", ";", ".", ":", "$"]

# operator families that legitimately contain hyphens
_HYPHEN_OPS = {
    "project", "top", "mv", "sample", "parse", "make", "top-nested", "graph",
}

TIMESPAN_SECONDS = {
    "d": 86400.0,
    "h": 3600.0,
    "m": 60.0,
    "s": 1.0,
    "ms": 0.001,
    "microsecond": 1e-6,
    "tick": 1e-7,
}


@dataclass
class Token:
    kind: str  # IDENT NUMBER STRING TIMESPAN OP PUNCT EOF
    value: str | float
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


class KqlSyntaxError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch == "/" and text[i : i + 2] == "//":  # line comment
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch in "hH" and text[i + 1 : i + 2] and text[i + 1] in "'\"@":
            # Kusto obfuscated string literal h'…' / h"…" / h@'…':
            # semantically a plain string (the h only hides the value
            # in Kusto's telemetry) — strip the prefix and re-lex
            i += 1
            ch = text[i]
            # falls through to the verbatim / quoted branches below
        if ch == "@" and text[i + 1 : i + 2] and text[i + 1] in "'\"":
            # Kusto verbatim string: no backslash escapes; a doubled
            # quote character stands for itself
            q = text[i + 1]
            j = i + 2
            buf = []
            while j < n:
                if text[j] == q:
                    if text[j + 1 : j + 2] == q:
                        buf.append(q)
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            if j >= n:
                raise KqlSyntaxError(f"unterminated verbatim string at {i}")
            tokens.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if ch in "'\"":
            j = i + 1
            buf = []
            while j < n and text[j] != ch:
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append({"n": "\n", "t": "\t", "\\": "\\", ch: ch}.get(esc, esc))
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise KqlSyntaxError(f"unterminated string at {i}")
            tokens.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if ch.isdigit():
            # hex literal (Kusto: 0xFF is a long) — before the decimal
            # matcher, which would stop at the 'x' (r14)
            m = _HEX_RE.match(text, i)
            if m:
                tokens.append(Token("NUMBER", int(m.group(), 16), i))
                i = m.end()
                continue
            m = _TIMESPAN_RE.match(text, i)
            if m:
                secs = float(m.group("num")) * TIMESPAN_SECONDS[m.group("unit")]
                tokens.append(Token("TIMESPAN", secs, i))
                i = m.end()
                continue
            m = _NUMBER_RE.match(text, i)
            # integral literals stay python ints (Kusto: bare integers
            # are long) — float() would silently corrupt epoch-scale
            # ids beyond 2^53 (e.g. nanosecond timestamps in where
            # clauses); decimal-point / exponent forms are real
            txt = m.group()
            val = (
                float(txt)
                if ("." in txt or "e" in txt or "E" in txt)
                else int(txt)
            )
            tokens.append(Token("NUMBER", val, i))
            i = m.end()
            continue
        m = _IDENT_RE.match(text, i)
        if m:
            word = m.group()
            # hyphenated OPERATOR names only (project-away, top-nested,
            # mv-expand…) — a bare `a-b` stays arithmetic
            while (
                word.split("-")[0] in _HYPHEN_OPS
                and text[m.end() : m.end() + 1] == "-"
                and _IDENT_RE.match(text, m.end() + 1)
            ):
                m2 = _IDENT_RE.match(text, m.end() + 1)
                word = f"{word}-{m2.group()}"
                m = m2
            # case-insensitive membership operator `in~` (the `~` is not
            # an operator character on its own)
            if word == "in" and text[m.end() : m.end() + 1] == "~":
                tokens.append(Token("OP", "in~", i))
                i = m.end() + 1
                continue
            tokens.append(Token("IDENT", word, i))
            i = m.end()
            continue
        for op in _OPS:
            if text.startswith(op, i):
                tokens.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            if ch in _PUNCT:
                tokens.append(Token("PUNCT", ch, i))
                i += 1
            else:
                raise KqlSyntaxError(f"unexpected character {ch!r} at {i}")
    tokens.append(Token("EOF", "", n))
    return tokens
