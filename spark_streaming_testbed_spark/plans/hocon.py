"""Minimal HOCON-subset parser for reference test plans (SURVEY.md §2.1
S11 fidelity).

The reference parses its plans with Typesafe Config
(testbed TestPlan.scala:19-36); the published plans
(test-runs-001/README.md:82-93, test-runs-004/README.md:124-139) use the
HOCON features this subset covers:

- ``key = value`` and ``key : value`` bindings, top level braceless
- nested objects ``{ ... }`` and arrays ``[ ... ]``
- newline *or* comma as element/binding separator
- unquoted scalars (``type = noop``), ints, floats, booleans, quoted
  strings
- ``#`` and ``//`` comments

Substitutions, includes, multi-line strings, and key merging are out of
scope — plans never use them. The output is a plain dict consumed by
:func:`..phases.parse_plan`, so a verbatim reference ``.conf`` plan and
its JSON twin produce identical phase trees (golden-tested).
"""

from __future__ import annotations

_PUNCT = "{}[]=,:"


def _tokenize(text: str) -> list[str]:
    tokens: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "#" or text[i:i + 2] == "//":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "\n":
            tokens.append("\n")
            i += 1
        elif c in " \t\r":
            i += 1
        elif c in _PUNCT:
            tokens.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            tokens.append(text[i:j + 1])
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in _PUNCT + '"#\n \t\r':
                j += 1
            tokens.append(text[i:j])
            i = j
    return tokens


def _atom(tok: str):
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"')
    low = tok.lower()
    if low in ("true", "on", "yes"):
        return True
    if low in ("false", "off", "no"):
        return False
    if low == "null":
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


class _Parser:
    def __init__(self, tokens: list[str]) -> None:
        self.toks = tokens
        self.pos = 0

    def _peek(self, skip_newlines: bool = True) -> str | None:
        pos = self.pos
        while pos < len(self.toks) and skip_newlines and self.toks[pos] == "\n":
            pos += 1
        return self.toks[pos] if pos < len(self.toks) else None

    def _next(self, skip_newlines: bool = True) -> str | None:
        while self.pos < len(self.toks) and skip_newlines and self.toks[self.pos] == "\n":
            self.pos += 1
        if self.pos >= len(self.toks):
            return None
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    def parse_value(self):
        tok = self._next()
        if tok == "{":
            return self.parse_object(closing="}")
        if tok == "[":
            return self.parse_array()
        if tok is None or tok in "}]=,:":
            raise ValueError(f"unexpected token {tok!r} in HOCON plan")
        return _atom(tok)

    def parse_object(self, closing: str | None) -> dict:
        out: dict = {}
        while True:
            tok = self._peek()
            if tok is None:
                if closing is None:
                    return out
                raise ValueError("unterminated HOCON object")
            if tok == closing:
                self._next()
                return out
            if tok == ",":
                self._next()
                continue
            key_tok = self._next()
            key = _atom(key_tok)
            if not isinstance(key, str):
                key = key_tok
            sep = self._peek(skip_newlines=False)
            if sep in ("=", ":"):
                self._next(skip_newlines=False)
                out[key] = self.parse_value()
            elif sep == "{" or self._peek() == "{":
                out[key] = self.parse_value()  # `key { ... }` shorthand
            else:
                raise ValueError(f"expected '=' after key {key!r}")
        return out

    def parse_array(self) -> list:
        out: list = []
        while True:
            tok = self._peek()
            if tok is None:
                raise ValueError("unterminated HOCON array")
            if tok == "]":
                self._next()
                return out
            if tok == ",":
                self._next()
                continue
            out.append(self.parse_value())


def parse_hocon(text: str) -> dict:
    """Parse a HOCON-subset document to a plain dict (top level may be
    braceless, per HOCON)."""
    parser = _Parser(_tokenize(text))
    if parser._peek() == "{":
        parser._next()
        return parser.parse_object(closing="}")
    return parser.parse_object(closing=None)
