"""OPTIMADE-style filter language -> Catalyst Column compiler.

The reference ships the filter STRING to remote providers unparsed (the
"IR" is the string — SURVEY.md §3.1); our engine owns the tables, so we
parse the language into an AST and compile to a Column expression tree
that Catalyst can push into the Parquet scan.

Grammar (P1-P8 from the reference's documented surface,
Optimade_Server/server.py:77-83 + Optimade_Agent/agent.py:118-163, extended
with the standard OPTIMADE string/length/known operators):

    expr        := or_expr
    or_expr     := and_expr (OR and_expr)*
    and_expr    := not_expr (AND not_expr)*
    not_expr    := NOT not_expr | '(' expr ')' | predicate
    predicate   := field cmp_op literal
                 | literal cmp_op field            (reversed form)
                 | field CONTAINS string
                 | field STARTS [WITH] string
                 | field ENDS [WITH] string
                 | field HAS [ALL|ANY|ONLY] string (',' string)*
                 | field LENGTH [cmp_op] number
                 | field IS KNOWN | field IS UNKNOWN
    cmp_op      := '=' | '!=' | '<' | '<=' | '>' | '>='
    literal     := string | number
    field       := identifier ('.' identifier)*

Literal canonicalization (P12/P13) happens at compile time via per-field
canonicalizers (Hill formula for chemical_formula_reduced, unicode-digit
normalization everywhere), so the stored column is compared with a plain
constant — pushdown-able, SURVEY.md §4 R4.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_dice_spark.functions.formula import hill_formula, normalize_unicode_digits


class FilterSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Cmp:
    field: str
    op: str  # = != < <= > >=
    value: Union[str, int, float]


@dataclass(frozen=True)
class StrMatch:
    field: str
    mode: str  # contains | starts | ends
    value: str


@dataclass(frozen=True)
class Has:
    field: str
    mode: str  # has | all | any | only
    values: tuple


@dataclass(frozen=True)
class Length:
    field: str
    op: str
    value: int


@dataclass(frozen=True)
class Known:
    field: str
    known: bool


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class BoolOp:
    op: str  # and | or
    children: tuple


Node = Union[Cmp, StrMatch, Has, Length, Known, Not, BoolOp]

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|!=|=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "HAS", "ALL", "ANY", "ONLY", "CONTAINS",
    "STARTS", "ENDS", "WITH", "LENGTH", "IS", "KNOWN", "UNKNOWN",
}


def _tokenize(text: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise FilterSyntaxError(f"unexpected character at {pos}: {text[pos:pos+10]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "string":
            out.append(("string", val[1:-1].replace('\\"', '"').replace("\\\\", "\\")))
        elif kind == "number":
            out.append(("number", float(val) if ("." in val or "e" in val.lower()) else int(val)))
        elif kind == "word":
            up = val.upper()
            if up in _KEYWORDS:
                out.append(("kw", up))
            else:
                out.append(("field", val))
        else:
            out.append((kind, val))
    return out


# ---------------------------------------------------------------------------
# recursive-descent parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Optional[tuple[str, object]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, object]:
        tok = self.peek()
        if tok is None:
            raise FilterSyntaxError("unexpected end of filter")
        self.i += 1
        return tok

    def expect(self, kind: str, value=None):
        tok = self.next()
        if tok[0] != kind or (value is not None and tok[1] != value):
            raise FilterSyntaxError(f"expected {value or kind}, got {tok[1]!r}")
        return tok

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise FilterSyntaxError(f"trailing tokens at {self.peek()[1]!r}")
        return node

    def or_expr(self) -> Node:
        children = [self.and_expr()]
        while self.peek() == ("kw", "OR"):
            self.next()
            children.append(self.and_expr())
        return children[0] if len(children) == 1 else BoolOp("or", tuple(children))

    def and_expr(self) -> Node:
        children = [self.not_expr()]
        while self.peek() == ("kw", "AND"):
            self.next()
            children.append(self.not_expr())
        return children[0] if len(children) == 1 else BoolOp("and", tuple(children))

    def not_expr(self) -> Node:
        if self.peek() == ("kw", "NOT"):
            self.next()
            return Not(self.not_expr())
        if self.peek() == ("lparen", "("):
            self.next()
            node = self.or_expr()
            self.expect("rparen")
            return node
        return self.predicate()

    def predicate(self) -> Node:
        kind, val = self.next()
        if kind in ("string", "number"):
            # reversed form: literal op field
            op = self.expect("op")[1]
            field = self.expect("field")[1]
            return Cmp(field, _flip(op), val)
        if kind != "field":
            raise FilterSyntaxError(f"expected a field name, got {val!r}")
        field = val
        tok = self.next()
        if tok[0] == "op":
            vk, vv = self.next()
            if vk not in ("string", "number"):
                raise FilterSyntaxError(f"expected literal after {tok[1]}, got {vv!r}")
            return Cmp(field, tok[1], vv)
        if tok == ("kw", "CONTAINS"):
            return StrMatch(field, "contains", self._string())
        if tok == ("kw", "STARTS"):
            self._optional_with()
            return StrMatch(field, "starts", self._string())
        if tok == ("kw", "ENDS"):
            self._optional_with()
            return StrMatch(field, "ends", self._string())
        if tok == ("kw", "HAS"):
            mode = "has"
            if self.peek() in (("kw", "ALL"), ("kw", "ANY"), ("kw", "ONLY")):
                mode = self.next()[1].lower()
            values = [self._value()]
            while self.peek() == ("comma", ","):
                self.next()
                values.append(self._value())
            if mode == "has" and len(values) > 1:
                mode = "all"  # `HAS "a","b"` means HAS ALL per OPTIMADE
            return Has(field, mode, tuple(values))
        if tok == ("kw", "LENGTH"):
            nxt = self.peek()
            op = "="
            if nxt is not None and nxt[0] == "op":
                op = self.next()[1]
            num = self.next()
            if num[0] != "number":
                raise FilterSyntaxError(f"LENGTH needs a number, got {num[1]!r}")
            return Length(field, op, int(num[1]))
        if tok == ("kw", "IS"):
            kw = self.expect("kw")[1]
            if kw not in ("KNOWN", "UNKNOWN"):
                raise FilterSyntaxError(f"expected KNOWN/UNKNOWN after IS, got {kw}")
            return Known(field, kw == "KNOWN")
        raise FilterSyntaxError(f"unexpected token {tok[1]!r} after field {field!r}")

    def _optional_with(self):
        if self.peek() == ("kw", "WITH"):
            self.next()

    def _string(self) -> str:
        tok = self.next()
        if tok[0] != "string":
            raise FilterSyntaxError(f"expected quoted string, got {tok[1]!r}")
        return tok[1]

    def _value(self):
        tok = self.next()
        if tok[0] not in ("string", "number"):
            raise FilterSyntaxError(f"expected literal, got {tok[1]!r}")
        return tok[1]


def _flip(op: str) -> str:
    return {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!="}[op]


def parse_filter(text: str) -> Node:
    text = text.strip()
    if not text:
        raise FilterSyntaxError("empty filter")
    return _Parser(_tokenize(text)).parse()


# ---------------------------------------------------------------------------
# compiler: AST -> Column
# ---------------------------------------------------------------------------

def _default_canonicalizers() -> dict[str, Callable]:
    """P12/P13 literal rewrites, keyed by field name."""
    def cfr(v):
        try:
            return hill_formula(v) if isinstance(v, str) else v
        except ValueError:
            return v

    def unicode_norm(v):
        return normalize_unicode_digits(v) if isinstance(v, str) else v

    return {
        "chemical_formula_reduced": cfr,
        "formula_hill": cfr,
        "*": unicode_norm,
    }


def compile_filter(
    node_or_text: Union[str, Node],
    resolve: Optional[Callable[[str], Column]] = None,
    canonicalizers: Optional[dict[str, Callable]] = None,
) -> Column:
    """Compile a filter (string or parsed AST) to a boolean Column.

    ``resolve`` maps field names to Columns (default ``F.col``) — the hook
    for schema mapping / provider-prefixed field promotion (P9/P10 become a
    resolve that returns the canonical column).
    """
    node = parse_filter(node_or_text) if isinstance(node_or_text, str) else node_or_text
    col = resolve or F.col
    canon = {**_default_canonicalizers(), **(canonicalizers or {})}

    def lit(field: str, v):
        fn = canon.get(field, canon.get("*"))
        return F.lit(fn(v) if fn else v)

    def go(n: Node) -> Column:
        if isinstance(n, Cmp):
            c = col(n.field)
            v = lit(n.field, n.value)
            return {
                "=": c == v,
                "!=": c != v,
                "<": c < v,
                "<=": c <= v,
                ">": c > v,
                ">=": c >= v,
            }[n.op]
        if isinstance(n, StrMatch):
            c = col(n.field)
            if n.mode == "contains":
                return c.contains(n.value)
            if n.mode == "starts":
                return c.startswith(n.value)
            return c.endswith(n.value)
        if isinstance(n, Has):
            c = col(n.field)
            vals = F.array(*[lit(n.field, v) for v in n.values])
            if n.mode in ("has", "all"):
                # every listed value present (P4)
                return F.size(F.array_except(vals, c)) == 0
            if n.mode == "any":
                return F.arrays_overlap(c, vals)  # P5
            # only: element set ⊆ listed set (P6)
            return F.size(F.array_except(c, vals)) == 0
        if isinstance(n, Length):
            c = F.size(col(n.field))
            v = F.lit(n.value)
            return {"=": c == v, "!=": c != v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[n.op]
        if isinstance(n, Known):
            c = col(n.field)
            return c.isNotNull() if n.known else c.isNull()
        if isinstance(n, Not):
            return ~go(n.child)
        if isinstance(n, BoolOp):
            out = go(n.children[0])
            for child in n.children[1:]:
                out = (out & go(child)) if n.op == "and" else (out | go(child))
            return out
        raise TypeError(f"unknown node {n!r}")

    return go(node)


def apply_filter(df: DataFrame, filter_text: str, **kwargs) -> DataFrame:
    """Convenience: ``df.where(compile_filter(filter_text))``."""
    return df.where(compile_filter(filter_text, **kwargs))
