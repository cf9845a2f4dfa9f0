"""muparser-grammar expression parser for VRT expression bands.

GDAL evaluates `<PixelFunctionType>expression</PixelFunctionType>` /
`gdal raster calc` formulas with muparser
(frmts/vrt/vrtexpression_muparser.cpp): C-like syntax with `&&`, `||`,
`!`, ternary `?:` and `^` as power.  This module is a hand-written
tokenizer + recursive-descent parser for that grammar producing a
closure tree over numpy arrays — a real parser with no code-exec
surface (the python-syntax path in pixelfuncs.px_expression stays for
numpy-style strings; this one accepts the reference's own syntax).

Operator precedence follows muparser's table (muParserBase.cpp
prio defaults): `||` < `&&` < comparisons < `+ -` < `* / %` <
unary < `^` (right-assoc).  Logical ops are vectorized
(np.logical_and/or, not short-circuit) and the ternary is np.where —
exactly how gdalalg_raster_calc.cpp:730 rewrites per-pixel formulas to
whole-array ops.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/%^<>!?:(),]))"
)

_FUNCS = {
    "sqrt": np.sqrt, "abs": np.abs, "exp": np.exp, "log": np.log,
    "ln": np.log, "log10": np.log10, "log2": np.log2,
    "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
    "atan2": np.arctan2, "sinh": np.sinh, "cosh": np.cosh,
    "tanh": np.tanh, "floor": np.floor, "ceil": np.ceil,
    "rint": np.rint, "round": np.round, "sign": np.sign,
    "min": np.minimum, "max": np.maximum, "pow": np.power,
    "sum": lambda *a: np.sum(a, axis=0), "avg": lambda *a: np.mean(a, axis=0),
}


class MuParseError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise MuParseError(f"bad token at {s[pos:]!r}")
            break
        out.append(m.group(m.lastgroup))
        pos = m.end()
    return out


class _Parser:
    """Recursive descent over the muparser precedence ladder."""

    def __init__(self, tokens: list[str]):
        self.t = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise MuParseError("unexpected end of expression")
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise MuParseError(f"expected {tok!r}, got {got!r}")

    # ternary (lowest) -> or -> and -> cmp -> add -> mul -> unary -> pow
    def parse(self):
        node = self.ternary()
        if self.peek() is not None:
            raise MuParseError(f"trailing tokens at {self.t[self.i:]!r}")
        return node

    def ternary(self):
        cond = self.or_()
        if self.peek() == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return lambda env, c=cond, x=a, y=b: np.where(
                _truth(c(env)), x(env), y(env)
            )
        return cond

    def or_(self):
        node = self.and_()
        while self.peek() == "||":
            self.next()
            rhs = self.and_()
            node = (lambda l, r: lambda env: np.logical_or(
                _truth(l(env)), _truth(r(env))).astype(np.float64))(node, rhs)
        return node

    def and_(self):
        node = self.cmp()
        while self.peek() == "&&":
            self.next()
            rhs = self.cmp()
            node = (lambda l, r: lambda env: np.logical_and(
                _truth(l(env)), _truth(r(env))).astype(np.float64))(node, rhs)
        return node

    _CMP = {
        "<": np.less, "<=": np.less_equal, ">": np.greater,
        ">=": np.greater_equal, "==": np.equal, "!=": np.not_equal,
    }

    def cmp(self):
        node = self.add()
        while self.peek() in self._CMP:
            fn = self._CMP[self.next()]
            rhs = self.add()
            node = (lambda l, r, f: lambda env: f(
                l(env), r(env)).astype(np.float64))(node, rhs, fn)
        return node

    def add(self):
        node = self.mul()
        while self.peek() in ("+", "-"):
            op = self.next()
            rhs = self.mul()
            fn = np.add if op == "+" else np.subtract
            node = (lambda l, r, f: lambda env: f(l(env), r(env)))(node, rhs, fn)
        return node

    def mul(self):
        node = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.next()
            rhs = self.unary()
            fn = {"*": np.multiply, "/": np.divide, "%": np.fmod}[op]
            node = (lambda l, r, f: lambda env: f(l(env), r(env)))(node, rhs, fn)
        return node

    def unary(self):
        tok = self.peek()
        if tok == "-":
            self.next()
            sub = self.unary()
            return lambda env, s=sub: np.negative(s(env))
        if tok == "+":
            self.next()
            return self.unary()
        if tok == "!":
            self.next()
            sub = self.unary()
            return lambda env, s=sub: np.logical_not(
                _truth(s(env))).astype(np.float64)
        return self.power()

    def power(self):
        base = self.atom()
        if self.peek() == "^":  # right-associative, binds above unary minus base
            self.next()
            exp = self.unary()  # allow 2^-1
            return lambda env, b=base, e=exp: np.power(b(env), e(env))
        return base

    def atom(self):
        tok = self.next()
        if tok == "(":
            node = self.ternary()
            self.expect(")")
            return node
        if re.fullmatch(r"(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", tok):
            v = float(tok)
            return lambda env, _v=v: _v
        if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", tok):
            if self.peek() == "(":
                if tok not in _FUNCS:
                    raise MuParseError(f"unknown function {tok!r}")
                self.next()
                args = [self.ternary()]
                while self.peek() == ",":
                    self.next()
                    args.append(self.ternary())
                self.expect(")")
                fn = _FUNCS[tok]
                return lambda env, f=fn, a=tuple(args): f(*(x(env) for x in a))
            name = tok
            return lambda env, n=name: _lookup(env, n)
        raise MuParseError(f"unexpected token {tok!r}")


def _truth(v):
    return np.asarray(v) != 0


def _lookup(env: dict, name: str):
    try:
        return env[name]
    except KeyError:
        raise MuParseError(f"unknown variable {name!r}") from None


def compile_expr(expr: str):
    """Parse once, return ``fn(env: dict[str, ndarray]) -> ndarray``."""
    return _Parser(_tokenize(expr)).parse()


def evaluate(expr: str, env: dict) -> np.ndarray:
    return compile_expr(expr)(env)
