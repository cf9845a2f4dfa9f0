"""Hilbert-curve encoding as a dual-backend assignment program (Spark
withColumns chain + DuckDB lateral-alias SELECT), plus a plain-Python
twin for tests.

Reference semantics: GDALHilbertCode (alg/hilbert.cpp:20) — the
branch-free 16-bit-per-axis Hilbert index from the public-domain
hilbert_curves code (github.com/rawrunprotected/hilbert_curves), with
coordinates scaled to [0, 65534] over a domain envelope
(alg/hilbert.cpp:80: round(MAX * (v - min) / extent)); used by
`gdal vector sort` (apps/gdalalg_vector_sort.cpp:371).

The algorithm is expressed as ~30 NAMED assignments, each a small bit
expression over earlier names. Naming the intermediates matters: inlining
them (one giant expression) grows both the SQL text and the Catalyst tree
exponentially — measured as a planner hang. As named columns, Spark
evaluates a linear chain of projections (collapsed by Catalyst) and
DuckDB a single SELECT with lateral column aliases. All values are
non-negative and < 2^32, so int64 arithmetic needs no masking.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HILBERT_MAX = (1 << 16) - 2  # 65534; alg/hilbert.cpp:17 reserves the top value


class V:
    """One value of the program, as (lazy Spark Column, SQL string)."""

    __slots__ = ("_colf", "sql")

    def __init__(self, colf, sql: str):
        self._colf = colf if callable(colf) else (lambda c=colf: c)
        self.sql = sql

    @property
    def col(self) -> Column:
        return self._colf()

    @staticmethod
    def lit(n: int) -> "V":
        return V(lambda: F.lit(n).cast("long"), str(n))

    @staticmethod
    def ref(name: str) -> "V":
        return V(lambda: F.col(name), name)

    def __and__(self, o: "V") -> "V":
        return V(lambda: self.col.bitwiseAND(o.col), f"({self.sql} & {o.sql})")

    def __or__(self, o: "V") -> "V":
        return V(lambda: self.col.bitwiseOR(o.col), f"({self.sql} | {o.sql})")

    def __xor__(self, o: "V") -> "V":
        return V(lambda: self.col.bitwiseXOR(o.col), f"xor({self.sql}, {o.sql})")

    def shr(self, n: int) -> "V":
        return V(lambda: F.shiftright(self.col, n), f"({self.sql} >> {n})")

    def shl(self, n: int) -> "V":
        return V(lambda: F.shiftleft(self.col, n), f"({self.sql} << {n})")


def _interleave_steps(src: str, pre: str) -> list[tuple[str, Callable]]:
    """Spread the 16 bits of `src` over even positions, 4 named steps."""
    return [
        (f"{pre}1", lambda e, s=src: (e[s] | e[s].shl(8)) & V.lit(0x00FF00FF)),
        (f"{pre}2", lambda e, p=f"{pre}1": (e[p] | e[p].shl(4)) & V.lit(0x0F0F0F0F)),
        (f"{pre}3", lambda e, p=f"{pre}2": (e[p] | e[p].shl(2)) & V.lit(0x33333333)),
        (f"{pre}4", lambda e, p=f"{pre}3": (e[p] | e[p].shl(1)) & V.lit(0x55555555)),
    ]


# The program: (output name, builder over the environment of prior names).
# Direct restatement of alg/hilbert.cpp:20-78 with SSA names.
_PROGRAM: list[tuple[str, Callable]] = [
    ("ha0", lambda e: e["hx"] ^ e["hy"]),
    ("hb0", lambda e: V.lit(0xFFFF) ^ e["ha0"]),
    ("hc0", lambda e: V.lit(0xFFFF) ^ (e["hx"] | e["hy"])),
    ("hd0", lambda e: e["hx"] & (e["hy"] ^ V.lit(0xFFFF))),
    ("ha1", lambda e: e["ha0"] | e["hb0"].shr(1)),
    ("hb1", lambda e: e["ha0"].shr(1) ^ e["ha0"]),
    ("hc1", lambda e: (e["hc0"].shr(1) ^ (e["hb0"] & e["hd0"].shr(1))) ^ e["hc0"]),
    ("hd1", lambda e: ((e["ha0"] & e["hc0"].shr(1)) ^ e["hd0"].shr(1)) ^ e["hd0"]),
    ("ha2", lambda e: (e["ha1"] & e["ha1"].shr(2)) ^ (e["hb1"] & e["hb1"].shr(2))),
    ("hb2", lambda e: (e["ha1"] & e["hb1"].shr(2))
        ^ (e["hb1"] & (e["ha1"] ^ e["hb1"]).shr(2))),
    ("hc2", lambda e: e["hc1"]
        ^ ((e["ha1"] & e["hc1"].shr(2)) ^ (e["hb1"] & e["hd1"].shr(2)))),
    ("hd2", lambda e: e["hd1"]
        ^ ((e["hb1"] & e["hc1"].shr(2)) ^ ((e["ha1"] ^ e["hb1"]) & e["hd1"].shr(2)))),
    ("ha3", lambda e: (e["ha2"] & e["ha2"].shr(4)) ^ (e["hb2"] & e["hb2"].shr(4))),
    ("hb3", lambda e: (e["ha2"] & e["hb2"].shr(4))
        ^ (e["hb2"] & (e["ha2"] ^ e["hb2"]).shr(4))),
    ("hc3", lambda e: e["hc2"]
        ^ ((e["ha2"] & e["hc2"].shr(4)) ^ (e["hb2"] & e["hd2"].shr(4)))),
    ("hd3", lambda e: e["hd2"]
        ^ ((e["hb2"] & e["hc2"].shr(4)) ^ ((e["ha2"] ^ e["hb2"]) & e["hd2"].shr(4)))),
    ("hc4", lambda e: e["hc3"]
        ^ ((e["ha3"] & e["hc3"].shr(8)) ^ (e["hb3"] & e["hd3"].shr(8)))),
    ("hd4", lambda e: e["hd3"]
        ^ ((e["hb3"] & e["hc3"].shr(8)) ^ ((e["ha3"] ^ e["hb3"]) & e["hd3"].shr(8)))),
    ("haf", lambda e: e["hc4"] ^ e["hc4"].shr(1)),
    ("hbf", lambda e: e["hd4"] ^ e["hd4"].shr(1)),
    ("hi1", lambda e: e["hbf"] | (V.lit(0xFFFF) ^ (e["ha0"] | e["haf"]))),
    *_interleave_steps("ha0", "hp"),   # interleave(i0), i0 == x ^ y == ha0
    *_interleave_steps("hi1", "hq"),   # interleave(i1)
    ("hcode", lambda e: e["hq4"].shl(1) | e["hp4"]),
]

_TEMPS = [name for name, _ in _PROGRAM if name != "hcode"]


def with_hilbert_code(
    df: DataFrame, x_col: str, y_col: str, out: str = "hcode"
) -> DataFrame:
    """Append `out` = Hilbert code of integer columns (x_col, y_col) in
    [0, 65535]; intermediate columns are dropped."""
    df = df.withColumn("hx", F.col(x_col).cast("long")).withColumn(
        "hy", F.col(y_col).cast("long")
    )
    env = {"hx": V.ref("hx"), "hy": V.ref("hy")}
    for name, build in _PROGRAM:
        df = df.withColumn(name, build(env).col)
        env[name] = V.ref(name)
    return df.withColumnRenamed("hcode", out).drop("hx", "hy", *_TEMPS)


def hilbert_select_sql(x_sql: str, y_sql: str) -> str:
    """SELECT-list fragment computing `hcode` via DuckDB lateral column
    aliases: '{x} AS hx, {y} AS hy, ... AS hcode'."""
    parts = [f"{x_sql} AS hx", f"{y_sql} AS hy"]
    env = {"hx": V.ref("hx"), "hy": V.ref("hy")}
    for name, build in _PROGRAM:
        parts.append(f"{build(env).sql} AS {name}")
        env[name] = V.ref(name)
    return ", ".join(parts)


def hilbert_code_py(x: int, y: int) -> int:
    """Plain-Python twin (uint32 semantics) for unit tests."""

    def interleave(i: int) -> int:
        i = (i | (i << 8)) & 0x00FF00FF
        i = (i | (i << 4)) & 0x0F0F0F0F
        i = (i | (i << 2)) & 0x33333333
        i = (i | (i << 1)) & 0x55555555
        return i

    a = x ^ y
    b = 0xFFFF ^ a
    c = 0xFFFF ^ (x | y)
    d = x & (y ^ 0xFFFF)

    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = C ^ (C >> 1)
    b = D ^ (D >> 1)

    i0 = x ^ y
    i1 = b | (0xFFFF ^ (i0 | a))

    return (interleave(i1) << 1) | interleave(i0)
