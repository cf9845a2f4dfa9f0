"""muparser-grammar parser (frmts/vrt/vrtexpression_muparser.cpp syntax)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import muparser as M
from gdal_spark.raster import pixelfuncs as PF


def ev(expr, **env):
    return M.evaluate(expr, env)


class TestGrammar:
    def test_arithmetic_precedence(self):
        assert ev("1 + 2 * 3") == 7
        assert ev("(1 + 2) * 3") == 9
        assert ev("7 % 4 + 1") == 4
        assert ev("10 / 4") == 2.5

    def test_power_right_assoc_and_unary(self):
        assert ev("2^3^2") == 512  # right-associative
        assert ev("-2^2") == -4  # power binds tighter than unary minus
        assert ev("2^-1") == 0.5

    def test_comparisons_and_logic(self):
        a = np.array([1.0, 5.0, 10.0])
        out = ev("x > 2 && x < 8", x=a)
        np.testing.assert_array_equal(out, [0.0, 1.0, 0.0])
        out = ev("x <= 1 || x >= 10", x=a)
        np.testing.assert_array_equal(out, [1.0, 0.0, 1.0])
        np.testing.assert_array_equal(ev("!(x == 5)", x=a), [1.0, 0.0, 1.0])

    def test_ternary_nested(self):
        x = np.array([-5.0, 0.5, 5.0])
        out = ev("x < 0 ? 0 - 1 : (x < 1 ? 0 : 1)", x=x)
        np.testing.assert_array_equal(out, [-1.0, 0.0, 1.0])

    def test_functions(self):
        np.testing.assert_allclose(ev("sqrt(x)", x=np.array([4.0, 9.0])), [2, 3])
        np.testing.assert_allclose(ev("max(x, 2)", x=np.array([1.0, 3.0])), [2, 3])
        np.testing.assert_allclose(ev("atan2(1, 1)"), np.pi / 4)
        np.testing.assert_allclose(
            ev("avg(a, b, c)", a=1.0, b=2.0, c=6.0), 3.0
        )

    def test_errors(self):
        with pytest.raises(M.MuParseError):
            ev("x +", x=1.0)
        with pytest.raises(M.MuParseError):
            ev("foo(1)")
        with pytest.raises(M.MuParseError):
            ev("y", x=1.0)
        with pytest.raises(M.MuParseError):
            ev("1 ? 2", x=1.0)

    def test_no_code_exec_surface(self):
        # names are plain env lookups; attribute/subscript syntax does
        # not exist in the grammar at all
        with pytest.raises(M.MuParseError):
            ev("().__class__")
        with pytest.raises(M.MuParseError):
            ev("x[0]", x=np.array([1.0]))


class TestPxExpressionRouting:
    def test_muparser_tokens_route_to_grammar(self):
        b1 = np.array([[10.0, 200.0]])
        b2 = np.array([[1.0, 2.0]])
        out = PF.px_expression([b1, b2], expr="B1 > 100 ? B2 : 0")
        np.testing.assert_array_equal(out, [[0.0, 2.0]])
        out = PF.px_expression([b1], expr="B1 > 5 && B1 < 100")
        np.testing.assert_array_equal(out, [[1.0, 0.0]])
        out = PF.px_expression([b1], expr="B1^2")
        np.testing.assert_array_equal(out, [[100.0, 40000.0]])

    def test_python_syntax_still_works(self):
        b1 = np.array([[4.0]])
        np.testing.assert_array_equal(
            PF.px_expression([b1], expr="sqrt(B1) + 1"), [[3.0]]
        )
