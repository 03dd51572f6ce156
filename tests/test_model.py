"""Unit tests for the catalog metadata model (no Spark needed).

Mirrors the reference's in-module Rust tests: transformation compose
(``core/src/model/mappings.rs:137-149``), permission algebra
(``core/src/model/access_control.rs:66-143``), duplicate-mapping check
(``core/src/execute/mod.rs:111-119``).
"""

import pytest

from dataweb_spark.catalog.model import (
    DataSource,
    Entity,
    Information,
    Mapping,
    RelayCatalog,
    SourcePermission,
    Transformation,
    effective_permission,
)


def test_transformation_apply():
    t = Transformation("{v} * 100", "{v} / 100")
    assert t.apply("l_tax") == "(l_tax) * 100"
    assert t.apply_inverse("tax_percent") == "(tax_percent) / 100"


def test_transformation_identity():
    t = Transformation()
    assert t.is_identity
    assert t.apply("x") == "(x)"


def test_transformation_constant():
    # No {v} → constant expression (reference allows literal templates)
    t = Transformation("42", "0")
    assert t.apply("x") == "42"


def test_transformation_compose():
    outer = Transformation("{v} * 100", "{v} / 100")
    inner = Transformation("{v} + 5", "{v} - 5")
    c = outer.compose(inner)
    # forward: first inner, then outer
    assert c.other_to_local == "({v} + 5) * 100"
    assert c.apply("x") == "((x) + 5) * 100"
    # inverse: first undo outer, then undo inner
    assert c.local_to_other == "({v} / 100) - 5"


def test_permission_union_intersection():
    a = SourcePermission(frozenset({"x", "y"}), "x > 1")
    b = SourcePermission(frozenset({"y", "z"}), "z = 'a'")
    u = a.union(b)
    assert u.allowed_columns == {"x", "y", "z"}
    assert u.allowed_rows == "(x > 1) OR (z = 'a')"
    i = a.intersection(b)
    assert i.allowed_columns == {"y"}
    assert i.allowed_rows == "(x > 1) AND (z = 'a')"


def test_effective_permission():
    default = SourcePermission(frozenset({"a"}), "a = 1")
    user = SourcePermission(frozenset({"a", "b"}), "true")
    relay = SourcePermission(frozenset({"b", "c"}), "c = 2")
    eff = effective_permission(default, user, relay)
    # default ∪ (user ∩ relay)
    assert eff.allowed_columns == {"a", "b"}
    assert eff.allowed_rows == "(a = 1) OR ((true) AND (c = 2))"
    # no grants → default only
    assert effective_permission(default, None, None) == default
    # nothing at all → deny
    assert effective_permission(None, None, None).allowed_rows == "false"


def test_duplicate_mapping_rejected():
    cat = RelayCatalog("r")
    cat.add_entity(Entity("e", [Information("i", "bigint")]))
    src = DataSource(
        name="s", connection="c", entity="e", source_sql="select * from {table}",
        mappings=[Mapping("i", "f1"), Mapping("i", "f2")])
    with pytest.raises(ValueError, match="duplicate mapping"):
        cat.add_source(src)


def test_duplicate_entity_rejected():
    cat = RelayCatalog("r")
    cat.add_entity(Entity("e", []))
    with pytest.raises(ValueError, match="duplicate entity"):
        cat.add_entity(Entity("e", []))


# ---------------------------------------------------------------------------
# Invertible conjunct pushdown (mappings.rs:124-149 inverse composition)
# ---------------------------------------------------------------------------

def test_push_conjunct_identity_passthrough():
    t = Transformation()
    assert t.push_conjunct("<", 10) == [("<", 10)]
    assert t.push_conjunct("=", "x") == [("=", "x")]  # any type, untouched


def test_push_conjunct_affine_inversion():
    t = Transformation("{v} * 100", "{v} / 100")
    [(op, v)] = t.push_conjunct("<", 10)
    assert op == "<=" and 0.1 < v <= 0.1 + 2e-9
    [(op2, v2)] = t.push_conjunct(">=", 10)
    assert op2 == ">=" and v2 < 0.1


def test_push_conjunct_affine_with_offset():
    # f(x) = 2*(x + 3)/4 - 1 = x/2 + 0.5 ; f(x) < 5  <=>  x < 9
    t = Transformation("2 * ({v} + 3) / 4 - 1", "")
    [(op, v)] = t.push_conjunct("<", 5)
    assert op == "<=" and 9 < v < 9.001


def test_push_conjunct_negative_slope_flips():
    t = Transformation("100 - {v}", "100 - {v}")
    [(op, v)] = t.push_conjunct("<", 30)   # 100 - x < 30  <=>  x > 70
    assert op == ">=" and 69.9 < v < 70
    [(op2, v2)] = t.push_conjunct(">", 30)  # 100 - x > 30  <=>  x < 70
    assert op2 == "<=" and 70 < v2 < 70.1


def test_push_conjunct_equality_becomes_widened_range():
    t = Transformation("{v} * 100", "{v} / 100")
    [(o1, lo), (o2, hi)] = t.push_conjunct("=", 10)
    assert (o1, o2) == (">=", "<=") and lo < 0.1 < hi


def test_push_conjunct_refuses_non_invertible():
    assert Transformation("abs({v})", "{v}").push_conjunct("<", 1) is None
    assert Transformation("{v} * {v}", "{v}").push_conjunct("<", 1) is None
    assert Transformation("1 / {v}", "{v}").push_conjunct("<", 1) is None
    assert Transformation("{v} * 0", "{v}").push_conjunct("<", 1) is None
    assert Transformation("cast({v} as int)", "{v}").push_conjunct("<", 1) is None


def test_push_conjunct_refuses_non_numeric_values():
    t = Transformation("{v} * 100", "{v} / 100")
    assert t.push_conjunct("=", "text") is None
    assert t.push_conjunct("=", True) is None


def test_affine_order_safe_literal_syntax_gate():
    """``affine_order_safe`` types constants with SPARK's literal rules:
    scientific notation is a DOUBLE literal, but non-decimal syntax
    Python accepts and Spark SQL does not (hex, underscores) is refused
    up front rather than misclassified (advice-caught r15 — the bare
    "'e' in text" test also matched hex literals like 0xE2)."""
    from dataweb_spark.catalog.model import affine_order_safe
    assert affine_order_safe("{v} * 1e2", "double")
    assert affine_order_safe("{v} * 1e2", "int")   # double result: wrap-free
    assert affine_order_safe("{v} * -1.0", "double")
    assert not affine_order_safe("{v} * 0xE2", "int")
    assert not affine_order_safe("{v} * 1_00", "int")
