"""Lazy rule-table tests (reference: ``/root/reference/tests/test_lazy.py``):
resolution order, id-indexing, frozen-rule protection."""

import pytest

from stheno_tpu import LazyMatrix, LazyVector


class Box:
    pass


def test_lazy_vector():
    v = LazyVector()
    a, b = Box(), Box()
    v[a] = 1
    assert v[a] == 1
    v.add_rule({id(b)}, lambda i: 42)
    assert v[b] == 42
    c = Box()
    with pytest.raises(RuntimeError):
        v[c]


def test_rules_freeze_index_set():
    v = LazyVector()
    a = Box()
    indices = {id(a)}
    v.add_rule(indices, lambda i: "old")
    b = Box()
    indices.add(id(b))  # Mutating the set must NOT extend the rule.
    with pytest.raises(RuntimeError):
        v[b]
    assert v[a] == "old"


def test_lazy_matrix_resolution_order():
    m = LazyMatrix()
    a, b = Box(), Box()
    # Universal rule wins over left/right rules.
    m.add_left_rule(id(a), {id(a), id(b)}, lambda j: "left")
    m.add_rule({id(a)}, lambda i, j: "universal")
    assert m[a, a] == "universal"
    assert m[a, b] == "left"
    # Right rules resolve after left rules.
    m.add_right_rule(id(a), {id(b)}, lambda i: "right")
    assert m[b, a] == "right"
    # Diagonal shorthand.
    assert m[a] == m[a, a]


def test_lazy_matrix_memoization():
    m = LazyMatrix()
    a = Box()
    calls = []
    m.add_rule({id(a)}, lambda i, j: calls.append(1) or object())
    first = m[a, a]
    second = m[a, a]
    assert first is second
    assert len(calls) == 1


def test_explicit_set():
    m = LazyMatrix()
    a, b = Box(), Box()
    m[a, b] = "ab"
    assert m[a, b] == "ab"
    with pytest.raises(RuntimeError):
        m[b, a]
