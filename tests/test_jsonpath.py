from __future__ import annotations

import pytest

from datafusion_server_spark.sources.jsonpath import JsonPathError, extract_rows, find

DOC = {
    "store": {
        "book": [
            {"title": "A", "price": 10},
            {"title": "B", "price": 20},
        ],
        "bicycle": {"color": "red"},
    },
    "expensive": 15,
}


def test_root_star():
    assert find("$.*", [1, 2, 3]) == [1, 2, 3]
    assert len(find("$.*", DOC)) == 2


def test_nested_key_and_index():
    assert find("$.store.book[0].title", DOC) == ["A"]
    assert find("$.store.book[-1].title", DOC) == ["B"]


def test_wildcard_array():
    assert find("$.store.book[*].price", DOC) == [10, 20]


def test_recursive_descent():
    assert sorted(find("$..price", DOC)) == [10, 20]


def test_slice():
    assert find("$[0:2]", [1, 2, 3]) == [1, 2]


def test_quoted_key():
    assert find("$['expensive']", DOC) == [15]


def test_bad_path():
    with pytest.raises(JsonPathError):
        find("store.book", DOC)


def test_extract_rows_objects():
    rows = extract_rows('[{"a": 1}, {"a": 2}]', "$.*")
    assert rows == [{"a": 1}, {"a": 2}]


def test_extract_rows_normalize():
    rows = extract_rows('[[1, "x"], [2, "y"]]', "$.*", normalize=True)
    assert rows == [{"c0": 1, "c1": "x"}, {"c0": 2, "c1": "y"}]


def test_extract_scalar_values():
    rows = extract_rows('{"a": {"v": 1}, "b": {"v": 2}}', "$..v")
    assert rows == [{"value": 1}, {"value": 2}]
