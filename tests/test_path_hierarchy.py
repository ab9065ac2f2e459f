"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer vectors from
the reference test suite (analysis/path/TestPathHierarchyTokenizer.java,
TestReversePathHierarchyTokenizer.java) + chain integration."""

import pandas as pd
import pytest

from lucene_spark.analysis import (
    analyze_batch,
    path_hierarchy_tokens,
    tokenize,
)


FORWARD_VECTORS = [
    # (text, delimiter, replacement, skip, expected)
    ("/a/b/c", "/", None, 0, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", "/", None, 0, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", "/", None, 0, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", "/", None, 0, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", "/", None, 0, ["/"]),
    ("//", "/", None, 0, ["/", "//"]),
    ("/a/b/c", "/", "\\", 0, ["\\a", "\\a\\b", "\\a\\b\\c"]),
    ("c:\\a\\b\\c", "\\", None, 0, ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    ("/a/b/c", "/", None, 1, ["/b", "/b/c"]),
    ("/a/b/c/", "/", None, 1, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", "/", None, 1, ["/b", "/b/c"]),
    ("a/b/c", "/", None, 3, []),
    ("", "/", None, 0, []),
]

REVERSE_VECTORS = [
    ("/a/b/c", "/", None, 0, ["/a/b/c", "a/b/c", "b/c", "c"]),
    ("/a/b/c/", "/", None, 0, ["/a/b/c/", "a/b/c/", "b/c/", "c/"]),
    ("/a/b/c/", "/", None, 1, ["/a/b/", "a/b/", "b/"]),
    ("", "/", None, 0, []),
]


@pytest.mark.parametrize("text,delim,repl,skip,want", FORWARD_VECTORS)
def test_forward(text, delim, repl, skip, want):
    assert path_hierarchy_tokens(text, delim, repl, skip) == want


@pytest.mark.parametrize("text,delim,repl,skip,want", REVERSE_VECTORS)
def test_reverse(text, delim, repl, skip, want):
    assert path_hierarchy_tokens(text, delim, repl, skip, reverse=True) == want


def test_negative_skip_rejected():
    with pytest.raises(ValueError):
        path_hierarchy_tokens("/a", skip=-1)


def test_tokenize_integration():
    terms, positions = tokenize(
        "src/main/App.java", analyzer={"tokenizer": "path_hierarchy"}
    )
    assert terms == ["src", "src/main", "src/main/App.java"]
    # all tokens overlap at one position
    assert positions == [0, 0, 0]
    # case preserved (the reference tokenizer does not lowercase)
    assert "src/main/App.java" in terms


def test_tokenize_reverse_integration():
    terms, _ = tokenize(
        "src/main/App.java",
        analyzer={"tokenizer": "path_hierarchy_reverse"},
    )
    assert terms == ["src/main/App.java", "main/App.java", "App.java"]


def test_analyze_batch_path():
    df = analyze_batch(
        pd.Series(["/a/b", "", None, "x"]),
        analyzer={"tokenizer": "path_hierarchy"},
    )
    assert list(df["terms"]) == [["/a", "/a/b"], [], [], ["x"]]
    assert list(df["dl"]) == [1, 0, 0, 1]
    assert list(df["positions"]) == [[0, 0], [], [], [0]]


def test_rejects_other_chain_pieces():
    with pytest.raises(ValueError):
        tokenize("/a/b", analyzer={"tokenizer": "path_hierarchy",
                                   "ascii_fold": True})


def test_offsets_rejected():
    with pytest.raises(ValueError):
        analyze_batch(
            pd.Series(["/a/b"]),
            analyzer={"tokenizer": "path_hierarchy"},
            want_offsets=True,
        )
