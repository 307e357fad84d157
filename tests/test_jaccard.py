"""Char-set Jaccard must replicate commons-text JaccardSimilarity
(reference model/SoftwareArchitectureDocumentation.java:145-168)."""

import pandas as pd
import pytest

from named_architecture_entity_recognition_spark.functions.jaccard import (
    best_line_number,
    char_jaccard,
    char_jaccard_series,
)


def test_both_empty_is_one():
    assert char_jaccard("", "") == 1.0


def test_one_empty_is_zero():
    assert char_jaccard("a", "") == 0.0
    assert char_jaccard("", "a") == 0.0


def test_identical_strings():
    assert char_jaccard("hello", "hello") == 1.0


def test_unique_char_sets():
    # commons-text: {a,b,c} vs {a,b,d} -> 2/4
    assert char_jaccard("abcabc", "abd") == pytest.approx(0.5)


def test_permutation_is_one():
    # char SETS: anagrams / reorderings score 1.0
    assert char_jaccard("fsesl", "fsels") == 1.0


def test_series_matches_scalar():
    a = pd.Series(["abc", "", "same", "xy"])
    b = pd.Series(["abd", "", "same", "ab"])
    out = char_jaccard_series(a, b)
    exp = [char_jaccard(x, y) for x, y in zip(a, b)]
    assert list(out) == pytest.approx(exp)


def test_best_line_first_max_wins():
    # two lines with identical char sets: strict '>' keeps the first
    lines = ["abc.", "cba.", "zzz."]
    assert best_line_number(lines, "abc.") == 1


def test_best_line_threshold():
    lines = ["The WebUI provides the front-end."]
    assert best_line_number(lines, "The WebUI provides the front-end.") == 1
    assert best_line_number(lines, "totally unrelated 12345") == -1


def test_case_insensitive():
    lines = ["ABC."]
    assert best_line_number(lines, "abc.") == 1
