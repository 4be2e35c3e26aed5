"""Line-pipeline unit tests.

Bullet-merge truth table mirrors the reference's
src/html_parser/test/test_readability_parser.py:8-40 (semantics copied,
not code).
"""

import pytest

from navigator_document_parser_spark.extraction.lines import (
    combine_bullet_lines_with_next,
    has_valid_text,
    split_lines,
)


@pytest.mark.parametrize(
    "list_headers",
    [
        ("1.", "2."),
        ("(iv)", "(v)"),
        ("IX.", "X."),
        ("a.", "b."),
        ("(c)", "(d)"),
        ("i.", "ii."),
        ("•", "•"),
        ("-", "-"),
        ("–", "–"),
        ("*", "*"),
    ],
)
def test_combining_bullets(list_headers):
    text_by_line = [
        list_headers[0],
        "This is a bullet point",
        list_headers[1],
        "This is another bullet point",
        "This is a normal line",
    ]
    assert combine_bullet_lines_with_next(text_by_line) == [
        f"{list_headers[0]} This is a bullet point",
        f"{list_headers[1]} This is another bullet point",
        "This is a normal line",
    ]


def test_bullet_merge_also_merges_worddot_lines():
    # reference regex ([a-zA-Z]+\.)+ matches any word-dot prefix — this is
    # reference behavior, preserved deliberately (readability.py:134)
    assert combine_bullet_lines_with_next(["No.", "next"]) == ["No. next"]


def test_bullet_merge_last_line_never_merges():
    assert combine_bullet_lines_with_next(["text", "1."]) == ["text", "1."]


def test_split_lines_strips_and_drops_empties():
    assert split_lines("  a \n\n  \n b\n") == ["a", "b"]


def test_has_valid_text_threshold_six():
    assert not has_valid_text(["l"] * 5)
    assert has_valid_text(["l"] * 6)
