"""Translation-stage unit tests (truth tables copied from the reference's
src/translator/test/test_translate.py:97-121 and
cli/test/test_run_parser.py gating tests — semantics, not code)."""

import pytest

from navigator_document_parser_spark.extraction.translate import (
    identify_translation_languages,
    should_be_translated,
    should_translate_text,
    stub_translate,
    translate_texts,
)


@pytest.mark.parametrize(
    "text, expected",
    [
        ("-", False),
        ("6", False),
        (".", False),
        ("12.1123", False),
        ("$", False),
        ("!!!", False),
        ("123456", False),
        ("3.14159", False),
        ("hello", True),
        ("world!", True),
        ("hello world", True),
        ("text", True),
        ("bonjour", True),
        ("hello, world!", True),
        ("hello, world! 123", True),
        ("12312!", False),
        ("(12)", False),
    ],
)
def test_should_translate_text(text, expected):
    assert should_translate_text(text) == expected


def test_should_be_translated_gate():
    assert should_be_translated(False, "https://x.example")
    assert not should_be_translated(True, "https://x.example")
    assert not should_be_translated(False, None)


def test_identify_translation_languages():
    # exactly one detected language -> subtract it
    assert identify_translation_languages(["fr"], {"en"}) == {"en"}
    assert identify_translation_languages(["en"], {"en"}) == set()
    # zero or multiple detected -> all targets
    assert identify_translation_languages(None, {"en"}) == {"en"}
    assert identify_translation_languages([], {"en"}) == {"en"}
    assert identify_translation_languages(["en", "fr"], {"en"}) == {"en"}


def test_translate_texts_skips_untranslatable():
    out = translate_texts(["hello", "123", "world"], "fr")
    assert out == ["translated to fr: hello", "123", "translated to fr: world"]


def test_stub_translator_matches_reference_mock_format():
    assert stub_translate(["abc"], "fr") == ["translated to fr: abc"]
