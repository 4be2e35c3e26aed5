"""Deterministic language-ID tests (M8)."""

from navigator_document_parser_spark.extraction.langid import detect, detect_document

SAMPLES = {
    "en": "The framework is the most significant measure that they have "
          "introduced, and it will be reviewed by the department.",
    "fr": "Le cadre est la mesure la plus importante que le gouvernement a "
          "introduite, et elle sera examinée par les services de l'État.",
    "de": "Der Rahmen ist die wichtigste Maßnahme, die die Regierung "
          "eingeführt hat, und er wird von der Behörde überprüft.",
    "es": "El marco es la medida más importante que el gobierno ha "
          "introducido, y será revisada por el departamento.",
}


def test_detect_basic_languages():
    for lang, text in SAMPLES.items():
        assert detect(text) == lang, (lang, detect(text))


def test_detect_is_deterministic():
    text = SAMPLES["fr"]
    assert all(detect(text) == "fr" for _ in range(20))


def test_detect_empty_and_nontext():
    assert detect("") is None
    assert detect("12345 !!! ...") is None


def test_detect_document_majority_order():
    blocks = [SAMPLES["en"], SAMPLES["en"], SAMPLES["fr"]]
    per_block, doc_langs = detect_document(blocks)
    assert per_block == ["en", "en", "fr"]
    assert doc_langs == ["en", "fr"]
