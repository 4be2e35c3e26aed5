"""Edge-shape extraction behavior: empty bodies, long-paragraph
fallbacks, heavy-tail documents (ids located by the synth generator's own
deterministic selectors)."""

from navigator_document_parser_spark.extraction import policy
from navigator_document_parser_spark.sources.synth import _rng, make_html

EMPTY_IDS = [55, 68, 73, 85]
LONG_IDS = [16, 38, 92, 111]   # id 10 is a pdf-route id? no: 10%5==0 html
HEAVY_IDS = [137, 153, 188]


def test_selector_integrity():
    for i in EMPTY_IDS:
        assert _rng(i, 0) % 16 == 7 and i % 5 != 4
    for i in LONG_IDS:
        assert _rng(i, 0) % 16 == 3 and i % 5 != 4
    for i in HEAVY_IDS:
        assert _rng(i, 0) % 64 == 11 and i % 5 != 4


def test_empty_body_yields_empty_response_shape():
    for i in EMPTY_IDS:
        r = policy.extract_html(make_html(i).decode("utf-8"))
        # body has only nav/footer boilerplate; newsplease finds no
        # paragraphs -> readability fallback over link-only content
        assert r.parser in (policy.PARSER_EMPTY, policy.PARSER_READABILITY)
        assert r.has_valid_text is False
        assert len(r.text_blocks) <= 2  # at most stray nav text


def test_long_paragraph_triggers_readability_fallback():
    for i in LONG_IDS:
        r = policy.extract_html(make_html(i).decode("utf-8"))
        assert r.parser == policy.PARSER_READABILITY, i
        # fallback still extracts the article content
        assert r.has_valid_text is True


def test_heavy_tail_documents_extract_completely():
    for i in HEAVY_IDS:
        html = make_html(i)
        assert len(html) > 100_000  # genuinely heavy
        r = policy.extract_html(html.decode("utf-8"))
        assert len(r.text_blocks) > 200
        assert r.has_valid_text is True


def test_heavy_and_empty_are_deterministic():
    for i in EMPTY_IDS[:2] + HEAVY_IDS[:1]:
        a = policy.extract_html(make_html(i).decode("utf-8")).text
        b = policy.extract_html(make_html(i).decode("utf-8")).text
        assert a == b
