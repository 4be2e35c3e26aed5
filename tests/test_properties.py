"""Property-based tests (hypothesis) for the extraction core invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from navigator_document_parser_spark.extraction.lines import (
    combine_bullet_lines_with_next,
    split_lines,
)
from navigator_document_parser_spark.extraction.pdf_blocks import (
    extract_pdf,
    synthesize_pdf,
    vertically_flip_block_coords,
)
from navigator_document_parser_spark.extraction import policy

printable_line = st.text(
    alphabet=string.ascii_letters + string.digits + " .,()-",
    min_size=0,
    max_size=40,
)


@given(st.lists(printable_line, max_size=20))
@settings(max_examples=100, deadline=None)
def test_split_lines_never_yields_blank_or_padded(lines):
    out = split_lines("\n".join(lines))
    assert all(line == line.strip() and line for line in out)


@given(st.lists(printable_line.map(str.strip).filter(bool), max_size=15))
@settings(max_examples=100, deadline=None)
def test_bullet_merge_preserves_content_words(lines):
    merged = combine_bullet_lines_with_next(list(lines))
    # merging only concatenates: the multiset of whitespace-split tokens
    # is preserved exactly
    orig_tokens = [t for line in lines for t in line.split()]
    new_tokens = [t for line in merged for t in line.split()]
    assert orig_tokens == new_tokens
    assert len(merged) <= len(lines)


pdf_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,()-\\",
    min_size=1,
    max_size=30,
).map(str.strip).filter(bool)


@given(
    st.lists(  # pages
        st.lists(  # shows per page: (y descending-ish, text)
            st.tuples(
                st.floats(min_value=50, max_value=740),
                pdf_text,
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_spans_and_order(pages_spec):
    pages = [
        [(72.0, y, 12.0, t) for (y, t) in page] for page in pages_spec
    ]
    data = synthesize_pdf(pages)
    ext = extract_pdf(data)
    # spans always index content exactly
    for b in ext.blocks:
        assert ext.content[b.offset : b.offset + b.length] == b.text
    # page numbers ascending
    assert [b.page for b in ext.blocks] == sorted(b.page for b in ext.blocks)
    # flip is an involution
    once = vertically_flip_block_coords(ext.blocks, ext.pages)
    twice = vertically_flip_block_coords(once, ext.pages)
    for a, c in zip(ext.blocks, twice):
        assert abs(a.y0 - c.y0) < 1e-9 and abs(a.y1 - c.y1) < 1e-9


@given(st.text(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_extract_html_total_on_arbitrary_input(s):
    # never raises; always returns the canonical result shape
    r = policy.extract_html(s)
    assert r.parser in ("newsplease", "readability", "empty")
    assert isinstance(r.text, str)
    for i, b in enumerate(r.text_blocks):
        assert b.text_block_id == f"b{i}"
