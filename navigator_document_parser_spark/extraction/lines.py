"""Line pipeline: split/trim/drop-empty, bullet merge, validity predicate.

Exact semantic parity with the reference:
  - split_lines:  src/html_parser/readability.py:86-88
    (strip each line, drop empties)
  - combine_bullet_lines_with_next:  src/html_parser/readability.py:121-149
    (same regex set, same skip-next index walk, same trailing-strip)
  - has_valid_text:  src/html_parser/readability.py:90 with the threshold
    from src/config.py:5-7 (default 6)

The newsplease path deliberately does NOT use split_lines: it splits on
'\\n' without strip/drop-empty (src/html_parser/newsplease.py:119) — see
newsplease_like.maintext_lines.
"""

from __future__ import annotations

import re

from ..config import HTML_MIN_NO_LINES_FOR_VALID_TEXT

# Same five list-header patterns as the reference (readability.py:130-136).
# re.match anchors at the start of the line.
LIST_HEADER_REGEXES = [
    re.compile(r"([\divxIVX]+\.)+"),      # dotted number or roman numeral
    re.compile(r"(\([\divxIVX]+\))+"),    # parenthesized number or roman
    re.compile(r"[*•\-\–\+]"),            # bullets
    re.compile(r"([a-zA-Z]+\.)+"),        # dotted abc
    re.compile(r"(\([a-zA-Z]+\))+"),      # parenthesized abc
]


def split_lines(text: str) -> list[str]:
    """Strip every line; drop empties (readability path, M3)."""
    return [line.strip() for line in text.split("\n") if line.strip()]


def combine_bullet_lines_with_next(lines: list[str]) -> list[str]:
    """Merge a list-header line into the following line (M4).

    Matches the reference's in-place walk exactly, including the detail
    that after a merge the index advances by 2 (the swallowed line is
    blanked, then skipped).
    """
    lines = list(lines)
    idx = 0
    while idx < len(lines) - 1:
        if any(rx.match(lines[idx].strip()) for rx in LIST_HEADER_REGEXES):
            lines[idx] = lines[idx].strip() + " " + lines[idx + 1].strip()
            lines[idx + 1] = ""
            idx += 1
        idx += 1
    return [line for line in lines if line]


def has_valid_text(lines: list[str]) -> bool:
    """P5: enough lines to count as real content (readability.py:90)."""
    return len(lines) >= HTML_MIN_NO_LINES_FOR_VALID_TEXT
