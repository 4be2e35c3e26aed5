"""Deterministic language identification (M8 replacement).

The reference calls cpr_sdk's detect_and_set_languages(), backed by
langdetect 1.0.9 (call site cli/parse_htmls.py:85). langdetect is
nondeterministic unless seeded; golden-test determinism requires a fully
deterministic detector, so this is a from-scratch stopword + diacritic
scorer over a fixed profile table — same input always yields the same
answer, with no RNG at all.

Supported profiles: en fr de es it pt nl. Unknown/empty text -> None.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[a-zà-öø-ÿœß]+", re.I)

# Highly frequent function words per language (distinctive sets; overlaps
# like 'de' (fr/es/pt/nl) are fine — scoring is cumulative).
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is that it for on with as are was be this at by from "
        "or an have not but they which you all will can has there their".split()
    ),
    "fr": frozenset(
        "le la les de des du et est une un dans que qui pour sur avec au aux "
        "ce cette par plus ne pas se sont été leur nous vous elle ils".split()
    ),
    "de": frozenset(
        "der die das und ist ein eine nicht mit von den dem des im für auf "
        "als auch sich wird sind oder aber bei nach aus durch wenn über".split()
    ),
    "es": frozenset(
        "el la los las de y es una un en que no con por para se su del al "
        "como más pero sus le ha este esta son entre cuando muy sin sobre".split()
    ),
    "it": frozenset(
        "il la le di e che è una un in non per con del della dei si da al "
        "come più anche sono questo questa gli nel alla".split()
    ),
    "pt": frozenset(
        "o a os as de e que é uma um em não com por para se do da dos das "
        "no na como mais mas foi ao sua seu são pelo pela".split()
    ),
    "nl": frozenset(
        "de het een en van is dat in op met voor niet zijn aan er ook als "
        "bij maar om dan nog naar door over bij uit onder tussen".split()
    ),
}

# per-character hints, counted with C-speed str.count (replaces 8 regex
# scans per block — lang-ID was 51% of end-to-end extraction time)
_DIACRITIC_CHARS: list[tuple[str, str, float]] = [
    ("ß", "de", 2.0),
    *[(c, "de", 0.5) for c in "äöü"],
    ("ñ", "es", 2.0),
    *[(c, "es", 2.0) for c in "¿¡"],
    *[(c, "fr", 0.5) for c in "àâêîôûëïœç"],
    *[(c, "pt", 2.0) for c in "ãõ"],
    ("ĳ", "nl", 2.0),
]

LANGS = tuple(sorted(_STOPWORDS))

# merged stopword index: one dict lookup per word instead of one
# set-membership probe per language
_WORD_LANGS: dict[str, tuple[str, ...]] = {}
for _lang, _sw in _STOPWORDS.items():
    for _w in _sw:
        _WORD_LANGS[_w] = _WORD_LANGS.get(_w, ()) + (_lang,)


def detect(text: str) -> str | None:
    """Best language for ``text``, or None when nothing matches.

    Deterministic: score = stopword hit-rate + diacritic hints; ties break
    by fixed alphabetical language order.
    """
    if not text:
        return None
    words = _WORD_RE.findall(text.lower())
    if not words:
        return None
    scores = dict.fromkeys(LANGS, 0.0)
    get = _WORD_LANGS.get
    for w in words:
        langs = get(w)
        if langs:
            for lang in langs:
                scores[lang] += 1.0
    if not text.isascii():
        for ch, lang, weight in _DIACRITIC_CHARS:
            n = text.count(ch)
            if n:
                scores[lang] += weight * n
    best = max(sorted(scores), key=lambda k: scores[k])
    if scores[best] <= 0.0:
        return None
    return best


def detect_document(block_texts: list[str]) -> tuple[list[str | None], list[str]]:
    """Per-block language + document-level language list.

    Mirrors detect_and_set_languages semantics: each block gets its own
    detection; the document's ``languages`` is the distinct non-null set,
    majority language first (deterministic tie-break by name).
    """
    per_block = [detect(t) for t in block_texts]
    counts: dict[str, int] = {}
    for lang in per_block:
        if lang is not None:
            counts[lang] = counts.get(lang, 0) + 1
    doc_langs = sorted(counts, key=lambda k: (-counts[k], k))
    return per_block, doc_langs
