"""Arrow-batched pandas UDFs wrapping the pure-Python extraction core.

These are the only places Python touches row data; everything else stays
JVM-side (SURVEY §2.4 UDF surface: extract, detect_lang folded into
extract, translate). Iterator form amortizes per-batch setup; batch size
is bounded by spark.sql.execution.arrow.maxRecordsPerBatch (small — rows
carry multi-MB blobs, config.ARROW_MAX_RECORDS_PER_BATCH).

Error semantics: a bad document NEVER raises — it becomes a row with
parser='empty' and a non-null error column (reference parity:
cli/parse_htmls.py:110-119, cli/parse_pdfs.py:524-533).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.functions import pandas_udf

from ..extraction import langid, policy
from ..extraction.pdf_blocks import extract_pdf
from ..extraction.translate import translate_texts
from ..schema import EXTRACTION_RESULT, HTML_TEXT_BLOCK

ROUTE_PDF = "pdf"
ROUTE_HTML = "html"
ROUTE_NONE = "none"


def _empty_result(parser: str = "none", error: str | None = None) -> dict:
    return {
        "text": "",
        "detected_title": "",
        "detected_date": None,
        "has_valid_text": False,
        "text_blocks": [],
        "pdf_blocks": None,
        "pdf_tables": None,
        "page_metadata": None,
        "md5sum": None,
        "languages": [],
        "parser": parser,
        "error": error,
    }


def _extract_one(blob, route: str) -> dict:
    if route == ROUTE_NONE or blob is None:
        # P3: pass-through row with null parse fields
        return _empty_result(parser="none")

    if route == ROUTE_PDF:
        try:
            ext = extract_pdf(bytes(blob))
            block_texts = [b.text for b in ext.blocks]
            per_block, doc_langs = langid.detect_document(block_texts)
            return {
                "text": ext.content,
                "detected_title": "",
                "detected_date": None,
                "has_valid_text": len(ext.blocks) > 0,
                "text_blocks": [],
                "pdf_blocks": [
                    {
                        "page": b.page, "text": b.text,
                        "language": per_block[idx],
                        "x0": b.x0, "y0": b.y0, "x1": b.x1, "y1": b.y1,
                        "offset": b.offset, "length": b.length,
                    }
                    for idx, b in enumerate(ext.blocks)
                ],
                "pdf_tables": [
                    {
                        "page": t.page,
                        "row_count": t.row_count,
                        "column_count": t.column_count,
                        "cells": [
                            {
                                "row": c.row, "col": c.col, "text": c.text,
                                "x0": c.x0, "y0": c.y0,
                                "x1": c.x1, "y1": c.y1,
                                "offset": c.offset, "length": c.length,
                            }
                            for c in t.cells
                        ],
                    }
                    for t in ext.tables
                ],
                "page_metadata": [
                    {"page_number": p.page_number, "width": p.width,
                     "height": p.height, "unit": p.unit}
                    for p in ext.pages
                ],
                "md5sum": ext.md5sum,
                "languages": doc_langs,
                "parser": "pdf",
                "error": None,
            }
        except Exception as e:  # never throw (X1 error isolation)
            return _empty_result(parser="empty", error=f"pdf:{e}")

    # HTML route
    try:
        html = bytes(blob).decode("utf-8", errors="replace")
        r = policy.extract_html(html)
        block_texts = [" ".join(b.text) for b in r.text_blocks]
        per_block, doc_langs = langid.detect_document(block_texts)
        return {
            "text": r.text,
            "detected_title": r.detected_title,
            "detected_date": None,  # reference always None (base.py:56)
            "has_valid_text": r.has_valid_text,
            "text_blocks": [
                {
                    "text_block_id": b.text_block_id,
                    "text": b.text,
                    "language": per_block[idx],
                    "type": b.type,
                    "type_confidence": b.type_confidence,
                }
                for idx, b in enumerate(r.text_blocks)
            ],
            "pdf_blocks": None,
            "pdf_tables": None,
            "page_metadata": None,
            "md5sum": None,
            "languages": doc_langs,
            "parser": r.parser,
            "error": None,
        }
    except Exception as e:
        return _empty_result(parser="empty", error=f"html:{e}")


@pandas_udf(EXTRACTION_RESULT)
def extract_udf(
    it: Iterator[Tuple[pd.Series, pd.Series]]
) -> Iterator[pd.DataFrame]:
    """extract(html binary, route string) -> EXTRACTION_RESULT struct.

    One Arrow pass does routing dispatch (P1 downstream of the route
    column), HTML combined policy (M1-M7), PDF layout parse (M9-M12) and
    language detection (M8) — no second transit of the blob column.
    """
    for blobs, routes in it:
        results = [
            _extract_one(b, r) for b, r in zip(blobs.tolist(), routes.tolist())
        ]
        yield pd.DataFrame(results)


def make_translate_blocks_udf():
    """UDF translating html text_blocks to a target language (M14).

    Stub translator by default (deterministic, byte-identical to the
    reference's own test mock, src/translator/test/test_translate.py:12-16).
    A real client would be injected here; it must stay batched.
    """

    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(HTML_TEXT_BLOCK))
    def translate_blocks_udf(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        for blocks_col, lang_col in it:
            out = []
            for blocks, lang in zip(blocks_col.tolist(), lang_col.tolist()):
                if blocks is None:
                    out.append(None)
                    continue
                new_blocks = []
                for b in blocks:
                    texts = list(b["text"]) if b["text"] is not None else []
                    new_blocks.append({
                        "text_block_id": b["text_block_id"],
                        "text": translate_texts(texts, lang),
                        "language": lang,
                        "type": b["type"],
                        "type_confidence": b["type_confidence"],
                    })
                out.append(new_blocks)
            yield pd.Series(out)

    return translate_blocks_udf


def make_translate_pdf_blocks_udf():
    """UDF translating pdf_blocks text (reference translates
    pdf_data.text_blocks the same way, src/translator/translate.py:102-105)."""

    from pyspark.sql.types import ArrayType

    from ..schema import PDF_BLOCK

    @pandas_udf(ArrayType(PDF_BLOCK))
    def translate_pdf_blocks_udf(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        for blocks_col, lang_col in it:
            out = []
            for blocks, lang in zip(blocks_col.tolist(), lang_col.tolist()):
                if blocks is None:
                    out.append(None)
                    continue
                new_blocks = []
                for b in blocks:
                    # span/coords intentionally untouched: the reference
                    # translates block text in place and leaves layout
                    # metadata as-is (translate.py:102-105)
                    nb = dict(b)
                    nb["text"] = translate_texts([b["text"]], lang)[0]
                    nb["language"] = lang
                    new_blocks.append(nb)
                out.append(new_blocks)
            yield pd.Series(out)

    return translate_pdf_blocks_udf


def make_translate_meta_udf():
    """UDF translating the optional doc_meta map (M14 residue).

    The reference translates document_name and document_description with
    the same per-string worthiness skip as block text
    (src/translator/translate.py:90-96 via translate_text:45-52); the
    table model's analog is a map<string,string> column whose VALUES are
    translated and keys kept."""

    from pyspark.sql.types import MapType, StringType

    @pandas_udf(MapType(StringType(), StringType()))
    def translate_meta_udf(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        for meta_col, lang_col in it:
            out = []
            for meta, lang in zip(meta_col.tolist(), lang_col.tolist()):
                if meta is None:
                    out.append(None)
                    continue
                out.append(
                    {
                        k: (
                            translate_texts([v], lang)[0]
                            if v is not None
                            else None
                        )
                        for k, v in meta.items()
                    }
                )
            yield pd.Series(out)

    return translate_meta_udf
