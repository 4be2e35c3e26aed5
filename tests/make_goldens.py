"""Generate golden snapshot fixtures (run once; outputs are committed).

Pins the byte-identical extracted text per url for the first 40 synthetic
documents (mirrors the reference's checked-in golden output
cli/test/test_data/output/test_html.json — ours are fixture snapshots we
pin, SURVEY §7.4.1). Regenerate ONLY on a deliberate, reviewed semantic
change:  python tests/make_goldens.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from navigator_document_parser_spark.extraction import langid, policy  # noqa: E402
from navigator_document_parser_spark.extraction.pdf_blocks import extract_pdf  # noqa: E402
from navigator_document_parser_spark.sources.synth import (  # noqa: E402
    LANGS,
    make_html,
    make_pdf,
)

N = 40
# deliberately-shaped docs beyond the contiguous range: empty bodies
# (55, 68), long-paragraph fallbacks (92, 111), heavy tails (137, 153)
SPECIAL_IDS = [55, 68, 92, 111, 137, 153]
OUT = pathlib.Path(__file__).parent / "fixtures" / "golden"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    manifest = {}
    for i in list(range(N)) + SPECIAL_IDS:
        is_pdf = (i % 5) == 4
        if is_pdf:
            ext = extract_pdf(make_pdf(i))
            text = ext.content
            entry = {
                "route": "pdf",
                "parser": "pdf",
                "n_blocks": len(ext.blocks),
                "md5sum": ext.md5sum,
                "n_pages": len(ext.pages),
            }
        else:
            r = policy.extract_html(make_html(i).decode("utf-8"))
            text = r.text
            _, doc_langs = langid.detect_document(
                [" ".join(b.text) for b in r.text_blocks]
            )
            entry = {
                "route": "html",
                "parser": r.parser,
                "n_blocks": len(r.text_blocks),
                "detected_title": r.detected_title,
                "has_valid_text": r.has_valid_text,
                "languages": doc_langs,
                "gen_lang": LANGS[i % len(LANGS)],
            }
        (OUT / f"doc_{i}.txt").write_bytes(text.encode("utf-8"))
        manifest[str(i)] = entry
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"wrote {N + len(SPECIAL_IDS)} goldens to {OUT}")

    # realistic-page fixture goldens (tests/test_realistic_fixtures.py)
    # regenerate through the same deliberate command as the synth ones
    html_dir = OUT.parent / "html"
    for name in ("wiki_style", "news_site"):
        src = html_dir / f"{name}.html"
        if src.exists():
            r = policy.extract_html(src.read_text())
            (html_dir / f"{name}.golden.txt").write_bytes(
                r.text.encode("utf-8")
            )
            print(f"wrote {name}.golden.txt")


if __name__ == "__main__":
    main()
