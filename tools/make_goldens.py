"""Generate the committed golden corpus (SURVEY.md §5.2.2).

A slow, obviously-correct, single-process oracle: per fixture row it
applies the admission rules and the pure extraction functions directly
(no Ray, no batching, no parallelism) and writes
``tests/goldens/golden_extracted.parquet``.  The engine's e2e test
must reproduce every byte per url.  Regenerate ONLY on an intentional
contract change:  ``python tools/make_goldens.py``.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from valere_ocr_ray import MAX_DOC_BYTES
from valere_ocr_ray.extract import extract_pdf_text
from valere_ocr_ray.extract.html_text import (
    extract_main_text_reference as extract_main_text,  # stdlib front-end: the
    # independent slow oracle — NOT the fast tokenizer under test
)
from valere_ocr_ray.registry import extract_document
from valere_ocr_ray.sources.synth import BLOCKLIST_TOKENS, synth_row

N_ROWS = 500


def oracle_row(i: int) -> dict:
    url, _, html, _, _ = synth_row(i)
    if any(t in url.lower() for t in BLOCKLIST_TOKENS):
        status, text = "skipped_blocklisted", ""
    elif len(html) > MAX_DOC_BYTES:
        status, text = "skipped_too_large", ""
    elif html[:5] == b"%PDF-":
        text = extract_pdf_text(html)
        if not text:
            # scanned (image-only) PDF: the golden expectation is the
            # PRINTED agreement text (canonicalized) — the XObject
            # plumbing and OCR kernel under test never run here, so a
            # bug in either CANNOT leak into the goldens
            from valere_ocr_ray.extract.glyph_font import canonical_text
            from valere_ocr_ray.sources.synth import (
                _agreement_pdf_lines,
                _Rand,
            )

            text = canonical_text(_agreement_pdf_lines(_Rand(i)))
        status = "ok"
    elif html[:1] in (b"<", b"\xef"):
        status, text = "ok", extract_main_text(html)
    elif (
        html[:2] in (b"BM", b"P6")
        or html[:8] == b"\x89PNG\r\n\x1a\n"
        or html[:3] == b"\xff\xd8\xff"
        or html[:4] in (b"II*\x00", b"MM\x00*")
        or html[:6] in (b"GIF87a", b"GIF89a")
    ):
        # scanned raster card: the golden expectation is the PRINTED
        # text (canonicalized) — the OCR kernel under test never runs
        # here, so a decode/segmentation/classification bug in it
        # CANNOT leak into the goldens
        from valere_ocr_ray.extract.glyph_font import canonical_text
        from valere_ocr_ray.sources.synth import _Rand, _scanned_card_lines

        status, text = "ok", canonical_text(_scanned_card_lines(_Rand(i)))
    else:
        status, text = "error_unparseable", ""

    if status == "ok":
        rec = extract_document(url, text)
        doc_type, fields_json, confidence = (
            rec["doc_type"],
            rec["fields_json"],
            rec["confidence"],
        )
    else:
        doc_type, fields_json, confidence = "UNKNOWN", json.dumps({}), 0.0
    return {
        "url": url,
        "extracted_text": text,
        "doc_type": doc_type,
        "fields_json": fields_json,
        "confidence": float(confidence),
        "status": status,
    }


def main() -> None:
    rows = [oracle_row(i) for i in range(N_ROWS)]
    rows.sort(key=lambda r: r["url"])  # O1: url-sorted stable layout
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "extracted_text": pa.array([r["extracted_text"] for r in rows], pa.large_string()),
            "doc_type": pa.array([r["doc_type"] for r in rows], pa.string()),
            "fields_json": pa.array([r["fields_json"] for r in rows], pa.string()),
            "confidence": pa.array([r["confidence"] for r in rows], pa.float64()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
        }
    )
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, os.path.join(out, "golden_extracted.parquet"), compression="zstd")
    print(f"wrote {len(rows)} golden rows")


if __name__ == "__main__":
    main()
