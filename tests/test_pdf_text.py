"""Unit tests for the pure-python PDF text parser (SURVEY.md §2.3 T5)."""

from valere_ocr_ray.extract.pdf_text import extract_pdf_text
from valere_ocr_ray.sources.synth import build_pdf_bytes


def test_roundtrip_lines():
    pdf = build_pdf_bytes(["Line one", "Line two"])
    assert extract_pdf_text(pdf) == "Line one\nLine two"


def test_escaped_parens_and_backslash():
    pdf = build_pdf_bytes(["One (1) pump", "back\\slash"])
    assert extract_pdf_text(pdf) == "One (1) pump\nback\\slash"


def test_tj_array_operator():
    raw = b"%PDF-1.4 BT [(He) -20 (llo)] TJ ET"
    assert extract_pdf_text(raw) == "Hello"


def test_no_text_objects_empty():
    assert extract_pdf_text(b"%PDF-1.4 nothing here") == ""


def test_compressed_stream_yields_empty_not_crash():
    assert extract_pdf_text(b"%PDF-1.7 stream\x00\x01\x02endstream") == ""


def test_octal_escape():
    raw = b"%PDF-1.4 BT (A\\101B) Tj ET"
    assert extract_pdf_text(raw) == "AAB"
