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


def test_flate_compressed_stream_extracted():
    """Real-world PDFs compress content streams with /FlateDecode —
    the parser inflates them via stdlib zlib."""
    import zlib

    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    stream = b"BT /F1 10 Tf 50 742 Td\n(Compressed hello) Tj 0 -14 Td\n(line two) Tj\nET"
    comp = zlib.compress(stream)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "Compressed hello\nline two"


def test_flate_garbage_stream_skipped_not_raised():
    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 10 /Filter /FlateDecode >>\nstream\n"
        b"\x00\x01garbage!\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 20 >>\nstream\nBT (ok) Tj ET\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "ok"


def test_mixed_plain_and_flate_order():
    import zlib

    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    comp = zlib.compress(b"BT (from flate) Tj ET")
    pdf = (
        b"%PDF-1.4\nBT (plain first) Tj ET\n"
        b"<< /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "plain first\nfrom flate"


def test_flate_nested_decodeparms_dict():
    """A dict containing nested <<…>> (DecodeParms) and hex strings
    breaks a flat [^>]* regex; the bracket-aware scanner handles it."""
    import zlib

    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    stream = b"BT (Nested params ok) Tj ET"
    comp = zlib.compress(stream)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
        + b" /ID <4f3c> >>\nstream\n" + comp + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "Nested params ok"


def test_flate_embedded_endstream_bytes_not_truncating():
    """With a correct /Length, a coincidental 'endstream' byte sequence
    INSIDE the compressed body must not truncate the stream (zlib
    level-0 stored blocks embed the raw text, including the marker)."""
    import zlib

    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    stream = b"BT (before endstream after) Tj ET"
    comp = zlib.compress(stream, 0)  # stored block: raw bytes inside
    assert b"endstream" in comp
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "before endstream after"


def test_flate_indirect_length_falls_back_to_endstream():
    """'/Length 5 0 R' is an indirect reference, not a byte count —
    the scanner must ignore it and use the literal endstream search."""
    import zlib

    from valere_ocr_ray.extract.pdf_text import extract_pdf_text

    stream = b"BT (Indirect length) Tj ET"
    comp = zlib.compress(stream)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 0 R /Filter /FlateDecode >>\n"
        b"stream\n" + comp + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "Indirect length"
