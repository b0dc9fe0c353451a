"""F8 section splitter semantics (SURVEY.md §2.2 F8; reference
``S32JSONpdf.py:95-116``)."""

from valere_ocr_ray.extract.sections import classify_lines, split_sections


def test_basic_sectioning():
    text = "intro line\nBACKGROUND\nfacts here\nmore facts\nNEXT STEPS\nplan"
    s = split_sections(text)
    assert s == {
        "PARAGRAPH": "intro line",
        "BACKGROUND": "facts here more facts",
        "NEXT STEPS": "plan",
    }
    # insertion order preserved (byte-stable JSON)
    assert list(s) == ["PARAGRAPH", "BACKGROUND", "NEXT STEPS"]


def test_blank_line_closes_section():
    # after a blank, body lines fall back into PARAGRAPH
    s = split_sections("HEAD\na\n\nb")
    assert s == {"HEAD": "a", "PARAGRAPH": "b"}


def test_repeated_heading_resets():
    # the reference overwrites the section list on a repeated heading
    s = split_sections("HEAD\nfirst\nHEAD\nsecond")
    assert s == {"HEAD": "second"}


def test_paragraph_accumulates_across_chunks():
    s = split_sections("a\n\nb\n\nc")
    assert s == {"PARAGRAPH": "a b c"}


def test_isupper_python_semantics():
    # digits-only is not a heading; mixed-case is not a heading
    s = split_sections("123\nABC1\nbody")
    assert "123" not in s
    assert s == {"PARAGRAPH": "123", "ABC1": "body"}


def test_empty_text():
    assert split_sections("") == {}


def test_classify_lines_counts():
    assert classify_lines("HEAD\nbody\n\n123\nX Y") == (2, 1, 2)
    assert classify_lines("") == (0, 1, 0)  # one empty line per split
