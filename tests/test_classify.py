"""Classifier tests — C1 url rules and C2 threshold edges (SURVEY.md §2.9)."""

from valere_ocr_ray.registry.doctypes import (
    classify,
    classify_content,
    classify_url,
)


def test_url_rules():
    assert classify_url("https://x/insurancecard/1") == "INSURANCE_CARD"
    assert classify_url("https://x/facesheet/1") == "FACE_SHEET"
    assert classify_url("https://x/signed_agreement/1") == "SIGNED_AGREEMENT"
    assert classify_url("https://x/agreement/1") == "SIGNED_AGREEMENT"
    assert classify_url("https://x/prescription/1") == "PRESCRIPTION"
    # both "prescription" and "agreement" present → neither rule fires
    # (each requires the other token absent) → fall through to content
    assert classify_url("https://x/prescription_agreement/1") is None
    assert classify_url("https://x/idcard/1") == "ID_DOCUMENT"
    assert classify_url("https://x/article/1") is None


def test_insurance_two_keywords_wins_outright():
    # insurance=2 beats prescription=3
    text = "insurance member prescription rx physician"
    assert classify_content(text)[0] == "INSURANCE_CARD"


def test_prescription_needs_three_and_strictly_more():
    assert classify_content("prescription rx physician")[0] == "PRESCRIPTION"
    # tie at 3-3 → agreement branch (agreement >= prescription)
    tie = "prescription rx physician agreement signature consent"
    assert classify_content(tie)[0] == "SIGNED_AGREEMENT"


def test_possible_thresholds():
    assert classify_content("prescription rx")[0] == "POSSIBLE_PRESCRIPTION"
    assert classify_content("agreement signature")[0] == "POSSIBLE_AGREEMENT"
    assert classify_content("nothing notable")[0] == "UNKNOWN"


def test_two_stage_url_first():
    # url hint wins even when content says otherwise
    assert classify("https://x/facesheet/1", "insurance member") == "FACE_SHEET"
    assert classify("https://x/article/1", "insurance member") == "INSURANCE_CARD"
