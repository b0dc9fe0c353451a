"""Doc-type plugin registry (SURVEY.md §2.11 user-extension surface)."""

import json

import pytest

from valere_ocr_ray.registry.extractors import extract_document
from valere_ocr_ray.registry.plugins import (
    DocTypePlugin,
    classify_plugin,
    extract_plugin,
    register_doc_type,
    registered,
    unregister_doc_type,
)


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for name in list(registered()):
        unregister_doc_type(name)


def test_query_set_plugin_end_to_end():
    register_doc_type(
        DocTypePlugin(
            name="LAB_REPORT",
            url_tokens=("labreport",),
            keywords=("specimen", "lab", "result", "analyte"),
            keyword_threshold=3,
            query_set=(
                ("What is the Specimen ID?", ()),
                ("What is the Collection Date?", ()),
                ("What is the Analyte?", ()),
            ),
        )
    )
    text = "Specimen ID: S-991\nCollection Date: 01/02/2024\nOther: x"
    # url rule wins
    rec = extract_document("https://x/labreport/1.html", text)
    assert rec["doc_type"] == "LAB_REPORT"
    payload = json.loads(rec["fields_json"])
    assert payload["document_data"]["Specimen ID"] == "S-991"
    assert payload["document_data"]["Analyte"] == ""
    assert abs(rec["confidence"] - 2 / 3) < 1e-9
    # spans index into the text
    for s in rec["spans"]:
        assert text[s["start"] : s["end"]] == s["value"]
    # content keywords reach threshold without the url hint
    assert (
        classify_plugin("https://x/other/1.html", "lab specimen result ready")
        == "LAB_REPORT"
    )


def test_custom_extractor_plugin():
    def extractor(text):
        present = "INVOICE" in text
        return ({"invoice": present}, 1.0 if present else 0.0, [])

    register_doc_type(
        DocTypePlugin(name="INVOICE", url_tokens=("invoice",), extractor=extractor)
    )
    rec = extract_document("https://x/invoice/2.html", "INVOICE #42")
    assert rec["doc_type"] == "INVOICE"
    assert json.loads(rec["fields_json"]) == {"invoice": True}
    assert rec["confidence"] == 1.0


def test_builtin_dispatch_unchanged_without_plugins():
    rec = extract_document(
        "https://x/insurancecard/1.html", "Member Name: A B C123\nMember ID: C123"
    )
    assert rec["doc_type"] == "INSURANCE_CARD"


def test_plugin_does_not_shadow_builtin_after_unregister():
    register_doc_type(
        DocTypePlugin(name="EVERYTHING", url_tokens=("insurancecard",))
    )
    rec = extract_document("https://x/insurancecard/1.html", "")
    assert rec["doc_type"] == "EVERYTHING"
    unregister_doc_type("EVERYTHING")
    rec = extract_document("https://x/insurancecard/1.html", "")
    assert rec["doc_type"] == "INSURANCE_CARD"


def test_validation():
    with pytest.raises(ValueError):
        register_doc_type(DocTypePlugin(name="bad"))
    with pytest.raises(ValueError):
        register_doc_type(
            DocTypePlugin(
                name="X",
                query_set=(("What is the A?", ()),),
                extractor=lambda t: ({}, 0.0, []),
            )
        )
