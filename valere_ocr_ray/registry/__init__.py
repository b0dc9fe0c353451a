"""Doc-type plugin registry (SURVEY.md §2.11).

A doc type is declarative data: url rules (C1), content-keyword scoring
(C2), an ordered field schema (T3 query sets), a pattern battery
(F9-F13), normalization rules (§2.8), and a confidence function
(A1/A2).  Adding a doc type means adding rows here, not pipeline code.
"""

from valere_ocr_ray.registry.doctypes import classify, classify_content, classify_url
from valere_ocr_ray.registry.extractors import extract_document
from valere_ocr_ray.registry.plugins import (
    DocTypePlugin,
    register_doc_type,
    unregister_doc_type,
)

__all__ = [
    "classify",
    "classify_url",
    "classify_content",
    "extract_document",
    "DocTypePlugin",
    "register_doc_type",
    "unregister_doc_type",
]
