"""Two-stage document classification (SURVEY.md §2.9 C1/C2/C3).

Semantics pinned to the reference's classifier
(``IDD/MiscTestingScripts/Ethan_PDFandJPG3.py:538-619``): cheap url
substring rules first, keyword scoring over extracted text only when
the url is uninformative; exact keyword families and threshold
precedence preserved (insurance >= 2 wins outright; prescription >= 3
and > agreement; agreement >= 3 and >= prescription; POSSIBLE_* at
>= 2; else UNKNOWN).
"""

from __future__ import annotations

# C1 — url substring rules, first match wins
# (reference: filename classifier, Ethan_PDFandJPG3.py:538-559)
INSURANCE_CARD = "INSURANCE_CARD"
FACE_SHEET = "FACE_SHEET"
SIGNED_AGREEMENT = "SIGNED_AGREEMENT"
PRESCRIPTION = "PRESCRIPTION"
ID_DOCUMENT = "ID_DOCUMENT"
POSSIBLE_PRESCRIPTION = "POSSIBLE_PRESCRIPTION"
POSSIBLE_AGREEMENT = "POSSIBLE_AGREEMENT"
UNKNOWN = "UNKNOWN"

DOC_TYPES = (
    INSURANCE_CARD,
    FACE_SHEET,
    SIGNED_AGREEMENT,
    PRESCRIPTION,
    ID_DOCUMENT,
    POSSIBLE_PRESCRIPTION,
    POSSIBLE_AGREEMENT,
    UNKNOWN,
)

# C2 — keyword families (Ethan_PDFandJPG3.py:584-603)
PRESCRIPTION_KEYWORDS = (
    "prescription", "rx", "physician", "doctor", "diagnosis",
    "patient name", "mother name", "mother's name", "breast pump",
    "icd-10", "medical necessity", "dob", "date of birth",
)
AGREEMENT_KEYWORDS = (
    "agreement", "signature", "signed", "consent", "terms",
    "conditions", "i agree", "customer", "acknowledge",
)
INSURANCE_KEYWORDS = (
    "insurance", "member", "policy", "group", "copay", "deductible",
    "plan", "coverage", "id#", "id #", "insured", "subscriber",
)


def classify_url(url: str) -> str | None:
    """C1: strong filename/url indicators; None when uninformative."""
    low = url.lower()
    if "insurancecard" in low:
        return INSURANCE_CARD
    if "facesheet" in low:
        return FACE_SHEET
    if "signed_agreement" in low or ("agreement" in low and "prescription" not in low):
        return SIGNED_AGREEMENT
    if "prescription" in low and "agreement" not in low:
        return PRESCRIPTION
    if "id" in low and "card" in low:
        return ID_DOCUMENT
    return None


def classify_content(text: str) -> tuple[str, int]:
    """C2: keyword-count scoring with the reference's threshold order."""
    low = text.lower()
    p = sum(1 for kw in PRESCRIPTION_KEYWORDS if kw in low)
    a = sum(1 for kw in AGREEMENT_KEYWORDS if kw in low)
    i = sum(1 for kw in INSURANCE_KEYWORDS if kw in low)
    if i >= 2:
        return INSURANCE_CARD, i
    if p >= 3 and p > a:
        return PRESCRIPTION, p
    if a >= 3 and a >= p:
        return SIGNED_AGREEMENT, a
    if p >= 2:
        return POSSIBLE_PRESCRIPTION, p
    if a >= 2:
        return POSSIBLE_AGREEMENT, a
    return UNKNOWN, 0


def classify(url: str, text: str) -> str:
    """C3: url rule first (cheap), content scoring only as fallback."""
    hint = classify_url(url)
    if hint is not None:
        return hint
    doc_type, _ = classify_content(text)
    return doc_type
