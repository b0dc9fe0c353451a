"""Per-doc-class field query sets (SURVEY.md §2.3 T3).

The reference asks Textract QUERIES per document class
(``IDD/finalcodes/InsuranceCard1.py:92-108`` 15 questions,
``Facesheet.py:104-143`` 15+15, ``Prescription1.py:104-130`` 15+2,
``Prescription2.py:106-124`` 12, ``BreastPump.py:110-121`` 9,
``InsuranceCard2.py:104-118`` 11) and derives the output field name
from the question text via ``a.split("the ",1)[1].split("?",1)[0]``
(``InsuranceCard1.py:122-126`` — typos like "Garuntor"/"Refering"/
"Memeber" and all are preserved verbatim, since golden field names
reproduce this derivation).  Locally there is no 15-per-call cap, so
the reference's split query batches merge into one ordered field set.

Each entry: ``(question, extra_label_aliases)`` — the value is looked
up in the document's key/value lines under the derived field name or
any alias (case-insensitive).
"""

from __future__ import annotations

QuerySpec = tuple[str, tuple[str, ...]]


def derive_field_name(question: str) -> str:
    """Reproduces the reference's question→field-name derivation.

    ``InsuranceCard1.py:122-126``; the reference crashes on questions
    without ``"the "`` — every registered question contains it, and we
    fall back to the stripped question instead of raising.
    """
    if "the " in question:
        question = question.split("the ", 1)[1]
    return question.split("?", 1)[0]


# INSURANCE_CARD — InsuranceCard1.py:92-108 (15 queries)
INSURANCE_CARD_QUERIES: list[QuerySpec] = [
    ("What is the Member Name", ()),
    ("What is the Member ID?", ()),
    ("Who is the PCP?", ()),
    ("What is the phone number of the PCP?", ("PCP Phone",)),
    ("What is the medical insurance provider?", ("Provider",)),
    ("What is the effective date?", ()),
    ("What is the Group No.?", ("Group No",)),
    ("What is the plan type?", ()),
    ("What is the BIN?", ()),
    ("What is the Rx PCN?", ()),
    ("What is the Generic Copay?", ()),
    ("What is the Brand Copay?", ()),
    ("What is the Specialty Copay?", ()),
    ("What is the Emergency Room Percentage?", ("Emergency Room %",)),
    ("What is the PCP Copay?", ()),
]

# FACE_SHEET — Facesheet.py:104-143 (two 15-query batches, merged)
FACE_SHEET_QUERIES: list[QuerySpec] = [
    ("What is the Patient Name?", ()),
    ("What is the Patient Date of Birth?", ()),
    ("What is the Patient Address?", ()),
    ("What is the Patient sex?", ("Patient Sex",)),
    ("What is the Patient Ethnicity?", ()),
    ("What is the Patient citizenship?", ("Patient Citizenship",)),
    ("What is the Patient Race?", ()),
    ("What is the Patient Phone Number?", ()),
    ("What is the Admitting Provider Name?", ()),
    ("What is the Attending Provider Telephone Number?", ()),
    ("What is the Attending Provider Name?", ()),
    ("What is the Refering physician?", ("Referring Physician",)),
    ("What is the admitting diagnosis?", ("Admitting Diagnosis",)),
    ("What is the Encounter Date?", ()),
    ("What is the MRN?", ()),
    ("What is the Hospital Account number?", ("Hospital Account Number",)),
    ("What is the Contact Serial number?", ("Contact Serial Number",)),
    ("What is the Patient insurance provider?", ("Patient Insurance Provider",)),
    ("What is the insurance Subscriber name?", ("Insurance Subscriber Name",)),
    ("What is the Patient insurance group number?", ("Patient Insurance Group Number",)),
    ("What is the Patient insurance Subscriber Id?", ("Patient Insurance Subscriber Id",)),
    ("What is the Patient insurance type?", ("Patient Insurance Type",)),
    ("What is the Patient insurance plan?", ("Patient Insurance Plan",)),
    (
        "What is the Patient relationship to insurance Subscriber?",
        ("Patient Relationship To Insurance Subscriber",),
    ),
    ("What is the insurance verifiaction status?", ("Insurance Verification Status",)),
    ("What is the Garuntor Name?", ("Guarantor Name",)),
    ("What is the Garuntor relation to patient?", ("Guarantor Relation To Patient",)),
    ("What is the Garuntor Id?", ("Guarantor Id",)),
    ("What is the Garuntor Address?", ("Guarantor Address",)),
    ("What is the Garuntor Phone number?", ("Guarantor Phone Number",)),
]

# ID_DOCUMENT — card-like docs take the 11-query set of InsuranceCard2.py:104-118
ID_DOCUMENT_QUERIES: list[QuerySpec] = [
    ("What is the Member Name?", ()),
    ("What is the Member ID?", ()),
    ("Who is the PCP?", ()),
    ("What is the phone number of the PCP?", ("PCP Phone",)),
    ("What is the medical insurance provider?", ("Provider",)),
    ("What is the effective date?", ()),
    ("What is the Group Name?", ()),
    ("What is the payer id?", ("Payer Id",)),
    ("What is the RS BIN?", ()),
    ("What is the Rx PCN?", ()),
    ("What is the Rx GRP?", ()),
]

QUERY_SETS: dict[str, list[QuerySpec]] = {
    "INSURANCE_CARD": INSURANCE_CARD_QUERIES,
    "FACE_SHEET": FACE_SHEET_QUERIES,
    "ID_DOCUMENT": ID_DOCUMENT_QUERIES,
}
