"""F8 section splitter — ALL-CAPS-heading sectioning of flat text.

Reference semantics (``IDD/MiscTestingScripts/S32JSONpdf.py:95-116``,
duplicated in 8+ scripts), re-expressed:

* blank line → closes the current section (subsequent body lines with
  no open section fall into ``PARAGRAPH``);
* an ``isupper()`` line opens a section named by the line — and RESETS
  it if the heading repeats (the reference overwrites the list);
* other lines append to the open section, else to ``PARAGRAPH``
  (which accumulates across separate unheaded chunks);
* finally each section's lines join with ``' '`` and strip.

``isupper()`` is the Python definition: at least one cased character,
no lowercase — "123" is NOT a heading.  Section order is insertion
order (dict semantics), which makes the JSON encoding byte-stable.
"""

from __future__ import annotations

import json

import pandas as pd


def split_sections(text: str) -> dict[str, str]:
    sections: dict[str, list[str]] = {}
    current: str | None = None
    for line in text.split("\n"):
        if line.strip() == "":
            current = None
        elif line.isupper():
            current = line
            sections[current] = []
        elif current:
            sections[current].append(line)
        else:
            current = "PARAGRAPH"
            if current not in sections:
                sections[current] = []
            sections[current].append(line)
    return {k: " ".join(v).strip() for k, v in sections.items()}


def classify_lines(text: str) -> tuple[int, int, int]:
    """(n_heading, n_blank, n_body) line counts — the SQL-mirrorable
    projection of the splitter's per-line classification."""
    n_heading = n_blank = n_body = 0
    for line in text.split("\n"):
        if line.strip() == "":
            n_blank += 1
        elif line.isupper():
            n_heading += 1
        else:
            n_body += 1
    return n_heading, n_blank, n_body


def sections_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Per-row sections as a canonical JSON string column (map<str,str>
    with insertion-ordered keys — byte-stable)."""
    df = df.copy()
    df["sections_json"] = df[col].map(
        lambda t: json.dumps(split_sections(t), ensure_ascii=False)
    )
    return df


def line_stats_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    stats = df[col].map(classify_lines)
    df = df.copy()
    df["n_heading"] = stats.map(lambda s: s[0]).astype("int64")
    df["n_blank"] = stats.map(lambda s: s[1]).astype("int64")
    df["n_body"] = stats.map(lambda s: s[2]).astype("int64")
    return df
