"""URL-derived projections: F6 tokenizer, F14 filename-date, §2.7
member split, O3 tail window (SURVEY.md rows)."""

import pandas as pd

from valere_ocr_ray.ops.urlmeta import (
    split_member_name,
    tail_lines,
    url_date,
    url_tokens,
    url_tokens_batch,
)


def test_url_tokens_f6_semantics():
    # word runs with underscores, extension glued, <3 chars dropped,
    # dedup + sort (S3returnFileContents.py:34-42)
    toks = url_tokens("https://x.y/signed_agreement/ab_cd_2024/scanpdf/a/scanpdf")
    assert toks == sorted(set(toks))
    assert "signed_agreement" in toks
    assert "scanpdf" in toks
    assert all(len(t) >= 3 for t in toks)
    assert url_tokens("") == []


def test_url_tokens_batch():
    df = url_tokens_batch(pd.DataFrame({"url": ["https://a.b/doc_one/x", ""]}))
    assert df["url_tokens"].iloc[0] == ["doc_one", "https"]


def test_url_date_f14():
    assert url_date("s3://b/scan_2024_07_15_final.pdf") == "2024/07/15"
    assert url_date("no date here") == ""
    # first match wins
    assert url_date("a/2020_01_02/b/2021_03_04") == "2020/01/02"


def test_split_member_name():
    assert split_member_name("Maria Garcia A12345") == ("Maria Garcia", "A12345")
    assert split_member_name("Single") == ("Single", "")
    assert split_member_name("  padded name X1  ") == ("padded name", "X1")
    assert split_member_name("") == ("", "")


def test_tail_lines_o3():
    text = "\n".join(f"line{i}" for i in range(30))
    tail = tail_lines(text, 15)
    assert tail.split("\n") == [f"line{i}" for i in range(15, 30)]
    assert tail_lines("short", 15) == "short"
