"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms (pandas string
kernels / numpy); regexes compile at module import, once per worker.
The token/quality definitions are deliberately SQL-expressible so the
DuckDB oracle can verify them bit-for-bit (see ``__ray_entry__``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# mirrored 1:1 in oracle SQL (regexp_extract_all) — keep in sync
TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[A-Za-z]+")
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")
STOP_RE = re.compile(r"\b(?:%s)\b" % "|".join(STOPWORDS))
ALPHA_RE = re.compile(r"[^A-Za-z]")
PUNCT_RE = re.compile(r"[^\w\s]")


def token_count_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["n_tokens"] = df[col].str.count(TOKEN_RE).astype("int64")
    # BPE-ish subword proxy: word-internal 4-char chunks (public
    # GPT-2-style pre-tokenizer shape, counted not materialized)
    df["n_subwords"] = (
        df[col]
        .str.findall(WORD_RE)
        .map(lambda ws: sum((len(w) + 3) // 4 for w in ws))
        .astype("int64")
    )
    return df


def quality_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword quality signals (heuristic
    quality scoring a web-text pipeline gates on)."""
    df = df.copy()
    text = df[col]
    n = text.str.len().astype("int64")
    alpha = n - text.str.count(ALPHA_RE).astype("int64")
    punct = text.str.count(PUNCT_RE).astype("int64")
    stops = text.str.lower().str.count(STOP_RE).astype("int64")
    toks = text.str.count(TOKEN_RE).astype("int64")
    df["len_chars"] = n
    df["alpha_ratio"] = (alpha * 1000 // n.clip(lower=1)).astype("int64")  # ‰, int for oracle-stable compare
    df["punct_per_kchar"] = (punct * 1000 // n.clip(lower=1)).astype("int64")
    df["stop_per_ktok"] = (stops * 1000 // toks.clip(lower=1)).astype("int64")
    return df


# --- language ID (n-gram/stopword heuristic) ---------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for", "that"),
    "es": ("el", "la", "de", "que", "los", "por", "una"),
    "fr": ("le", "la", "et", "les", "des", "une", "est"),
    "de": ("der", "die", "und", "das", "ein", "nicht", "mit"),
}
_LANG_RES = {
    lang: re.compile(r"\b(?:%s)\b" % "|".join(words))
    for lang, words in _LANG_MARKERS.items()
}


def langid_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Marker-word scoring; ``und`` when nothing matches.  A heuristic
    (not SQL-verifiable) — the oracle check for it is rows-only."""
    df = df.copy()
    low = df[col].str.lower()
    scores = np.stack(
        [low.str.count(_LANG_RES[lang]).to_numpy() for lang in _LANG_MARKERS], axis=1
    )
    best = scores.argmax(axis=1)
    langs = np.array(list(_LANG_MARKERS))
    pred = np.where(scores.max(axis=1) > 0, langs[best], "und")
    df["lang_pred"] = pred
    return df


# --- fingerprinting ----------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = (1 << 64) - 1


def _fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def fingerprint_text(text: str, window: int = 8) -> int:
    """Deterministic 63-bit doc fingerprint: min FNV-1a over
    ``window``-token shingles (rolling-hash winnowing, public
    Rabin/winnowing scheme).  Equal fingerprints ⇒ near-identical
    token streams with high probability."""
    toks = text.split()
    if not toks:
        return 0
    if len(toks) <= window:
        return _fnv1a(" ".join(toks).encode()) >> 1
    best = _MASK
    for i in range(len(toks) - window + 1):
        h = _fnv1a(" ".join(toks[i : i + window]).encode())
        if h < best:
            best = h
    return best >> 1


def fingerprint_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["fingerprint"] = df[col].map(fingerprint_text).astype("int64")
    return df


def with_textstats(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """All four analyzers in one fused pandas stage."""

    def fused(df: pd.DataFrame) -> pd.DataFrame:
        return fingerprint_batch(
            langid_batch(quality_batch(token_count_batch(df, col), col), col), col
        )

    return ds.map_batches(fused, batch_format="pandas")
