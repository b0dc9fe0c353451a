"""Exact token-window segment dedup — the corpus-REWRITE flavor of
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022, adapted to fixed windows): split every document
into consecutive non-overlapping ``window``-token segments and drop
every segment whose exact text occurred earlier in the corpus (global
keep-first by ``(id, seg_idx)``).  This removes shared boilerplate /
template runs that whole-document dedup (``ops/dedup``) cannot see,
and rewrites the surviving text instead of just flagging pairs.

Scale shape (100 TB):

* the explode is a per-batch vectorized pandas kernel (split →
  explode → windowed groupby-join), no per-row Python in the driver;
* the global keep-first is ONE hash exchange keyed by the segment's
  64-bit content hash with only ``(h64, id, seg_idx, n_toks)`` ints on
  the wire (``exact=False``, the default) — segment TEXT never moves;
* per-doc stats reduce through ``ops/exchange.grouped_sum`` (partial
  per block → keyed exchange → vectorized fold).

Collision contract (hash mode): two distinct segments colliding on the
64-bit hash would wrongly drop one — P(any collision) ≈ n²/2^65, about
1e-7 at 10^9 distinct segments.  ``exact=True`` exchanges the segment
string itself for a collision-free run and enables
:func:`segment_dedup_rebuild` (clean-text reassembly).

Reference parity: the reference has no segment-level dedup (its corpus
is per-document OCR calls); this op belongs to the training-data suite
the engine adds on top (SURVEY.md round-2 delta).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray.data

from valere_ocr_ray.ops.dedup import _mix64
from valere_ocr_ray.ops.exchange import grouped_map, grouped_sum, hash_exchange


def _seg_hash64(segs: pd.Series) -> np.ndarray:
    """Genuinely 64-bit-entropy per-segment hashes: two independent
    crc32 streams packed high/low, splitmix64-finalized (same recipe
    as ``ops/dedup._token_hashes64`` — the KMV-grade base space, not
    bare crc32's 2^32)."""
    n = len(segs)
    if not n:
        return np.zeros(0, dtype=np.uint64)
    lo = np.fromiter(
        (zlib.crc32(s.encode()) for s in segs), dtype=np.uint64, count=n
    )
    hi = np.fromiter(
        (zlib.crc32(s.encode() + b"\x01seg") for s in segs),
        dtype=np.uint64,
        count=n,
    )
    with np.errstate(over="ignore"):
        return _mix64((hi << np.uint64(32)) | lo)


def explode_segments(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> ray.data.Dataset:
    """One row per (id, seg_idx): consecutive non-overlapping
    ``window``-token segments (last segment may be shorter).  Columns:
    ``id_col, seg_idx, seg, n_toks``."""

    def ex(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "seg_idx": pd.Series([], dtype="int64"),
                    "seg": pd.Series([], dtype="object"),
                    "n_toks": pd.Series([], dtype="int64"),
                }
            )
        e = pd.DataFrame({id_col: df[id_col].to_numpy()})
        e["tok"] = df[text_col].str.split(" ").to_numpy()
        e = e.explode("tok")
        pos = e.groupby(level=0).cumcount()
        e["seg_idx"] = (pos // window).astype("int64").to_numpy()
        g = e.groupby([id_col, "seg_idx"], sort=False)["tok"]
        out = g.agg(" ".join).reset_index(name="seg")
        out["n_toks"] = g.size().to_numpy().astype("int64")
        return out

    return ds.map_batches(ex, batch_format="pandas")


def segment_dedup_flags(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    exact: bool = False,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Every segment row plus a ``keep`` bool: True iff this is the
    corpus-wide FIRST occurrence of the segment (ordered by
    ``(id, seg_idx)``).  Hash mode (default) keys the exchange on the
    64-bit segment hash and drops the text column before the wire;
    ``exact=True`` keys on the segment string (collision-free, keeps
    ``seg`` in the output for rebuild)."""
    segs = explode_segments(ds, id_col=id_col, text_col=text_col, window=window)
    key = "seg" if exact else "h64"
    if not exact:

        def to_hash(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    id_col: df[id_col].astype("int64"),
                    "seg_idx": df["seg_idx"].astype("int64"),
                    "h64": _seg_hash64(df["seg"]).view(np.int64),
                    "n_toks": df["n_toks"].astype("int64"),
                }
            )

        segs = segs.map_batches(to_hash, batch_format="pandas")

    ex = hash_exchange(segs, [key], num_partitions)

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(keep=pd.Series([], dtype=bool))
        df = df.sort_values([key, id_col, "seg_idx"], kind="mergesort")
        return df.assign(keep=~df[key].duplicated().to_numpy())

    return ex.map_batches(mark, batch_format="pandas", batch_size=None)


def segment_dedup_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    exact: bool = False,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-doc rewrite stats: ``(id, n_segs, n_kept, kept_tokens)`` —
    the audit table a dedup run publishes (how much of each document
    survives)."""
    flags = segment_dedup_flags(
        ds,
        id_col=id_col,
        text_col=text_col,
        window=window,
        exact=exact,
        num_partitions=num_partitions,
    )

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["keep"].to_numpy() if len(df) else np.zeros(0, dtype=bool)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "n_segs": np.ones(len(df), dtype="int64"),
                "n_kept": keep.astype("int64"),
                "kept_tokens": (keep * df["n_toks"].to_numpy()).astype("int64"),
            }
        )

    return grouped_sum(
        flags.map_batches(pre, batch_format="pandas"),
        [id_col],
        ["n_segs", "n_kept", "kept_tokens"],
        num_partitions=num_partitions,
    )


def segment_dedup_rebuild(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """The cleaned corpus: ``(id, clean_text, n_kept)`` with dropped
    segments removed and survivors re-joined in original order.  Runs
    in exact mode (segment text must travel to be reassembled); a doc
    whose every segment was seen earlier comes back with
    ``clean_text == ''`` rather than vanishing — the caller decides
    the drop policy."""
    flags = segment_dedup_flags(
        ds,
        id_col=id_col,
        text_col=text_col,
        window=window,
        exact=True,
        num_partitions=num_partitions,
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "clean_text": pd.Series([], dtype="object"),
                    "n_kept": pd.Series([], dtype="int64"),
                }
            )
        kept = g[g["keep"]].sort_values("seg_idx")
        return pd.DataFrame(
            {
                id_col: [int(g[id_col].iloc[0])],
                "clean_text": [" ".join(kept["seg"])],
                "n_kept": [int(len(kept))],
            }
        )

    return grouped_map(flags, [id_col], rebuild, num_partitions=num_partitions)
