"""Exact token-window segment dedup — the corpus-REWRITE flavor of
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022, adapted to fixed windows): split every document
into consecutive non-overlapping ``window``-token segments and drop
every segment whose exact text occurred earlier in the corpus (global
keep-first by ``(id, seg_idx)``).  This removes shared boilerplate /
template runs that whole-document dedup (``ops/dedup``) cannot see,
and rewrites the surviving text instead of just flagging pairs.

Scale shape (100 TB):

* segmentation slices each doc at byte offsets of every ``window``-th
  space (numpy scan + C-level string slices — no token-level explode);
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

import numpy as np
import pandas as pd
import ray.data

from valere_ocr_ray.ops.exchange import grouped_sum, hash_exchange


def _seg_hash64(segs: pd.Series) -> np.ndarray:
    """Genuinely 64-bit-entropy per-segment hashes: the first 8 md5
    digest bytes.  NOT two crc32 lanes — CRC is linear over GF(2), so
    ``crc32(m)`` and ``crc32(m ⊕ salt)``/``crc32(m || salt)`` are
    affinely related within a length class and the pair carries only
    ~32 bits; at 6.75M segments that produced thousands of spurious
    keep-first collisions (measured: 44 docs wrongly emptied on the
    200k-page corpus).  md5 costs ~1 µs/segment — noise next to the
    exchange."""
    import hashlib

    n = len(segs)
    if not n:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in segs
        ),
        dtype=np.uint64,
        count=n,
    )


def _doc_segments(txt: str, window: int) -> list[str]:
    """A doc's non-overlapping ``window``-token segments via byte-offset
    slicing (ascii fast path; token fallback for non-ascii)."""
    b = txt.encode()
    arr = np.frombuffer(b, dtype=np.uint8)
    cuts = np.flatnonzero(arr == 32)[window - 1 :: window]
    if len(b) == len(txt):
        starts = np.concatenate(([0], cuts + 1)).tolist()
        ends = np.concatenate((cuts, [len(b)])).tolist()
        return [txt[a:z] for a, z in zip(starts, ends)]
    toks = txt.split(" ")
    return [
        " ".join(toks[s : s + window]) for s in range(0, len(toks), window)
    ]


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
        # byte-offset segmentation: find every ``window``-th space with
        # numpy and SLICE the original string — no token-level explode,
        # no re-join of the tokens (dominant term of a measured
        # 262 s → 105 s improvement of the composed 200k-page pipeline
        # vs the explode+groupby-join formulation)
        ids_out: list[int] = []
        idx_out: list[int] = []
        seg_out: list[str] = []
        ntk_out: list[int] = []
        for i, txt in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
            b = txt.encode()
            arr = np.frombuffer(b, dtype=np.uint8)
            sp = np.flatnonzero(arr == 32)  # space positions (bytes)
            n_tok = len(sp) + 1
            cuts = sp[window - 1 :: window]
            # cut k spans tokens [k*window, (k+1)*window)
            starts = np.concatenate(([0], cuts + 1))
            ends = np.concatenate((cuts, [len(b)]))
            n_seg = len(starts)
            ids_out.extend([int(i)] * n_seg)
            idx_out.extend(range(n_seg))
            # byte slicing is only safe on ascii; fall back per doc
            if len(b) == len(txt):
                seg_out.extend(
                    txt[a:z] for a, z in zip(starts.tolist(), ends.tolist())
                )
            else:
                toks = txt.split(" ")
                seg_out.extend(
                    " ".join(toks[s : s + window])
                    for s in range(0, len(toks), window)
                )
            full, last = divmod(n_tok, window)
            ntk_out.extend([window] * (n_seg - 1))
            ntk_out.append(last if last else window)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids_out, dtype="int64"),
                "seg_idx": pd.Series(idx_out, dtype="int64"),
                "seg": pd.Series(seg_out, dtype="object"),
                "n_toks": pd.Series(ntk_out, dtype="int64"),
            }
        )

    return ds.map_batches(ex, batch_format="pandas")


def segment_dedup_flags(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    exact: bool = False,
    num_partitions: int | None = None,
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
        # factorize → int codes so the keep-first ordering sort never
        # compares strings (exact mode would otherwise lexicographic-
        # sort millions of segment texts)
        codes, _ = pd.factorize(df[key], sort=False)
        order = np.lexsort(
            (df["seg_idx"].to_numpy(), df[id_col].to_numpy(), codes)
        )
        df = df.iloc[order]
        return df.assign(keep=~pd.Series(codes[order]).duplicated().to_numpy())

    return ex.map_batches(mark, batch_format="pandas", batch_size=None)


def segment_dedup_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
    exact: bool = False,
    num_partitions: int | None = None,
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
    num_partitions: int | None = None,
    wire: str = "hash",
) -> ray.data.Dataset:
    """The cleaned corpus: ``(id, clean_text, n_kept)`` with dropped
    segments removed and survivors re-joined in original order.  A doc
    whose every segment was seen earlier comes back with
    ``clean_text == ''`` rather than vanishing — the caller decides
    the drop policy.

    ``wire='hash'`` (default): keep flags computed on the 64-bit-hash
    exchange (ints only), then ONLY the dropped ``(id, seg_idx)`` pairs
    — the minority — cogroup with the docs and each doc re-segments
    locally.  Inherits hash mode's collision contract; output verified
    identical to exact wire on the 200k-page corpus, walls within 10%
    there (the hash wire's byte advantage grows with segment length).
    ``wire='exact'``: segment text travels the exchange — collision-
    free, used by byte-for-byte oracles."""
    if wire not in ("hash", "exact"):
        raise ValueError(f"unsupported wire={wire!r}")
    if wire == "hash":
        from valere_ocr_ray.ops.exchange import cogroup_exchange

        flags = segment_dedup_flags(
            ds,
            id_col=id_col,
            text_col=text_col,
            window=window,
            exact=False,
            num_partitions=num_partitions,
        )
        dropped = flags.map_batches(
            lambda df: df.loc[~df["keep"], [id_col, "seg_idx"]],
            batch_format="pandas",
        )

        def fold(docs_df: pd.DataFrame, drop_df: pd.DataFrame) -> pd.DataFrame:
            if not len(docs_df):
                return pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "clean_text": pd.Series([], dtype="object"),
                        "n_kept": pd.Series([], dtype="int64"),
                    }
                )
            drop_by_id = (
                drop_df.groupby(id_col)["seg_idx"].agg(set).to_dict()
                if len(drop_df)
                else {}
            )
            ids, cleans, kepts = [], [], []
            for i, txt in zip(
                docs_df[id_col].to_numpy(), docs_df[text_col].to_numpy()
            ):
                i = int(i)
                d = drop_by_id.get(i)
                if not d:
                    segs = _doc_segments(txt, window)
                    ids.append(i)
                    cleans.append(txt)
                    kepts.append(len(segs))
                    continue
                segs = _doc_segments(txt, window)
                keep = [s for k, s in enumerate(segs) if k not in d]
                ids.append(i)
                cleans.append(" ".join(keep))
                kepts.append(len(keep))
            return pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "clean_text": pd.Series(cleans, dtype="object"),
                    "n_kept": pd.Series(kepts, dtype="int64"),
                }
            )

        return cogroup_exchange(
            ds.select_columns([id_col, text_col]),
            dropped,
            [id_col],
            [id_col],
            fold,
            num_partitions=num_partitions,
        )

    flags = segment_dedup_flags(
        ds,
        id_col=id_col,
        text_col=text_col,
        window=window,
        exact=True,
        num_partitions=num_partitions,
    )
    ex = hash_exchange(flags, [id_col], num_partitions)

    # partition-level vectorized rebuild: one sort + one groupby-join
    # per PARTITION, not a Python fn per doc group
    def rebuild_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "clean_text": pd.Series([], dtype="object"),
                    "n_kept": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([id_col, "seg_idx"], kind="mergesort")
        kept = df[df["keep"]]
        g = kept.groupby(id_col, sort=True)["seg"]
        joined = g.agg(" ".join)
        counts = g.size()
        out = pd.DataFrame({id_col: np.sort(df[id_col].unique())})
        out["clean_text"] = out[id_col].map(joined).fillna("")
        out["n_kept"] = (
            out[id_col].map(counts).fillna(0).astype("int64")
        )
        return out

    return ex.map_batches(
        rebuild_block, batch_format="pandas", batch_size=None
    )
