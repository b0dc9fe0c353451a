"""Approximate distinct-count sketch (KMV / bottom-k) — mergeable,
partial-aggregable, deterministic.

A KMV (k-minimum-values) sketch keeps the k smallest 64-bit hashes of
the values seen; the distinct-count estimate is ``(k-1) * 2^63 /
kth_min`` (standard KMV estimator over the hash space), exact when
fewer than k distinct values were seen.  Merging = union + re-truncate,
so per-block sketches combine associatively — the aggregate ships k
int64s per block instead of every distinct value (the reason sketches
exist at 100 TB: a distinct-count over a shuffle becomes a
fixed-size-per-block combine).

Public scheme (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002).  Hashing uses the TRUE-64-bit token hash
(``ops/dedup._token_hashes64`` — two independent crc32 streams packed
to 64 bits, splitmix64-finalized): the estimator assumes uniform
63-bit hashes, and a 32-bit base space would undercount past ~10^8
distinct tokens and saturate at 2^32 (ADVICE r1).  The 32-bit-base
hash remains only where that entropy provably suffices (minhash /
simhash signatures, partitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from valere_ocr_ray.ops.dedup import _token_hashes64

_HASH_SPACE = float(1 << 63)  # hashes are right-shifted to 63-bit below


def kmv_from_hashes(hashes: np.ndarray, k: int) -> np.ndarray:
    """Bottom-k of 63-bit hash values (sorted ascending, deduped)."""
    if not len(hashes):
        return np.zeros(0, dtype=np.int64)
    h = np.unique((hashes >> np.uint64(1)).astype(np.int64))
    return h[:k] if len(h) > k else h


def kmv_merge(sketches: list[np.ndarray], k: int) -> np.ndarray:
    arrs = [s for s in sketches if len(s)]
    if not arrs:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(arrs))[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> int:
    """Distinct-count estimate; exact while |sketch| < k."""
    if len(sketch) < k:
        return int(len(sketch))
    kth = float(sketch[k - 1])
    return int(round((k - 1) * _HASH_SPACE / max(kth, 1.0)))


def distinct_tokens_kmv(
    ds: ray.data.Dataset, *, col: str = "text", k: int = 4096
) -> int:
    """Approximate distinct lower-cased alpha-token count over a text
    column: per-block KMV partials → TREE merge (sketches are
    associative, so intermediate merges run in tasks) → ONE k-vector
    reaches the driver.  A driver-side merge of per-block sketches
    would hold n_blocks × k int64s (≈32 GB at 100 TB block counts);
    the tree keeps driver state at k int64s regardless of corpus
    size.  Same tokenization as the exact ``doc_distinct_tokens``
    oracle query (len >= 3 alpha runs)."""
    import re

    alpha = re.compile(r"[a-z]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df[col]:
            toks.update(w for w in alpha.findall(t.lower()) if len(w) >= 3)
        sk = kmv_from_hashes(_token_hashes64(sorted(toks)), k)
        return pd.DataFrame({"sketch": [sk.tolist()]})

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        merged = kmv_merge(
            [np.asarray(s, dtype=np.int64) for s in df["sketch"]], k
        )
        return pd.DataFrame({"sketch": [merged.tolist()]})

    parts = ds.map_batches(partial, batch_format="pandas")
    for w in (8, 1):  # tree fan-in, one sketch row per block at each level
        parts = parts.repartition(w).map_batches(
            merge_block, batch_format="pandas", batch_size=None
        )
    rows = parts.take_all()  # exactly one row
    merged = kmv_merge([np.asarray(r["sketch"], dtype=np.int64) for r in rows], k)
    return kmv_estimate(merged, k)
