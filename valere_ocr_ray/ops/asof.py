"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key — the operator the Dataset API lacks (SURVEY.md §2.4
notes the reference has none either; this is a beyond-reference op the
brief calls for).

Implementation (custom-operator path (b)): the right side is built into
a per-key **sorted timestamp index** driver-side and broadcast via
``ray.put``; each batch then resolves matches with vectorized
``np.searchsorted`` per key group — no shuffle of the (large) left
side.

Partitioning assumption (documented per SURVEY §2): the right side is
the small/dimension side (its per-key index fits worker memory).  For
two large sides, range-partition BOTH by (key, time) with aligned
boundaries and run this same kernel per partition — the broadcast
becomes a partition-local index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def build_time_index(
    right: pd.DataFrame, key_col: str, ts_col: str
) -> dict[int, np.ndarray]:
    """{key → sorted int64-epoch-us timestamps} (duplicates kept).

    Keys must be an integer dtype — validated up front with a clear
    error (a float key would silently truncate through ``int()``, a
    string key would raise deep inside the exchange)."""
    if not pd.api.types.is_integer_dtype(right[key_col]):
        raise TypeError(
            f"asof/range join key {key_col!r} must be integer, got "
            f"{right[key_col].dtype} — cast or factorize keys upstream"
        )
    out: dict[int, np.ndarray] = {}
    ts = right[ts_col].astype("datetime64[us]").astype("int64")
    for key, g in ts.groupby(right[key_col].to_numpy()):
        out[int(key)] = np.sort(g.to_numpy())
    return out


def asof_join(
    left: ray.data.Dataset,
    right: pd.DataFrame,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    out_col: str = "matched_ts_us",
) -> ray.data.Dataset:
    """Inner as-of join: rows of ``left`` that have a right row with the
    same key and ``right_ts <= left_ts`` get ``out_col`` = the greatest
    such ``right_ts`` (epoch µs); unmatched rows are dropped (inner)."""
    index = build_time_index(right, right_key, right_ts)
    ref = ray.put(index)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        ts = df[left_ts].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[left_key].to_numpy()
        # separate boolean mask, NOT a -1 sentinel: pre-1970 right
        # timestamps are legitimate negative epoch-µs matches (ADVICE r1)
        matched = np.zeros(len(df), dtype=np.int64)
        hit = np.zeros(len(df), dtype=bool)
        order = np.argsort(keys, kind="stable")
        i = 0
        while i < len(order):
            j = i
            k = keys[order[i]]
            while j < len(order) and keys[order[j]] == k:
                j += 1
            dates = idx.get(int(k))
            if dates is not None:
                rows = order[i:j]
                pos = np.searchsorted(dates, ts[rows], side="right") - 1
                ok = pos >= 0
                matched[rows[ok]] = dates[pos[ok]]
                hit[rows[ok]] = True
            i = j
        df = df.assign(**{out_col: matched})
        return df[hit]

    return left.map_batches(match, batch_format="pandas")


def range_count_join(
    left: ray.data.Dataset,
    right: pd.DataFrame,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    window_us: int,
    out_col: str = "n_windows",
) -> ray.data.Dataset:
    """Range join (inner, counted): per left row, the number of right
    rows of the same key whose window ``[right_ts, right_ts+window)``
    covers ``left_ts``; rows with zero matches are dropped.

    Same broadcast-index kernel as :func:`asof_join` — membership
    counts come from two ``searchsorted`` probes per key group
    (start ∈ (ts-window, ts]), so the cost is O(log n_right) per row.
    """
    index = build_time_index(right, right_key, right_ts)
    ref = ray.put(index)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        ts = df[left_ts].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[left_key].to_numpy()
        counts = np.zeros(len(df), dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        i = 0
        while i < len(order):
            j = i
            k = keys[order[i]]
            while j < len(order) and keys[order[j]] == k:
                j += 1
            dates = idx.get(int(k))
            if dates is not None:
                rows = order[i:j]
                hi = np.searchsorted(dates, ts[rows], side="right")
                lo = np.searchsorted(dates, ts[rows] - window_us, side="right")
                counts[rows] = hi - lo
            i = j
        df = df.assign(**{out_col: counts})
        return df[df[out_col] > 0]

    return left.map_batches(match, batch_format="pandas")
