"""Distributed semi / anti / inner equi-joins on the two-sided hash
exchange (``ops/exchange.cogroup_exchange``).

Scale shape: both sides are hash-partitioned ONCE by their join key —
equal keys land in the same partition index on both sides — and each
partition pair resolves membership / matches with vectorized pandas
kernels.  Nothing is broadcast, so BOTH sides may grow with the
corpus (the broadcast-join variants in ``pipelines/queries.py`` stay
the right choice when one side is provably small).

Semi/anti additionally prune the right side to its distinct keys
per block BEFORE the exchange, so the right-side bytes crossing the
wire are one row per distinct key per block, not the table.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from valere_ocr_ray.ops.exchange import cogroup_exchange


def semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str | None = None,
    *,
    anti: bool = False,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Rows of ``left`` whose ``left_key`` appears (``anti=False``) or
    does not appear (``anti=True``) in ``right[right_key]`` — the
    EXISTS / NOT EXISTS join, output columns = left's columns."""
    right_key = right_key or left_key
    keys_only = right.select_columns([right_key]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )

    def fold(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l):
            return l
        present = l[left_key].isin(r[right_key].to_numpy() if len(r) else [])
        return l[~present] if anti else l[present]

    return cogroup_exchange(
        left, keys_only, [left_key], [right_key], fold,
        num_partitions=num_partitions,
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str | None = None,
    *,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Inner equi-join with BOTH sides exchanged (the two-large-sides
    path).  Column collisions resolve pandas-style with ``_r`` suffixed
    on the right."""
    right_key = right_key or left_key

    def fold(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            probe = l.merge(
                r.iloc[0:0], left_on=left_key, right_on=right_key,
                suffixes=("", "_r"),
            )
            return probe.iloc[0:0]
        return l.merge(r, left_on=left_key, right_on=right_key, suffixes=("", "_r"))

    return cogroup_exchange(
        left, right, [left_key], [right_key], fold,
        num_partitions=num_partitions,
    )


def distinct_set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    right_cols: list[str] | None = None,
    *,
    op: str = "intersect",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) on the
    cogroup exchange: both sides hash-partitioned by the full column
    tuple, each partition pair resolved with one vectorized merge.
    Output columns = ``cols`` (left names), one row per distinct tuple.
    Scale shape: both sides pre-deduplicate per block before the
    exchange, so wire bytes are bounded by distinct tuples per block."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unsupported op={op!r}")
    rcols = right_cols or cols
    l_keys = left.select_columns(cols).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    r_keys = right.select_columns(rcols).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )

    def fold(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l2 = l.drop_duplicates()
        if not len(l2):
            return l2
        m = l2.merge(
            r.drop_duplicates(), left_on=cols, right_on=rcols,
            how="left", indicator=True,
        )
        keep = m["_merge"] == ("both" if op == "intersect" else "left_only")
        return m.loc[keep, cols]

    return cogroup_exchange(
        l_keys, r_keys, cols, rcols, fold, num_partitions=num_partitions
    )
