"""Tree-reduce keyed aggregation — the high-cardinality-groupby path.

Ray Data's sort-shuffle ``groupby().aggregate()`` pays a per-distinct-
key Python cost in the reduce (~1 ms/key in 2.49) — fine for hundreds
of groups, pathological for hundreds of thousands.  For **algebraic
aggregates** (sum/count/min/max — anything mergeable by re-applying the
same fold), a tree of whole-batch pandas combines gives the same exact
result with every stage vectorized:

    per-block partial → repartition(w₁) → combine → … → repartition(1)
    → final combine (one task, all keys co-located)

Measured 16.4 s → 0.8 s on a 15k-key aggregate at sf0.01.

Scale contract: the FINAL stage holds one row per distinct key in one
block — valid while distinct keys fit a worker's heap (hundreds of
millions of short rows).  Beyond that, shard the last level by key hash
(``widths`` ending in k > 1 plus a key-hash repartition) and consume
shard-wise, or fall back to the keyed-exchange ``groupby``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import ray.data


def tree_keyed_sum(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    sums: Sequence[str],
    *,
    widths: Sequence[int] = (4, 1),
) -> ray.data.Dataset:
    """Exact per-key sums of ``sums`` columns grouped by ``keys``.

    ``widths`` are the fan-in levels (default 4 → 1).  Input rows may
    already be partials — summing is idempotent over re-grouping.
    """
    keys = list(keys)
    sums = list(sums)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)[sums].sum()

    out = ds.map_batches(combine, batch_format="pandas")
    for w in widths:
        out = out.repartition(w).map_batches(
            combine, batch_format="pandas", batch_size=None
        )
    return out


def tree_keyed_agg(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: dict[str, str],
    *,
    widths: Sequence[int] = (4, 1),
) -> ray.data.Dataset:
    """Exact per-key algebraic aggregates (``{"col": "sum"|"max"|"min"}``)
    grouped by ``keys`` — the :func:`tree_keyed_sum` tree generalized to
    any fold that is idempotent over re-grouping (sum/max/min/count-as-
    sum all are; mean/nunique are NOT — decompose those into sums)."""
    keys = list(keys)
    for how in aggs.values():
        if how not in ("sum", "max", "min"):
            raise ValueError(f"non-mergeable agg {how!r}")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            **{c: (c, how) for c, how in aggs.items()}
        )

    out = ds.map_batches(combine, batch_format="pandas")
    for w in widths:
        out = out.repartition(w).map_batches(
            combine, batch_format="pandas", batch_size=None
        )
    return out


def tree_topk(
    ds: ray.data.Dataset,
    sort_cols: Sequence[str],
    ascending: Sequence[bool],
    k: int,
    *,
    widths: Sequence[int] = (4, 1),
) -> ray.data.Dataset:
    """Exact global top-k WITHOUT an all-to-all sort shuffle: top-k is
    mergeable (top-k of unioned top-k's == global top-k), so each block
    keeps only its k best rows and a small tree combines them — the
    data crossing the wire is ``k × n_blocks`` rows, not the dataset.
    ``sort_cols``/``ascending`` must produce a total order (include a
    unique tiebreak column) for run-to-run determinism."""
    sort_cols = list(sort_cols)
    ascending = list(ascending)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=ascending, kind="stable").head(k)

    out = ds.map_batches(head, batch_format="pandas")
    for w in widths:
        out = out.repartition(w).map_batches(
            head, batch_format="pandas", batch_size=None
        )
    return out


def keyed_topn(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    sort_cols: Sequence[str],
    ascending: Sequence[bool],
    n: int,
    *,
    rank_col: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key top-n — the distributed
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY sort_cols) <= n``
    window — WITHOUT a global sort shuffle.

    Per-key top-n is mergeable, so each input block first keeps only
    its n best rows per key (bounding the exchange to ``n`` rows per
    key per block), then a hash exchange co-locates each key and one
    vectorized pass takes the final top-n and stamps ``rank_col``
    (1-based, dense within key).  ``sort_cols`` must include a unique
    tiebreak column for run-to-run determinism — same contract as
    ``tree_topk``."""
    keys, sort_cols, ascending = list(keys), list(sort_cols), list(ascending)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable")
        return df.groupby(keys, sort=False).head(n)

    from valere_ocr_ray.ops.exchange import hash_exchange

    ex = hash_exchange(
        ds.map_batches(partial, batch_format="pandas"), keys, num_partitions
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable")
        out = df.groupby(keys, sort=False).head(n).copy()
        if rank_col is not None:
            out[rank_col] = (out.groupby(keys).cumcount() + 1).astype("int64")
        return out

    return ex.map_batches(final, batch_format="pandas", batch_size=None)
