"""Incremental keyed aggregation state — fold NEW data into a persisted
aggregate without recomputing history (the micro-batch / append-ingest
pattern: nightly shards arriving against a running per-key total).

State layout: ``state_dir/bucket=<b>/v<N>.parquet`` — key-hash buckets
(fixed modulus, recorded at creation) each holding that bucket's
current per-key sums, plus ``_state_meta.json`` mapping every bucket to
its committed version.  An update pre-aggregates the new shard per
block, hash-exchanges it on the state's own key (so each bucket's new
rows land in ONE task), merges bucket-by-bucket against the committed
version, writes ``v<N+1>`` via tmp+rename, and only then commits the
meta — the same data-then-manifest ordering as
``pipelines/extract.run_resumable`` (reference resume semantics: the
``ContinuationToken`` cursor loop,
``IDD/SearchingS3Buckets/S3searchFileContentByString.py:43-59``).  A
crash mid-update leaves the meta at
``v<N>``: rerunning the same shard regenerates identical ``v<N+1>``
files (merge inputs unchanged), so retries are idempotent and
half-written files are never visible to readers.

Scale shape: driver state is the meta dict (one int per bucket); the
merge is a vectorized concat+groupby per bucket; buckets untouched by
the shard are not rewritten.  Pick ``num_buckets`` so one bucket's keys
fit a worker — the same contract as any hash layout.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from valere_ocr_ray.ops.exchange import _key_hash, grouped_map


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_state_meta.json")


def _load_meta(state_dir: str) -> dict | None:
    try:
        with open(_meta_path(state_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _bucket_file(state_dir: str, bucket: int, version: int) -> str:
    return os.path.join(state_dir, f"bucket={bucket}", f"v{version}.parquet")


def update_keyed_state(
    state_dir: str,
    new_ds: ray.data.Dataset,
    keys: Sequence[str],
    sums: Sequence[str],
    *,
    num_buckets: int = 16,
) -> dict:
    """Fold ``new_ds`` into the persisted per-key sums under
    ``state_dir`` (created on first call; afterwards ``keys``/``sums``/
    ``num_buckets`` must match the recorded schema).  Returns a summary
    ``{version, n_buckets_updated, n_keys_updated}``."""
    keys, sums = list(keys), list(sums)
    meta = _load_meta(state_dir)
    if meta is None:
        meta = {
            "keys": keys,
            "sums": sums,
            "num_buckets": num_buckets,
            "version": 0,
            "buckets": {},  # bucket id (str) -> committed version
        }
        os.makedirs(state_dir, exist_ok=True)
    else:
        if meta["keys"] != keys or meta["sums"] != sums:
            raise ValueError(
                f"state schema mismatch: {meta['keys']}/{meta['sums']} "
                f"!= {keys}/{sums}"
            )
        num_buckets = meta["num_buckets"]
    vnext = meta["version"] + 1
    committed = dict(meta["buckets"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(keys, as_index=False)[sums].sum()
        tbl = pa.Table.from_pandas(agg[keys], preserve_index=False)
        agg["__bucket"] = (
            _key_hash(tbl, keys) % np.uint64(num_buckets)
        ).astype("int64")
        return agg

    pre_ds = new_ds.map_batches(pre, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "n_keys": pd.Series([], dtype="int64"),
                }
            )
        b = int(g["__bucket"].iloc[0])
        parts = [g[keys + sums]]
        cur_v = committed.get(str(b))
        if cur_v is not None:
            parts.append(
                pq.read_table(_bucket_file(state_dir, b, cur_v)).to_pandas()
            )
        merged = (
            pd.concat(parts, ignore_index=True)
            .groupby(keys, as_index=False)[sums]
            .sum()
            .sort_values(keys, kind="mergesort")
        )
        out = _bucket_file(state_dir, b, vnext)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
        os.replace(tmp, out)  # atomic: readers never see partial files
        return pd.DataFrame({"bucket": [b], "n_keys": [len(merged)]})

    summary = (
        grouped_map(pre_ds, ["__bucket"], merge, num_partitions=num_buckets)
        .to_pandas()
    )

    # data is durable — NOW commit the meta (crash before this line
    # leaves the previous version visible; rerun regenerates v{next})
    for b in summary["bucket"]:
        meta["buckets"][str(int(b))] = vnext
    meta["version"] = vnext
    tmp = _meta_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _meta_path(state_dir))
    return {
        "version": vnext,
        "n_buckets_updated": int(len(summary)),
        "n_keys_updated": int(summary["n_keys"].sum()) if len(summary) else 0,
    }


def read_state(state_dir: str) -> ray.data.Dataset:
    """The current committed aggregate as a Dataset (only each bucket's
    committed version is visible — in-flight updates never leak)."""
    meta = _load_meta(state_dir)
    if meta is None:
        raise FileNotFoundError(f"no state at {state_dir}")
    files = [
        _bucket_file(state_dir, int(b), v) for b, v in meta["buckets"].items()
    ]
    if not files:
        raise FileNotFoundError(f"state at {state_dir} is empty")
    # select the state schema explicitly: the bucket=<b> path component
    # would otherwise be inferred as a Hive partition column
    return ray.data.read_parquet(files).select_columns(
        meta["keys"] + meta["sums"]
    )


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the maintenance op every long-running
    ingest needs: re-emit a parquet directory as files of
    ``target_rows_per_file`` rows (order-preserving within the scan,
    no shuffle — ``Dataset.repartition(target_num_rows_per_block=…)``
    is a streaming coalesce, not an all-to-all).  Returns
    ``{n_rows, n_files_in, n_files_out}``."""
    import glob

    n_in = len(glob.glob(os.path.join(in_dir, "**", "*.parquet"), recursive=True))
    ds = ray.data.read_parquet(in_dir)
    n_rows = ds.count()
    ds = ray.data.read_parquet(in_dir).repartition(
        target_num_rows_per_block=target_rows_per_file
    )
    ds.write_parquet(out_dir)
    n_out = len(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True))
    return {"n_rows": n_rows, "n_files_in": n_in, "n_files_out": n_out}
