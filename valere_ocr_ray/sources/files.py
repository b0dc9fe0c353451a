"""Raw-file source: a directory of loose html/pdf/image files →
``pages``-shaped Dataset.

This is the engine analog of the reference's ACTUAL input shape — an
S3 bucket of loose objects enumerated with paginated listings
(``IDD/finalcodes/InsuranceCard1.py:43-46`` "page 1: 0-999, page 2:
1000-1999"; per-object ``get_object`` bytes fetch,
``InsuranceCard2.py:36-62``).  ``ray.data.read_binary_files`` performs
the listing + fetch as parallel tasks, and an adaptor batch maps the
raw bytes onto the canonical ``pages(url, warc_ts, html, text, lang)``
schema, so the extraction pipeline is source-agnostic (same contract
as the parquet and WARC sources).

Determinism: ``warc_ts`` is taken from the file's mtime when
``use_mtime=True`` (lineage-faithful) or pinned to epoch 0 (default —
byte-identical reruns regardless of filesystem state; the reference
has no timestamp semantics for its objects).

Resume: ``convert_file_dir`` writes pages-parquet shards of
``shard_size`` files each (deterministic order), after which
``run_resumable`` treats every shard as a normal resume partition —
the same pattern as ``sources/warc.convert_warc_dir``.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from valere_ocr_ray.sources.warc import PAGES_SCHEMA


def _pages_table(paths: list[str], payloads: list[bytes], *, use_mtime: bool) -> pa.Table:
    ts = [
        int(os.path.getmtime(p) * 1_000_000) if use_mtime else 0 for p in paths
    ]
    return pa.table(
        {
            "url": pa.array([f"file://{p}" for p in paths], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * len(paths), pa.string()),
            "lang": pa.array([""] * len(paths), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def read_file_dir(
    input_dir: str, *, use_mtime: bool = False
) -> ray.data.Dataset:
    """Lazy pages-shaped Dataset over every file under ``input_dir``
    (recursive).  Listing + byte fetch run as parallel Ray tasks."""
    ds = ray.data.read_binary_files(input_dir, include_paths=True)

    def adapt(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        payloads = [
            v.as_buffer().to_pybytes() if v.is_valid else b""
            for v in batch["bytes"].combine_chunks()
        ]
        return _pages_table(paths, payloads, use_mtime=use_mtime)

    return ds.map_batches(adapt, batch_format="pyarrow")


def convert_file_dir(
    input_dir: str,
    out_dir: str,
    *,
    shard_size: int = 1000,
    use_mtime: bool = False,
) -> list[str]:
    """Deterministically shard a raw-file directory into pages-parquet
    (``shard_size`` files per shard, path-sorted) so ``run_resumable``
    can treat each shard as a resume partition.  Returns shard paths."""
    files = sorted(
        p
        for p in glob.glob(os.path.join(input_dir, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )
    os.makedirs(out_dir, exist_ok=True)
    shards: list[str] = []
    for si in range(0, len(files), shard_size):
        chunk = files[si : si + shard_size]
        payloads = [open(p, "rb").read() for p in chunk]
        table = _pages_table(chunk, payloads, use_mtime=use_mtime)
        shard_path = os.path.join(out_dir, f"files_{si // shard_size:05d}.parquet")
        pq.write_table(table, shard_path)
        shards.append(shard_path)
    return shards
