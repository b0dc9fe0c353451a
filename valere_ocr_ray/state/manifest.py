"""Per-partition completion manifests — the resume/checkpoint state.

The reference's "resume" is a hand-edited index skip
(``IDD/finalcodes/Prescription2.py:80-82``); here a partition (one
input shard file) is complete iff ``_done/<part_id>.json`` exists, and
the manifest doubles as the partition's lineage record (row counts by
status, bytes in, wall seconds, engine version — SURVEY.md §1.2
``lineage`` table).  Write order is data → fsync → manifest (atomic
rename), so a crash between them leaves the partition pending and a
rerun redoes it after clearing the partial output (SURVEY.md §7.4.5).
"""

from __future__ import annotations

import json
import os

from valere_ocr_ray import __version__

DONE_DIR = "_done"


def done_manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, DONE_DIR, f"{part_id}.json")


def write_manifest(out_dir: str, part_id: str, record: dict) -> None:
    os.makedirs(os.path.join(out_dir, DONE_DIR), exist_ok=True)
    path = done_manifest_path(out_dir, part_id)
    record = {"part_id": part_id, "engine_version": __version__, **record}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(out_dir: str, part_id: str) -> dict | None:
    path = done_manifest_path(out_dir, part_id)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def pending_shards(out_dir: str, part_ids: list[str]) -> list[str]:
    """Partitions with no completion manifest (in input order)."""
    return [p for p in part_ids if read_manifest(out_dir, p) is None]


def write_run_summary(out_dir: str) -> dict:
    """Aggregate all partition manifests into ``_summary.json`` — the
    reference's ``processing_summary.json`` analog
    (``Ethan_PDFandJPG3.py:716-725``), derived from lineage instead of
    driver-local counters.  Idempotent; call after any run."""
    manifests = read_all_manifests(out_dir)
    summary = {
        "n_partitions": len(manifests),
        "n_in": sum(m.get("n_in", 0) for m in manifests),
        "n_ok": sum(m.get("n_ok", 0) for m in manifests),
        "n_error": sum(m.get("n_error", 0) for m in manifests),
        "n_skipped": sum(m.get("n_skipped", 0) for m in manifests),
        "bytes_in": sum(m.get("bytes_in", 0) for m in manifests),
        "n_quarantined": len(read_quarantine(out_dir)),
        "engine_version": __version__,
    }
    path = os.path.join(out_dir, "_summary.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return summary


QUARANTINE_DIR = "_quarantine"


def write_quarantine(out_dir: str, part_id: str, error: str) -> None:
    """Poison-shard record: the shard is excluded from later runs until
    its marker is deleted (manual operator action by design)."""
    qdir = os.path.join(out_dir, QUARANTINE_DIR)
    os.makedirs(qdir, exist_ok=True)
    path = os.path.join(qdir, f"{part_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"part_id": part_id, "error": error, "engine_version": __version__},
            f,
            indent=2,
            sort_keys=True,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_quarantine(out_dir: str) -> list[str]:
    qdir = os.path.join(out_dir, QUARANTINE_DIR)
    if not os.path.isdir(qdir):
        return []
    return sorted(
        os.path.splitext(n)[0] for n in os.listdir(qdir) if n.endswith(".json")
    )


def read_all_manifests(out_dir: str) -> list[dict]:
    done = os.path.join(out_dir, DONE_DIR)
    if not os.path.isdir(done):
        return []
    out = []
    for name in sorted(os.listdir(done)):
        if name.endswith(".json"):
            with open(os.path.join(done, name)) as f:
                out.append(json.load(f))
    return out
