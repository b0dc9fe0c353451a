"""Scale receipt for the size-derived exchange width (VERDICT r4 item 1).

Synthesizes N keyed rows (~100 B/row, counter-based — never on the
driver), then runs ``grouped_sum`` with the DEFAULT width and reports
what ``_auto_partitions`` derived alongside correctness vs a local
recompute of the same deterministic formula.  The point of the
receipt: the width tracks the bytes the exchange actually MOVES — for
``grouped_sum`` that is the post-partial-aggregation tables, so a
well-combined aggregate stays narrow however large the raw input,
while high-cardinality exchanged data widens until each gather holds
≤ TARGET_PARTITION_BYTES — same caller code, no hand-tuned constant
(``auto_partitions_for_bytes`` shows what the RAW input would derive,
for contrast).

Run:  python tools/exchange_scale.py [n_rows ...]   (default 1e6 3e7)
Prints one JSON line per N; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_KEYS = 1_000_000


def _cols(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from valere_ocr_ray.ops.exchange import _mix64

    h = _mix64(idx.astype(np.int64).view(np.uint64))
    keys = (h % np.uint64(N_KEYS)).astype(np.int64)
    vals = ((h >> np.uint64(32)) % np.uint64(1000)).astype(np.int64)
    return keys, vals


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 30_000_000]
    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    rd.DataContext.get_current().enable_progress_bars = False

    from valere_ocr_ray.ops.exchange import (
        _auto_partitions,
        grouped_sum,
    )

    for n in ns:
        def gen(b: pa.Table) -> pd.DataFrame:
            idx = b["id"].to_numpy()
            k, v = _cols(idx)
            # ~64 B of string padding per row so bytes, not row count,
            # drive the derived width (the real corpus shape)
            pad = pd.Series(k % 97).astype(str).str.pad(64, fillchar="x")
            return pd.DataFrame({"k": k, "v": v, "pad": pad})

        base = rd.range(n).map_batches(gen, batch_format="pandas")
        t0 = time.perf_counter()
        out = grouped_sum(base, ["k"], ["v"])  # DEFAULT width
        got = out.to_pandas()
        wall = time.perf_counter() - t0
        derived = len(out.to_arrow_refs())

        # local exactness recompute of the same deterministic formula
        total = 0
        for lo in range(0, n, 5_000_000):
            idx = np.arange(lo, min(lo + 5_000_000, n))
            _, v = _cols(idx)
            total += int(v.sum())
        approx_bytes = n * 100
        print(
            json.dumps(
                {
                    "metric": "size-derived exchange width receipt",
                    "n_rows": n,
                    "approx_input_bytes": approx_bytes,
                    "derived_partitions": derived,
                    "auto_partitions_for_bytes": _auto_partitions(approx_bytes),
                    "wall_sec": round(wall, 2),
                    "rows_per_sec": round(n / wall, 1),
                    "n_keys_out": int(len(got)),
                    "sum_exact": bool(int(got["v"].sum()) == total),
                }
            ),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
