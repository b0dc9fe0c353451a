"""The canonical training-data composition: extract → dedup → corpus.

One streaming flow over a ``pages`` directory producing a deduplicated
text corpus with full provenance — the pipeline a 100 TB web-text
curation run actually executes:

1. extraction (``build_extraction_ds``): html/pdf → ``extracted_text``,
   ``content_hash``, ``url_hash`` (+ status routing);
2. **exact dedup** (O4): ONE hash exchange keyed by ``content_hash``
   co-locates each content group, then a vectorized in-block
   ``transform('min')`` keeps exactly the rows whose ``url_hash`` is
   the group minimum — **zero driver state** (round 1 broadcast a
   corpus-sized canonical map; this is its scale-safe replacement);
3. **near dedup**: MinHash-LSH star pairs over the surviving texts →
   **distributed min-label propagation** (``ops/dedup.cluster_labels``,
   hash-exchange rounds — no driver-side pair list) → cluster labels;
   each row gets ``cluster_rep`` (its own ``url_hash`` when
   unclustered) and ``is_canonical`` (it IS the rep);
4. write the corpus partitioned by input shard; non-canonical rows are
   kept with flags, not dropped — downstream decides (flag-don't-drop,
   same principle as the status columns).

Determinism: every step is a pure function of the input corpus (seeded
hashes, min-based tie-breaks), so reruns are byte-identical.

Partitioning notes at scale: step 2 is the classic dedup shuffle — the
corpus crosses the exchange exactly once, keyed by content hash (the
same movement any hash-partitioned dedup performs; no broadcast, no
driver materialization).  Step 3's pair list is linear in duplicate
docs (star mode) and its clustering state lives in exchanged blocks.
The ONE remaining broadcast is the final cluster-label map —
proportional to *duplicate* docs (docs appearing in ≥1 verified pair),
not corpus size; if even that outgrows worker memory (adversarial
duplicate rates), replace the broadcast with a second
``content``-style exchange of ``(url_hash ∪ label rows)`` keyed by
``url_hash`` and annotate in-block.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from valere_ocr_ray.ops import dedup
from valere_ocr_ray.pipelines.extract import build_extraction_ds


def build_dedup_corpus_ds(
    pages_dir: str,
    *,
    minhash_threshold: float = 0.8,
    num_perm: int = 64,
) -> ray.data.Dataset:
    """Lazy Dataset of the deduplicated corpus rows (see module doc)."""
    from valere_ocr_ray.ops.exchange import hash_exchange

    extracted = build_extraction_ds(pages_dir)
    ok = extracted.filter(expr="status == 'ok'").select_columns(
        ["url", "url_hash", "content_hash", "doc_type", "extracted_text"]
    )

    # --- exact dedup on the exchange: co-locate each content_hash
    # group, keep the min-url_hash row per group.  The exchange is the
    # pipeline's one barrier (it materializes the extracted rows into
    # the object store); downstream consumers re-read those refs, so
    # extraction runs exactly once.
    ex = hash_exchange(ok, ["content_hash"], 16)

    def keep_exact_canonical(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        is_min = (
            df.groupby("content_hash")["url_hash"].transform("min")
            == df["url_hash"]
        )
        return df[is_min]

    uniq = ex.map_batches(
        keep_exact_canonical, batch_format="pandas", batch_size=None
    )

    # --- near dedup: star pairs over surviving texts → distributed
    # min-label propagation → cluster-label map (O(duplicate docs))
    def as_pair_input(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["url_hash"],
                "text": b["extracted_text"].cast(pa.string()),
            }
        )

    pairs = dedup.minhash_lsh_pairs(
        uniq.map_batches(as_pair_input, batch_format="pyarrow"),
        threshold=minhash_threshold,
        num_perm=num_perm,
        star=True,
    )
    labels = dedup.cluster_labels(pairs, num_partitions=8)
    # broadcast contract: |labels| = docs in ≥1 verified pair — the
    # duplicate subset, NOT the corpus (see module doc for the
    # exchange-based fallback if that ever outgrows worker memory)
    cluster_map = {
        int(r["doc_id"]): int(r["cluster"]) for r in labels.take_all()
    }
    cluster_ref = ray.put(cluster_map)

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(cluster_ref)
        rep = df["url_hash"].map(lambda h: cm.get(h, h)).astype("int64")
        df = df.assign(cluster_rep=rep, is_canonical=rep == df["url_hash"])
        return df

    return uniq.map_batches(annotate, batch_format="pandas")


def run_dedup_corpus(pages_dir: str, out_dir: str, **kwargs) -> dict:
    """Execute and write ``out_dir/*.parquet``; returns counts."""
    ds = build_dedup_corpus_ds(pages_dir, **kwargs)
    ds.write_parquet(out_dir)
    import pyarrow.dataset as pads

    tbl = pads.dataset(out_dir).to_table(columns=["is_canonical"])
    n = tbl.num_rows
    n_canon = sum(1 for v in tbl["is_canonical"].to_pylist() if v)
    return {"n_rows": n, "n_canonical": n_canon, "n_near_dup": n - n_canon}
