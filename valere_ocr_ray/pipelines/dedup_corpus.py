"""The canonical training-data composition: extract → dedup → corpus.

One streaming flow over a ``pages`` directory producing a deduplicated
text corpus with full provenance — the pipeline a 100 TB web-text
curation run actually executes:

1. extraction (``build_extraction_ds``): html/pdf → ``extracted_text``,
   ``content_hash``, ``url_hash`` (+ status routing);
2. **exact dedup** (O4): keep rows whose ``url_hash`` is the minimum of
   their ``content_hash`` group — one keyed aggregate builds the
   (small) canonical-hash map, broadcast via ``ray.put`` for the
   filter, so the full text never shuffles;
3. **near dedup**: MinHash-LSH star pairs over the surviving texts →
   union-find clusters (driver-side fold over the linear pair list) →
   broadcast cluster map; each row gets ``cluster_rep`` (its own
   ``url_hash`` when unclustered) and ``is_canonical`` (it IS the rep);
4. write the corpus partitioned by input shard; non-canonical rows are
   kept with flags, not dropped — downstream decides (flag-don't-drop,
   same principle as the status columns).

Determinism: every step is a pure function of the input corpus (seeded
hashes, min-based tie-breaks), so reruns are byte-identical.

Partitioning notes at scale: step 2's aggregate moves (hash, url_hash)
pairs only; step 3's pair list is linear in docs (star mode).  The one
driver-side structure is the cluster map — proportional to *duplicate*
docs, not corpus size; for adversarial duplicate rates shard it by
hash range and repeat per shard.
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
    extracted = build_extraction_ds(pages_dir)
    ok = extracted.filter(expr="status == 'ok'").select_columns(
        ["url", "url_hash", "content_hash", "doc_type", "extracted_text"]
    )
    # the extracted subplan feeds THREE consumers (canonical-hash
    # aggregate, pair mining, final annotate) and Ray re-executes lazy
    # DAGs per consumer — materialize once (extracted text only, object
    # store + spill).  At 100 TB, point this pipeline at the flagship
    # run's written parquet instead of re-extracting: the same flow
    # minus this materialize.
    ok = ok.materialize()

    # --- exact dedup: canonical url_hash per content_hash (hash-
    # exchange keyed min — content_hash cardinality ≈ corpus size —
    # then broadcast map; texts stay where they are)
    from valere_ocr_ray.ops.exchange import grouped_agg

    canon = grouped_agg(
        ok.select_columns(["content_hash", "url_hash"]),
        ["content_hash"],
        ["url_hash"],
        how="min",
        num_partitions=8,
    )
    canon_map = {r["content_hash"]: r["url_hash"] for r in canon.take_all()}
    canon_ref = ray.put(canon_map)

    def keep_exact_canonical(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(canon_ref)
        keep = df["content_hash"].map(m) == df["url_hash"]
        return df[keep]

    uniq = ok.map_batches(keep_exact_canonical, batch_format="pandas")

    # --- near dedup: star pairs over surviving texts → union-find →
    # broadcast cluster map
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
    plist = [
        (int(r["id_a"]), int(r["id_b"]))
        for r in pairs.select_columns(["id_a", "id_b"]).take_all()
    ]
    clusters = dedup.connected_components(plist)
    cluster_ref = ray.put(clusters)

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
