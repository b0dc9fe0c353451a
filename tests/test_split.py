"""Leakage-safe holdout splitting (ops/split): duplicate co-location,
threshold monotonicity, salt independence, partition invariance."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_with_dupes():
    import ray.data as rd

    from valere_ocr_ray.pipelines.queries import _plant_dupes

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda df: df.assign(text=_plant_dupes(df)), batch_format="pandas"
    )


def test_exact_dupes_never_straddle(ray_session):
    """Every group of byte-identical texts lands entirely on one side —
    the defining guarantee (id-hash splits violate it by design)."""
    from valere_ocr_ray.ops.split import holdout_split

    out = holdout_split(
        _docs_with_dupes(), holdout_rate=0.3, salt="s"
    ).to_pandas()
    sides_per_text = out.groupby("text")["split"].nunique()
    assert (sides_per_text == 1).all()
    # non-vacuous: the planted dupes create multi-doc groups
    assert (out.groupby("text")["doc_id"].size() > 1).any()
    # and both sides are populated at a 30% rate over 500 docs
    assert set(out["split"].unique()) == {"holdout", "train"}


def test_rate_and_monotonicity(ray_session):
    """The realized rate tracks the requested one, and a smaller
    holdout is a strict subset of a larger one (threshold semantics)."""
    from valere_ocr_ray.ops.split import holdout_split

    docs = _docs_with_dupes()
    small = holdout_split(docs, holdout_rate=0.05, salt="s").to_pandas()
    big = holdout_split(docs, holdout_rate=0.25, salt="s").to_pandas()
    ids_small = set(small.loc[small["split"] == "holdout", "doc_id"])
    ids_big = set(big.loc[big["split"] == "holdout", "doc_id"])
    assert ids_small <= ids_big
    frac = len(ids_big) / len(big)
    assert 0.15 < frac < 0.35  # 500 docs, binomial-ish tolerance


def test_salt_independence_and_determinism(ray_session):
    from valere_ocr_ray.ops.split import holdout_split

    docs = _docs_with_dupes()
    a = holdout_split(docs, holdout_rate=0.2, salt="a").to_pandas()
    a2 = holdout_split(docs, holdout_rate=0.2, salt="a").to_pandas()
    b = holdout_split(docs, holdout_rate=0.2, salt="b").to_pandas()
    key = lambda df: df.sort_values("doc_id")["split"].tolist()
    assert key(a) == key(a2)  # deterministic
    assert key(a) != key(b)  # independent draw per salt


def test_partition_invariance(ray_session):
    from valere_ocr_ray.ops.split import holdout_split

    docs = _docs_with_dupes()
    one = holdout_split(docs.repartition(1), holdout_rate=0.1, salt="s")
    many = holdout_split(docs.repartition(13), holdout_rate=0.1, salt="s")
    key = lambda ds: ds.to_pandas().sort_values("doc_id")["split"].tolist()
    assert key(one) == key(many)


def test_by_key_clusters_colocate(ray_session):
    """holdout_split_by_key: all rows sharing the key share the side —
    driven with a synthetic cluster column with known collisions."""
    import ray.data as rd

    from valere_ocr_ray.ops.split import holdout_split_by_key

    df = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64), "grp": np.arange(200) % 17}
    )
    out = holdout_split_by_key(
        rd.from_pandas(df).repartition(7),
        key_col="grp",
        holdout_rate=0.4,
        salt="k",
    ).to_pandas()
    assert (out.groupby("grp")["split"].nunique() == 1).all()
    assert set(out["split"].unique()) == {"holdout", "train"}


def test_neardup_split_clusters_colocate(ray_session):
    """The composed near-dup-safe split: every verified near-dup pair's
    endpoints land on the same side."""
    from valere_ocr_ray.pipelines.queries import (
        doc_holdout_neardup,
        doc_near_dup_verified,
    )

    split = doc_holdout_neardup(SF).to_pandas().set_index("doc_id")["split"]
    pairs = doc_near_dup_verified(SF).to_pandas()
    assert len(pairs), "fixture corpus must contain near-dup pairs"
    same = split.loc[pairs["id_a"]].to_numpy() == split.loc[pairs["id_b"]].to_numpy()
    assert same.all()
