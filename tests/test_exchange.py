"""Custom hash exchange (ops/exchange.py): key co-location, exactness
vs pandas, determinism across partition counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from valere_ocr_ray.ops.exchange import grouped_map, grouped_sum, hash_exchange


@pytest.fixture()
def keyed_df():
    n = 30000
    return pd.DataFrame(
        {
            "k": (np.arange(n) * 2654435761) % 4000,
            "s": [f"g{(i * 7) % 11}" for i in range(n)],
            "v": np.arange(n, dtype="int64") % 1000,
        }
    )


def test_exchange_colocates_keys(ray_session, keyed_df):
    ds = rd.from_pandas(keyed_df).repartition(9)
    ex = hash_exchange(ds, ["k"], 8)
    seen = {}
    for i, ref in enumerate(ex.to_arrow_refs()):
        import ray as _ray

        t = _ray.get(ref)
        for k in set(t["k"].to_pylist()):
            assert k not in seen, f"key {k} in partitions {seen[k]} and {i}"
            seen[k] = i
    assert len(seen) == keyed_df["k"].nunique()
    # nothing lost
    assert ex.count() == len(keyed_df)


def test_grouped_sum_exact(ray_session, keyed_df):
    ds = rd.from_pandas(keyed_df).repartition(7)
    got = (
        grouped_sum(ds, ["k"], ["v"], num_partitions=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        keyed_df.groupby("k", as_index=False)[["v"]]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_sum_string_keys(ray_session, keyed_df):
    ds = rd.from_pandas(keyed_df).repartition(5)
    got = (
        grouped_sum(ds, ["s"], ["v"], num_partitions=4)
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    want = (
        keyed_df.groupby("s", as_index=False)[["v"]]
        .sum()
        .sort_values("s")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_map_semantics_and_partition_invariance(ray_session, keyed_df):
    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["v", "s"], ascending=[False, True]).head(2)[
            ["k", "s", "v"]
        ]

    ds = rd.from_pandas(keyed_df).repartition(6)
    a = (
        grouped_map(ds, ["k"], top2, num_partitions=8)
        .to_pandas()
        .sort_values(["k", "s", "v"])
        .reset_index(drop=True)
    )
    b = (
        grouped_map(ds, ["k"], top2, num_partitions=3)
        .to_pandas()
        .sort_values(["k", "s", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    want = (
        keyed_df.groupby("k", group_keys=False)
        .apply(top2)
        .sort_values(["k", "s", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, want, check_dtype=False)


def test_single_partition_path(ray_session, keyed_df):
    ds = rd.from_pandas(keyed_df.head(100)).repartition(3)
    got = grouped_sum(ds, ["k"], ["v"], num_partitions=1).to_pandas()
    want = keyed_df.head(100).groupby("k", as_index=False)[["v"]].sum()
    assert got.sort_values("k")["v"].tolist() == want.sort_values("k")["v"].tolist()


def test_grouped_sum_fuzz_matches_pandas(ray_session):
    """Property fuzz: grouped_sum == pandas groupby-sum for arbitrary
    int/string keys (negatives, unicode, empty) and partition counts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        keys=st.lists(
            st.one_of(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.text(min_size=0, max_size=6),
            ),
            min_size=0,
            max_size=200,
        ),
        nparts=st.integers(min_value=1, max_value=5),
        nblocks=st.integers(min_value=1, max_value=4),
    )
    def check(keys, nparts, nblocks):
        # homogeneous key dtype per draw (mixed int/str columns are not
        # a supported Arrow schema)
        keys = [str(k) for k in keys] if any(isinstance(k, str) for k in keys) else keys
        df = pd.DataFrame({"k": pd.Series(keys), "v": np.arange(len(keys), dtype="int64")})
        if df.empty:
            return
        ds = rd.from_pandas(df).repartition(nblocks)
        got = (
            grouped_sum(ds, ["k"], ["v"], num_partitions=nparts)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            df.groupby("k", as_index=False)[["v"]]
            .sum()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()


def test_exchange_tolerates_schema_drift(ray_session):
    """One block whose pandas-inferred dtype diverges (all-null string
    column -> Arrow null type; int -> float) must not fail the gather:
    parts are cast to the canonical probed schema."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from valere_ocr_ray.ops.exchange import hash_exchange

    good = pd.DataFrame({"k": [1, 2, 3], "v": [1, 2, 3], "s": ["a", "b", "c"]})
    drifted = pd.DataFrame(
        {"k": [4, 5], "v": np.array([4.0, 5.0]), "s": pd.Series([None, None])}
    )
    ds = rd.from_pandas([good, drifted])
    out = hash_exchange(ds, ["k"], 4).to_pandas()
    assert len(out) == 5
    assert sorted(out["k"].tolist()) == [1, 2, 3, 4, 5]


def test_exchange_property_random_frames(ray_session):
    """Property check: for randomized frames (skewed keys, negatives,
    empty groups, many partitions), grouped_sum / grouped_agg-min over
    the exchange equal a plain pandas groupby, and hash_exchange
    partitions every key into exactly one block."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from valere_ocr_ray.ops.exchange import grouped_agg, grouped_sum, hash_exchange

    rng = np.random.default_rng(1234)
    for trial in range(5):
        n = int(rng.integers(1, 2000))
        nkeys = int(rng.integers(1, 200))
        df = pd.DataFrame(
            {
                "k": rng.integers(-nkeys, nkeys, n).astype("int64"),
                "v": rng.integers(-10**9, 10**9, n).astype("int64"),
                "w": rng.integers(0, 100, n).astype("int64"),
            }
        )
        nblocks = int(rng.integers(1, 9))
        npart = int(rng.integers(2, 17))
        parts = np.array_split(df, nblocks)
        ds = rd.from_pandas([p.reset_index(drop=True) for p in parts])

        want = df.groupby("k", as_index=False)[["v", "w"]].sum()
        got = (
            grouped_sum(ds, ["k"], ["v", "w"], num_partitions=npart)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want.sort_values("k").reset_index(drop=True), obj=f"sum t{trial}"
        )

        want_min = df.groupby("k", as_index=False)[["v"]].min()
        got_min = (
            grouped_agg(ds.select_columns(["k", "v"]), ["k"], ["v"], how="min",
                        num_partitions=npart)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got_min, want_min.sort_values("k").reset_index(drop=True),
            obj=f"min t{trial}",
        )

        # every key lives in exactly ONE exchange block
        ex_blocks = [
            b.to_pandas()
            for b in hash_exchange(ds, ["k"], npart).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        ]
        seen = {}
        for bi, b in enumerate(ex_blocks):
            for key in b["k"].unique():
                assert seen.setdefault(int(key), bi) == bi
        assert sum(len(b) for b in ex_blocks) == n


def test_auto_partitions_size_derived(ray_session):
    """Default (num_partitions=None) width derives from input bytes:
    tiny inputs stay narrow, big inputs get ceil(bytes/128MiB), capped
    (VERDICT r4: a fixed default holds corpus/16 per gather at 100x)."""
    from valere_ocr_ray.ops.exchange import (
        MAX_PARTITIONS,
        TARGET_PARTITION_BYTES,
        _auto_partitions,
    )

    assert _auto_partitions(0) == 2
    assert _auto_partitions(10_000) == 2  # toy input → no fan-out
    big = 64 * TARGET_PARTITION_BYTES
    assert _auto_partitions(big) == 64  # scale: one target-size gather each
    assert _auto_partitions(10**15) == MAX_PARTITIONS  # documented backstop
    # medium inputs widen toward the CPU count but keep >= ~8 MiB each
    med = _auto_partitions(40 * 2**20)
    assert 2 <= med <= 5


def test_default_width_exchange_matches_explicit(ray_session, keyed_df):
    ds = rd.from_pandas(keyed_df).repartition(6)
    want = (
        grouped_sum(ds, ["k"], ["v"], num_partitions=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    got = (
        grouped_sum(ds, ["k"], ["v"])  # size-derived default
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
