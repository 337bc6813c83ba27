"""Generic scalable primitives (ops.py) vs in-memory references."""

import pandas as pd
import pyarrow as pa


def test_dedup_exact(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import dedup_exact

    tbl = pa.table({"url": [f"u{i % 37}" for i in range(500)], "v": list(range(500))})
    out = dedup_exact(rd.from_arrow(tbl), "url", n_buckets=8).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(37))


def test_dedup_exact_first(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import dedup_exact_first

    df = pd.DataFrame({"k": ["a", "b", "a", "b", "c"], "ord": [5, 2, 1, 9, 3]})
    out = dedup_exact_first(rd.from_pandas(df), "k", "ord", n_buckets=4).to_pandas()
    got = dict(zip(out["k"], out["ord"]))
    assert got == {"a": 1, "b": 2, "c": 3}


def test_anti_join_broadcast(ray_session):
    import ray
    import ray.data as rd

    from crawler_uni_ray.ops import anti_join_broadcast

    ds = rd.from_items([{"url": f"u{i}"} for i in range(20)])
    ref = ray.put({f"u{i}" for i in range(0, 20, 2)})
    out = anti_join_broadcast(ds, "url", ref).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(1, 20, 2))


def test_anti_join_shuffled(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import anti_join_shuffled

    left = rd.from_items([{"url": f"u{i}", "x": i} for i in range(30)])
    right = rd.from_items([{"url": f"u{i}"} for i in range(0, 30, 3)])
    out = anti_join_shuffled(left, right, "url", n_buckets=4).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i}" for i in range(30) if i % 3)
    assert set(out.columns) == {"url", "x"}


def test_sampling_ops(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import sample_hash, sample_random
    from crawler_uni_ray.urlnorm import url_hash_batch

    ds = rd.from_items([{"url": f"https://x/{i}"} for i in range(2000)])
    # hash sample: exact, replayable membership
    out = sample_hash(ds, "url", keep_mod=3, n_mod=10).to_pandas()
    urls = [f"https://x/{i}" for i in range(2000)]
    mods = url_hash_batch(urls) % 10  # array mod: stays uint64 (a scalar
    # uint64 % int would promote to float64 and corrupt the low digits)
    want = [u for u, m in zip(urls, mods) if m == 3]
    assert sorted(out["url"]) == sorted(want)
    # random sample: seeded, streams, lands near the requested fraction
    n = sample_random(ds, 0.1, seed=7).count()
    assert 100 < n < 320


def test_asof_join_matches_pandas(ray_session):
    """Partitioned asof_join ≡ one global pandas merge_asof: random keys,
    duplicate (key, t) right rows (tie-break = max payload), keys with no
    right rows (inner drops them), backward and forward directions."""
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import asof_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "lid": np.arange(400, dtype=np.int64),
            "key": rng.randint(0, 25, 400).astype(np.int64),  # keys 20-24: no right rows
            "t": rng.randint(0, 1000, 400).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rkey": rng.randint(0, 20, 300).astype(np.int64),
            "rt": rng.randint(0, 1000, 300).astype(np.int64),
            "payload": rng.randint(0, 10**6, 300).astype(np.int64),
        }
    )

    def reference(direction: str) -> pd.DataFrame:
        r = (
            right.sort_values(["rkey", "rt", "payload"], kind="mergesort")
            .drop_duplicates(subset=["rkey", "rt"], keep="last")
            .rename(columns={"rkey": "key", "rt": "t"})
            .sort_values("t", kind="mergesort")
        )
        m = pd.merge_asof(
            left.sort_values("t", kind="mergesort"), r, on="t", by="key",
            direction=direction,
        ).dropna(subset=["payload"])
        m["payload"] = m["payload"].astype("int64")
        return m[["lid", "key", "t", "payload"]].sort_values("lid").reset_index(drop=True)

    for direction in ("backward", "forward"):
        got = asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            left_by="key",
            left_on="t",
            right_by="rkey",
            right_on="rt",
            payload_cols=["payload"],
            n_buckets=7,
            direction=direction,
        ).to_pandas()
        got["payload"] = got["payload"].astype("int64")
        got = got[["lid", "key", "t", "payload"]].sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, reference(direction), check_dtype=False)


def test_grouped_quantiles_disc_matches_duckdb_on_dupes(ray_session):
    # heavy duplication + tiny groups: the sf-testdata run (test_queries)
    # never stresses tie/boundary picks, this does
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_quantiles_disc

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c", "d"], [1, 2, 100, 997]),
            "v": np.concatenate(
                [
                    [5],
                    [3, 3],
                    rng.integers(0, 4, 100),  # heavy dupes
                    rng.integers(0, 1000, 997),
                ]
            ).astype("int64"),
        }
    )
    got = grouped_quantiles_disc(
        rd.from_pandas(df), "g", "v", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    ).sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT g, QUANTILE_DISC(v, 0.5) AS p50, QUANTILE_DISC(v, 0.9) AS p90,
                  QUANTILE_DISC(v, 0.99) AS p99
           FROM t GROUP BY g ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_running_sum_matches_duckdb_window(ray_session):
    """Analytic running aggregate ≡ SQL SUM() OVER (PARTITION BY … ORDER
    BY … ROWS UNBOUNDED PRECEDING) + ROW_NUMBER, including duplicate
    order values (stable tie-break via the second order column) and keys
    split across input blocks (the bucket shuffle must reunite them)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_running_sum

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n).astype("int64"),
            "ord1": rng.integers(0, 5, n).astype("int64"),  # heavy ties
            "ord2": np.arange(n, dtype="int64"),  # unique tie-break
            "v": rng.normal(100, 10, n),
        }
    )
    got = (
        grouped_running_sum(
            rd.from_pandas(df, override_num_blocks=8),
            key="k", order_cols=["ord1", "ord2"], value_col="v",
            seq_name="seq", cum_name="cum_v", n_buckets=16,
        )
        .to_pandas()[["k", "ord2", "seq", "cum_v"]]
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT k, ord2, CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
                  SUM(v) OVER w AS cum_v
           FROM t
           WINDOW w AS (PARTITION BY k ORDER BY ord1, ord2
                        ROWS UNBOUNDED PRECEDING)
           ORDER BY k, seq"""
    ).df()
    # bit-identical: same sequential addition order per key
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_rank_matches_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_rank

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, 400),
            "id": np.arange(400),
            # small value domain → plenty of ties within keys
            "v": rng.integers(0, 6, 400),
        }
    )
    out = (
        grouped_rank(
            rd.from_pandas(df), key="k", order_cols=["v"], descending=[True],
            rank_name="r", dense_name="d", n_buckets=5,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want_r = (
        df.groupby("k")["v"].rank(method="min", ascending=False).astype("int64")
    )
    want_d = (
        df.groupby("k")["v"].rank(method="dense", ascending=False).astype("int64")
    )
    assert list(out["r"]) == list(want_r)
    assert list(out["d"]) == list(want_d)


def test_grouped_rank_multi_order_cols(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_rank

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "id": [0, 1, 2, 3, 4, 5],
            "a": [1, 1, 1, 2, 5, 5],
            "b": ["x", "x", "y", "x", "q", "q"],
        }
    )
    out = (
        grouped_rank(
            rd.from_pandas(df), key="k", order_cols=["a", "b"],
            rank_name="r", dense_name="d", n_buckets=3,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # key 1 tuples: (1,x),(1,x),(1,y),(2,x) → ranks 1,1,3,4 dense 1,1,2,3
    assert list(out["r"]) == [1, 1, 3, 4, 1, 1]
    assert list(out["d"]) == [1, 1, 2, 3, 1, 1]


def test_grouped_rolling_sum_matches_duckdb_frame(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_rolling_sum

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 17, 300),
            "o": np.arange(300),
            "v": rng.integers(-50, 1000, 300),
        }
    )
    out = (
        grouped_rolling_sum(
            rd.from_pandas(df), key="k", order_cols=["o"], value_col="v",
            window=4, out_name="s", n_buckets=5,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        """
        SELECT o, SUM(v) OVER (PARTITION BY k ORDER BY o
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s
        FROM df ORDER BY o
        """
    ).df()
    assert list(out["s"].astype("int64")) == list(want["s"].astype("int64"))


def test_grouped_lag_lead(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_lag

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2], "o": [1, 2, 3, 1, 2], "v": [10, 20, 30, 40, 50]})
    lead = (
        grouped_lag(
            rd.from_pandas(df), key="k", order_cols=["o"], value_col="v",
            lag_name="nxt", n_buckets=3, periods=-1,
        )
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert list(lead["nxt"].fillna(-1).astype("int64")) == [20, 30, -1, 50, -1]


def test_semi_join_shuffled(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import semi_join_shuffled

    left = rd.from_items([{"url": f"u{i}", "x": i} for i in range(30)])
    # right has duplicate keys — semi join must not duplicate left rows
    right = rd.from_items([{"url": f"u{i % 10}"} for i in range(0, 60, 3)])
    out = semi_join_shuffled(left, right, "url", n_buckets=4).to_pandas()
    want = sorted({f"u{i % 10}" for i in range(0, 60, 3)})
    assert sorted(out["url"]) == want
    assert set(out.columns) == {"url", "x"}


def test_intersect_keys(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import intersect_keys

    a = rd.from_items([{"id": i} for i in list(range(0, 40, 2)) * 2])  # evens, dup'd
    b = rd.from_items([{"id": i} for i in range(0, 40, 3)])  # multiples of 3
    out = intersect_keys(a, b, "id", n_buckets=4, int_key=True).to_pandas()
    assert sorted(out["id"]) == [i for i in range(0, 40) if i % 6 == 0]
    # string keys through the string-hash bucket path
    sa = rd.from_items([{"u": f"k{i}"} for i in range(10)])
    sb = rd.from_items([{"u": f"k{i}"} for i in range(5, 15)])
    got = intersect_keys(sa, sb, "u", n_buckets=3).to_pandas()
    assert sorted(got["u"]) == [f"k{i}" for i in range(5, 10)]


def test_except_keys(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import except_keys

    a = rd.from_items([{"id": i} for i in list(range(0, 40, 2)) * 2])  # evens
    b = rd.from_items([{"id": i} for i in range(0, 40, 3)])
    out = except_keys(a, b, "id", n_buckets=4, int_key=True).to_pandas()
    assert sorted(out["id"]) == [i for i in range(0, 40, 2) if i % 3 != 0]
    sa = rd.from_items([{"u": f"k{i}"} for i in range(10)])
    sb = rd.from_items([{"u": f"k{i}"} for i in range(5, 15)])
    got = except_keys(sa, sb, "u", n_buckets=3).to_pandas()
    assert sorted(got["u"]) == [f"k{i}" for i in range(5)]


def test_grouped_ntile_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_ntile

    rng = np.random.default_rng(13)
    # key sizes deliberately spread around n (1..12 rows vs NTILE(4)) to
    # hit the q=0, r=0 and remainder cases
    df = pd.DataFrame({"k": rng.integers(0, 40, 250), "o": np.arange(250)})
    out = (
        grouped_ntile(
            rd.from_pandas(df), key="k", order_cols=["o"], n=4,
            out_name="t", n_buckets=5,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        "SELECT o, NTILE(4) OVER (PARTITION BY k ORDER BY o) AS t FROM df ORDER BY o"
    ).df()
    assert list(out["t"].astype("int64")) == list(want["t"].astype("int64"))


def test_grouped_pct_rank_matches_duckdb(ray_session):
    """PERCENT_RANK/CUME_DIST with ties: run-shared ranks, (rank-1)/(n-1),
    run-end/n — bit-compared against DuckDB's window functions."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_pct_rank

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, 400),
            "v": rng.integers(0, 6, 400),  # heavy ties within keys
            "id": np.arange(400),
        }
    )
    out = (
        grouped_pct_rank(
            rd.from_pandas(df), key="k", order_cols=["v"], descending=[True],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    duck = duckdb.query(
        """
        SELECT k, v, id,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM df WINDOW w AS (PARTITION BY k ORDER BY v DESC)
        ORDER BY id
        """
    ).df()
    pd.testing.assert_frame_equal(
        out[["id", "pct_rank", "cume_dist"]],
        duck[["id", "pct_rank", "cume_dist"]],
        check_dtype=False,
    )


def test_grouped_pct_rank_single_row_partition(ray_session):
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_pct_rank

    df = pd.DataFrame({"k": [1, 2, 2], "v": [5, 1, 2]})
    out = grouped_pct_rank(rd.from_pandas(df), key="k", order_cols=["v"]).to_pandas()
    one = out[out["k"] == 1]
    assert float(one["pct_rank"].iloc[0]) == 0.0  # SQL: n=1 → 0
    assert float(one["cume_dist"].iloc[0]) == 1.0


def test_semi_join_bloom_equals_exact(ray_session):
    """Bloom prefilter + exact verify ≡ the pure shuffled semi-join, for
    int and string keys; the approximate (exact=False) path is a superset
    containing every true match."""
    import ray.data as rd

    from crawler_uni_ray.ops import semi_join_bloom, semi_join_shuffled

    left = rd.from_items([{"url": f"u{i}", "x": i} for i in range(500)])
    right = rd.from_items([{"url": f"u{i}"} for i in range(0, 500, 7)])
    want = sorted(
        semi_join_shuffled(left, right, "url", n_buckets=4).to_pandas()["url"]
    )
    got = semi_join_bloom(
        left, right, "url", n_bits=1 << 12, n_hashes=4, n_buckets=4
    ).to_pandas()
    assert sorted(got["url"]) == want
    assert set(got.columns) == {"url", "x"}
    approx = semi_join_bloom(
        left, right, "url", n_bits=1 << 12, n_hashes=4, exact=False
    ).to_pandas()
    assert set(want) <= set(approx["url"])  # FPs allowed, FNs never

    ileft = rd.from_items([{"k": i, "x": i} for i in range(500)])
    iright = rd.from_items([{"k": i} for i in range(0, 500, 9)])
    iwant = sorted(
        semi_join_shuffled(ileft, iright, "k", n_buckets=4).to_pandas()["k"]
    )
    igot = semi_join_bloom(
        ileft, iright, "k", n_bits=1 << 12, n_buckets=4
    ).to_pandas()
    assert sorted(igot["k"]) == iwant


def test_merge_rank_matches_per_key_searchsorted():
    """interval_join's merge-path rank kernel ≡ per-key np.searchsorted
    on random (key, on) data, both sides."""
    import numpy as np

    from crawler_uni_ray.ops import _merge_rank

    rng = np.random.default_rng(3)
    for _ in range(50):
        n, m = int(rng.integers(0, 50)), int(rng.integers(1, 50))
        rk = np.sort(rng.integers(0, 6, n))
        ro = np.empty(n, dtype=np.int64)
        for k in np.unique(rk):
            msk = rk == k
            ro[msk] = np.sort(rng.integers(0, 25, msk.sum()))
        qk = rng.integers(0, 7, m)
        qv = rng.integers(-3, 28, m).astype(np.int64)
        for side in ("left", "right"):
            got = _merge_rank(rk, ro, qk, qv, side)
            want = np.array(
                [
                    np.searchsorted(rk, k, "left")
                    + np.searchsorted(ro[rk == k], v, side)
                    for k, v in zip(qk, qv)
                ],
                dtype=np.int64,
            )
            assert (got == want).all()


def test_interval_join_matches_duckdb(ray_session):
    """Banded range join pairs ≡ DuckDB's inequality join on random data,
    including keys with no matches and bands matching nothing."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import interval_join

    rng = np.random.default_rng(9)
    lhs = pd.DataFrame(
        {
            "lid": np.arange(300, dtype=np.int64),
            "k": rng.integers(0, 12, 300),
            "t": rng.integers(0, 1000, 300),
        }
    )
    rhs = pd.DataFrame(
        {
            "k2": rng.integers(0, 14, 800),
            "t2": rng.integers(0, 1000, 800),
            "pay": rng.integers(0, 100, 800),
        }
    )
    got = (
        interval_join(
            rd.from_pandas(lhs),
            rd.from_pandas(rhs),
            left_key="k",
            right_key="k2",
            left_on="t",
            right_on="t2",
            lo=-5,
            hi=20,
            payload_cols=["pay"],
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["lid", "pay", "t"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.query(
            """
            SELECT l.lid, l.k, l.t, r.pay
            FROM lhs l JOIN rhs r
              ON r.k2 = l.k AND r.t2 >= l.t - 5 AND r.t2 < l.t + 20
            ORDER BY l.lid, r.pay, l.t
            """
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["lid", "k", "t", "pay"]], want[["lid", "k", "t", "pay"]],
        check_dtype=False,
    )


def test_grouped_string_agg_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_string_agg

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 200),
            "v": [f"name{i:03d}" for i in range(200)],
            "o": np.arange(200)[::-1].copy(),
        }
    )
    got = (
        grouped_string_agg(rd.from_pandas(df), "k", "v", "o", sep=",", out_name="agg")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = duckdb.query(
        "SELECT k, string_agg(v, ',' ORDER BY o) AS agg FROM df GROUP BY k ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_quantiles_cont_matches_duckdb(ray_session):
    """QUANTILE_CONT parity under ties, singletons, and cross-block keys:
    int64 values + dyadic q's must be BIT-identical to DuckDB (every
    interpolation intermediate is exact in double)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from crawler_uni_ray.ops import grouped_quantiles_cont

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": np.concatenate([rng.randint(0, 40, 3000), [999]]),  # singleton key
            "v": np.concatenate([rng.randint(0, 50, 3000), [7]]).astype("int64"),  # heavy ties
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    got = (
        grouped_quantiles_cont(
            ds, "k", "v", {"q25": 0.25, "q50": 0.5, "q75": 0.75}, n_buckets=16
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, QUANTILE_CONT(v,0.25) q25, QUANTILE_CONT(v,0.5) q50,"
        " QUANTILE_CONT(v,0.75) q75 FROM t GROUP BY k ORDER BY k"
    ).df()
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    for c in ("q25", "q50", "q75"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_write_dataset_resumable_roundtrip_and_skip(ray_session, tmp_path):
    """Resumable sink: full roundtrip equality; a re-run with completed
    markers present skips those partitions entirely (their files
    untouched) and rewrites only the missing ones; retry is idempotent."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from crawler_uni_ray.ops import write_dataset_resumable

    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 2})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "sink")
    summary = write_dataset_resumable(ds, out, "k", n_parts=8)
    assert not summary["skipped"].any()
    assert summary["rows"].sum() == 1000
    back = pq.read_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # simulate a crash: partition 3 lost its commit marker
    os.remove(os.path.join(out, "part_0003", "_SUCCESS"))
    mtimes_before = {
        d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
        for d in os.listdir(out)
        if d != "part_0003"
    }
    summary2 = write_dataset_resumable(ds, out, "k", n_parts=8)
    rewritten = summary2.loc[~summary2["skipped"]]
    assert list(rewritten["partition"]) == [3]
    assert summary2["skipped"].sum() == 7
    for d, m in mtimes_before.items():
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == m
    back2 = pq.read_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)
