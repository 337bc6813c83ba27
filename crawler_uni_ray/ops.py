"""Generic scalable relational primitives on ray.data.Dataset.

The bucket trick used throughout: Ray Data's ``groupby(key)`` physically
shuffles by ``key`` and applies ``map_groups`` once per DISTINCT key — a
Python call per group, which dies at millions of tiny groups (e.g. dedup by
url).  Instead we bucket by ``hash(key) % n_buckets`` and run ONE vectorized
pandas/arrow operation per bucket: the shuffle moves the same rows, but the
per-group Python overhead collapses to ``n_buckets`` calls.  All keyed rows
land in the same bucket, so per-key semantics (dedup-first, per-host budget)
stay exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .urlnorm import url_hash_batch
from .util import from_pandas_clean, silence_empty_block_schema_warning

from ray.data import Dataset

# every bucketed op here can legitimately produce empty shuffle partitions
# (n_buckets > distinct keys) — drop ray's per-empty-block schema warning
silence_empty_block_schema_warning()


def add_hash_bucket(
    ds: Dataset, key: str, n_buckets: int, col: str = "__bucket"
) -> Dataset:
    """Append ``hash(key) % n_buckets`` as an int64 column (deterministic
    siphash — stable across processes)."""

    def _bucket(t: pa.Table) -> pa.Table:
        h = url_hash_batch(t[key].to_pylist()) % n_buckets
        # strip metadata: pandas-origin blocks carry unhashable schemas
        # into the groupby shuffle otherwise (central fix for all
        # bucketed ops — this map feeds every dedup/anti-join shuffle)
        t = t.replace_schema_metadata(None)
        return t.append_column(col, pa.array(h.astype(np.int64)))

    return ds.map_batches(_bucket, batch_format="pyarrow")


def add_hash_bucket_int(
    ds: Dataset, key: str, n_buckets: int, col: str = "__bucket"
) -> Dataset:
    """``add_hash_bucket`` for integer keys: Fibonacci multiplicative hash
    (one vectorized multiply+shift — no string round-trip)."""

    def _bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        b = ((k >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)
        return t.replace_schema_metadata(None).append_column(col, pa.array(b))

    return ds.map_batches(_bucket, batch_format="pyarrow")


def dedup_exact(ds: Dataset, key: str, n_buckets: int = 64) -> Dataset:
    """Keep one arbitrary-but-deterministic row per distinct ``key``
    (lowest original order within bucket).  Hash-bucket shuffle + one
    ``drop_duplicates`` per bucket — the scalable form of the reference's
    ``set`` membership (/root/reference/crawler.py:14-15,58,67)."""
    bucketed = add_hash_bucket(ds, key, n_buckets)

    def _dedup(g: pd.DataFrame) -> pa.Table:
        # return metadata-free Arrow: pandas-metadata schemas are
        # unhashable and defeat Ray's shuffle schema dedup (VERDICT r1 #5)
        return from_pandas_clean(g.drop_duplicates(subset=[key]).drop(columns=["__bucket"]))

    return bucketed.groupby("__bucket").map_groups(_dedup, batch_format="pandas")


def dedup_exact_first(
    ds: Dataset, key: str, order_col: str, n_buckets: int = 64
) -> Dataset:
    """Keep the row with the MINIMAL ``order_col`` per distinct ``key`` —
    deterministic 'first' semantics (e.g. min doc_id per text hash)."""
    bucketed = add_hash_bucket(ds, key, n_buckets)

    def _dedup(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_col, kind="mergesort")
        return from_pandas_clean(g.drop_duplicates(subset=[key]).drop(columns=["__bucket"]))

    return bucketed.groupby("__bucket").map_groups(_dedup, batch_format="pandas")


def sample_random(ds: Dataset, fraction: float, seed: int | None = None) -> Dataset:
    """A8: seeded passthrough of ``Dataset.random_sample`` (per-block
    Bernoulli — streams, never materializes)."""
    return ds.random_sample(fraction, seed=seed)


def sample_hash(ds: Dataset, key: str, keep_mod: int, n_mod: int = 10) -> Dataset:
    """A8, the reproducible form: keep rows with ``hash(key) % n_mod ==
    keep_mod`` — a deterministic systematic sample any engine (or SQL
    oracle) can replay exactly, unlike an RNG draw."""

    def _f(t: pa.Table) -> pa.Table:
        h = url_hash_batch(t[key].to_pylist()) % n_mod
        return t.filter(pa.array(h == keep_mod))

    return ds.map_batches(_f, batch_format="pyarrow")


def grouped_quantiles_disc(
    ds: Dataset, group_col: str, value_col: str, qs: dict[str, float]
) -> pd.DataFrame:
    """Exact per-group discrete quantiles via a value histogram: the only
    shuffle is ``groupby((group, value)).count()``, which Ray
    pre-aggregates per block, and the histogram the driver picks from is
    |groups| × |distinct values| — bounded by the value DOMAIN, not the
    row count — so no per-group sort of raw rows ever happens.  Quantile
    semantics match DuckDB ``quantile_disc``: the smallest value whose
    cumulative count ≥ ceil(q·n) (probed empirically incl. float
    boundaries like 0.99·100; the round() guards ulp drift)."""
    import math

    from ray.data.aggregate import Count

    hist = (
        ds.groupby([group_col, value_col])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    rows = []
    for g, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values(value_col)
        cum = sub["cnt"].to_numpy(np.int64).cumsum()
        vals = sub[value_col].to_numpy()
        n = int(cum[-1])
        row = {group_col: g}
        for name, q in qs.items():
            kk = max(math.ceil(round(q * n, 9)), 1)
            row[name] = vals[int(np.searchsorted(cum, kk))]
        rows.append(row)
    return pd.DataFrame(rows)


def grouped_running_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    seq_name: str = "row_seq",
    cum_name: str | None = None,
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Analytic window function (``SUM(value) OVER (PARTITION BY key ORDER
    BY order_cols ROWS UNBOUNDED PRECEDING)`` + ``ROW_NUMBER``): cumulative
    per-key running sum and 1-based sequence number.

    Physical plan: ONE hash(key)-bucketed shuffle — buckets hold whole
    partitions, so each group task sees every row of its keys — then a
    vectorized per-group stable sort + pandas ``groupby.cumsum/cumcount``.
    No global sort; parallelism scales with ``n_buckets``; shuffle volume
    is the projected input rows once.  Per-key sequential addition order
    equals the SQL window frame's, so the cumulative doubles are
    bit-identical to an oracle's.  Skewed keys: one key's history must fit
    one task (same contract as any per-partition window function)."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    cum = cum_name or f"cum_{value_col}"

    def _window(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns=["__bucket"]).sort_values(
            [key, *order_cols], kind="mergesort"
        )
        grp = g.groupby(key, sort=False)
        g[seq_name] = grp.cumcount().to_numpy(np.int64) + 1
        g[cum] = grp[value_col].cumsum()
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_window, batch_format="pandas")


def grouped_lag(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    lag_name: str | None = None,
    n_buckets: int = 64,
    int_key: bool = True,
    periods: int = 1,
) -> Dataset:
    """Analytic ``LAG(value) OVER (PARTITION BY key ORDER BY order_cols)``:
    each row gains the previous row's ``value_col`` within its key (null on
    the first row per key).  ``periods=-1`` is ``LEAD`` (next row's value,
    null on the last row per key).  Same physical plan as
    ``grouped_running_sum``: ONE hash(key)-bucketed shuffle (whole
    partitions per bucket) + vectorized per-bucket sort and grouped
    ``shift`` — no global sort."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    lag = lag_name or (f"prev_{value_col}" if periods > 0 else f"next_{value_col}")

    def _lag(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns=["__bucket"]).sort_values(
            [key, *order_cols], kind="mergesort"
        )
        g[lag] = g.groupby(key, sort=False)[value_col].shift(periods)
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_lag, batch_format="pandas")


def grouped_rank(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    descending: list[bool] | None = None,
    rank_name: str = "rank",
    dense_name: str = "dense_rank",
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Analytic ``RANK()`` + ``DENSE_RANK() OVER (PARTITION BY key ORDER BY
    order_cols)``: ties (equal ``order_cols`` within a key) share a rank;
    RANK leaves gaps after a tie-run, DENSE_RANK does not — exactly the SQL
    window functions.  Same one-shuffle plan as ``grouped_running_sum``
    (hash(key) buckets hold whole partitions); per bucket ONE stable sort,
    then pure run-boundary arithmetic over numpy arrays — no per-group
    Python, no ``pandas.rank`` (which can't rank a multi-column tuple).
    Assumes non-null order columns (NaN != NaN would split a SQL tie)."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    asc = [True] + [not d for d in (descending or [False] * len(order_cols))]

    def _rank(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop(columns=["__bucket"])
            .sort_values([key, *order_cols], ascending=asc, kind="mergesort")
            .reset_index(drop=True)
        )
        n = len(g)
        if n == 0:
            g[rank_name] = pd.Series([], dtype="int64")
            g[dense_name] = pd.Series([], dtype="int64")
            return from_pandas_clean(g)
        kv = g[key].to_numpy()
        kchange = np.ones(n, dtype=bool)
        kchange[1:] = kv[1:] != kv[:-1]
        first = kchange.copy()  # new (key, order-tuple) run starts here
        for c in order_cols:
            v = g[c].to_numpy()
            first[1:] |= v[1:] != v[:-1]
        seq = g.groupby(key, sort=False).cumcount().to_numpy(np.int64)
        run_id = np.cumsum(first) - 1          # global run counter, 0-based
        rank = seq[first][run_id] + 1          # run-start row number per key
        cum_first = np.cumsum(first)           # 1-based global run counter
        key_run = np.cumsum(kchange) - 1
        dense = cum_first - cum_first[kchange][key_run] + 1
        g[rank_name] = rank.astype(np.int64)
        g[dense_name] = dense.astype(np.int64)
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_rank, batch_format="pandas")


def grouped_rolling_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_name: str | None = None,
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Moving-frame window aggregate — ``SUM(value) OVER (PARTITION BY key
    ORDER BY order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.
    Same one-shuffle bucketed plan; per bucket the frame sums come from a
    per-key cumulative sum minus its window-shifted self — O(n) total, no
    ``pandas.rolling`` (whose sliding-kernel float re-association would
    break hash-exactness).  Integer value columns stay exact: the cumsum
    is int64 and the shifted subtraction round-trips float64 only for
    magnitudes < 2^53."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    out = out_name or f"sum{window}_{value_col}"

    def _roll(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop(columns=["__bucket"])
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        grp = g.groupby(key, sort=False)
        cum = grp[value_col].cumsum()
        shifted = cum.groupby(g[key], sort=False).shift(window)
        moving = cum - shifted.fillna(0)
        if pd.api.types.is_integer_dtype(g[value_col].dtype):
            moving = moving.astype("int64")
        g[out] = moving
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_roll, batch_format="pandas")


def asof_join(
    left: Dataset,
    right: Dataset,
    left_by: str,
    left_on: str,
    right_by: str,
    right_on: str,
    payload_cols: list[str],
    n_buckets: int = 64,
    direction: str = "backward",
    inner: bool = True,
) -> Dataset:
    """Distributed as-of join: for each left row, attach ``payload_cols``
    from the right row with the same ``by`` key and the greatest ``on``
    value ≤ the left's (``direction="backward"``; ``"forward"`` = least ≥).
    Ray Data has no native as-of join — this is the explicit partitioned
    form: tag provenance, union with aligned schemas, ONE hash shuffle on
    the ``by`` key (whole keys per bucket), then one vectorized
    ``pandas.merge_asof`` per bucket.  Right-side ties on (by, on) are
    broken deterministically by keeping the row with the maximal first
    payload column.  ``inner=True`` drops left rows with no match (the
    SQL-ASOF-JOIN-comparable form); ``False`` keeps them with nulls."""
    def _arrow_schema(ds: Dataset) -> pa.Schema | None:
        s = getattr(ds.schema(), "base_schema", None)
        return s if isinstance(s, pa.Schema) else None

    lschema = left.schema()
    lbase = _arrow_schema(left)
    lcols = list(lschema.names)
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    rbase = _arrow_schema(right)
    ptypes = {
        p: (rbase.field(p).type if rbase is not None else pa.float64())
        for p in payload_cols
    }

    def _tag_left(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        for p in payload_cols:
            t = t.append_column(p, pa.nulls(len(t), type=ptypes[p]))
        return t.append_column("__is_left", pa.array(np.ones(len(t), dtype=np.int8)))

    def _tag_right(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        out = {left_by: t[right_by], left_on: t[right_on]}
        for p in payload_cols:
            out[p] = t[p]
        r = pa.table(out)
        for name in lcols:
            if name not in r.column_names:
                typ = lbase.field(name).type if lbase is not None else pa.null()
                r = r.append_column(name, pa.nulls(len(t), type=typ))
        r = r.select([*lcols, *payload_cols])
        return r.append_column("__is_left", pa.array(np.zeros(len(t), dtype=np.int8)))

    lt = left.map_batches(_tag_left, batch_format="pyarrow")
    rt = right.select_columns([right_by, right_on, *payload_cols]).map_batches(
        _tag_right, batch_format="pyarrow"
    )
    both = add_hash_bucket(lt.union(rt), left_by, n_buckets)

    def _asof(g: pa.Table) -> pa.Table:
        # split sides while still Arrow: right rows carry NULLs in the
        # left's columns, and a single pandas frame would promote those
        # int64 columns to float64 for the LEFT rows too (silent
        # int→float drift in the output); per-side conversion keeps the
        # original dtypes intact
        is_left = pa.compute.equal(g["__is_left"], 1)
        lf = (
            g.filter(is_left)
            .drop_columns(["__bucket", "__is_left", *payload_cols])
            .to_pandas()
        )
        rf = (
            g.filter(pa.compute.invert(is_left))
            .select([left_by, left_on, *payload_cols])
            .to_pandas()
        )
        # deterministic tie-break within (by, on): keep max first payload
        rf = rf.sort_values(
            [left_by, left_on, payload_cols[0]], kind="mergesort"
        ).drop_duplicates(subset=[left_by, left_on], keep="last")
        if len(lf):
            m = pd.merge_asof(
                lf.sort_values(left_on, kind="mergesort"),
                rf.sort_values(left_on, kind="mergesort"),
                on=left_on,
                by=left_by,
                direction=direction,
            )
            if inner:
                m = m.dropna(subset=[payload_cols[0]])
        else:
            m = lf.copy()
            for p in payload_cols:
                m[p] = pd.Series([], dtype="float64")
        # unmatched rows make pandas promote payload ints to float64 —
        # force float64 in EVERY bucket so block schemas unify (callers
        # cast back after the inner filter guarantees no nulls)
        for p in payload_cols:
            m[p] = m[p].astype("float64")
        return from_pandas_clean(m)

    return both.groupby("__bucket").map_groups(_asof, batch_format="pyarrow")


def anti_join_broadcast(ds: Dataset, key: str, keys_ref) -> Dataset:
    """``ds`` rows whose ``key`` is NOT in the broadcast key set.
    ``keys_ref`` is a ``ray.put`` ObjectRef of a Python set (or a plain
    set for driver-side use).  The scalable semi/anti-join pattern for a
    small-enough key side (ray_guide: broadcast, don't shuffle)."""
    import ray

    class _Anti:
        def __init__(self) -> None:
            self._keys = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._keys is None:
                self._keys = (
                    ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
                )
            vals = t[key].to_pylist()
            mask = np.fromiter(
                (v not in self._keys for v in vals), dtype=bool, count=len(vals)
            )
            return t.filter(pa.array(mask))

    return ds.map_batches(_Anti(), batch_format="pyarrow")


def anti_join_shuffled(
    left: Dataset, right: Dataset, key: str, n_buckets: int = 64
) -> Dataset:
    """Exact distributed anti-join (left ∖ right on ``key``) when BOTH sides
    are large: tag provenance, union, hash-bucket shuffle, and per bucket
    keep left rows whose key has no right row.  Ray Data has no native
    anti-join (SURVEY.md §2.5 J2); this is the explicit partitioned form."""
    return _presence_join(left, right, key, keep_present=False, n_buckets=n_buckets)


def semi_join_shuffled(
    left: Dataset, right: Dataset, key: str, n_buckets: int = 64
) -> Dataset:
    """Exact distributed semi-join (left rows whose ``key`` HAS at least one
    right row — SQL ``WHERE key IN (SELECT key FROM right)``) when both
    sides are large: the same single tagged-union hash shuffle as
    ``anti_join_shuffled`` with the presence mask flipped.  Left rows are
    never duplicated (unlike an inner join against a non-unique right)."""
    return _presence_join(left, right, key, keep_present=True, n_buckets=n_buckets)


def _presence_join(
    left: Dataset, right: Dataset, key: str, keep_present: bool, n_buckets: int
) -> Dataset:
    lschema = left.schema()
    pa_schema = getattr(lschema, "base_schema", None)
    lcols = list(lschema.names)

    def _tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("__is_left", pa.array([flag] * len(t), pa.int8()))

        return f

    lt = left.map_batches(_tag(1), batch_format="pyarrow")
    rt = right.select_columns([key]).map_batches(_tag(0), batch_format="pyarrow")
    # align schemas: right side lacks left's other columns → add nulls
    def _pad(t: pa.Table) -> pa.Table:
        for name in lcols:
            if name not in t.column_names:
                typ = pa_schema.field(name).type if pa_schema is not None else pa.null()
                t = t.append_column(name, pa.nulls(len(t), type=typ))
        return t.select([*lcols, "__is_left"])

    rt = rt.map_batches(_pad, batch_format="pyarrow")
    both = add_hash_bucket(lt.union(rt), key, n_buckets)

    def _presence(g: pd.DataFrame) -> pa.Table:
        right_keys = set(g.loc[g["__is_left"] == 0, key])
        present = g[key].isin(right_keys)
        mask = ((g["__is_left"] == 1) & (present if keep_present else ~present)).to_numpy()
        # convert BEFORE filtering: an empty pandas frame would lose its
        # column types (object → null) and break downstream unification
        t = from_pandas_clean(g.drop(columns=["__bucket", "__is_left"]))
        return t.filter(pa.array(mask))

    return both.groupby("__bucket").map_groups(_presence, batch_format="pandas")


def intersect_keys(
    a: Dataset, b: Dataset, key: str, n_buckets: int = 64, int_key: bool = False
) -> Dataset:
    """Distinct ``key`` values present in BOTH datasets — SQL ``SELECT key
    FROM a INTERSECT SELECT key FROM b``.  Per-batch distinct combiner
    first (the shuffle moves each block's unique keys, not its rows), then
    ONE hash-bucket shuffle keeps keys tagged from both sides.  Output is a
    single-column Dataset of distinct keys."""

    def _tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            u = pc.unique(t[key])
            return pa.table(
                {key: u, "__side": pa.array(np.full(len(u), flag, dtype=np.int8))}
            )

        return f

    at = a.select_columns([key]).map_batches(_tag(0), batch_format="pyarrow")
    bt = b.select_columns([key]).map_batches(_tag(1), batch_format="pyarrow")
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    both = bucket(at.union(bt), key, n_buckets)

    def _ix(g: pd.DataFrame) -> pa.Table:
        piv = g[[key, "__side"]].drop_duplicates()
        cnt = piv.groupby(key, sort=False).size()
        keep = cnt.index[cnt.to_numpy() == 2]
        return from_pandas_clean(pd.DataFrame({key: np.asarray(keep)}))

    return both.groupby("__bucket").map_groups(_ix, batch_format="pandas")


def except_keys(
    a: Dataset, b: Dataset, key: str, n_buckets: int = 64, int_key: bool = False
) -> Dataset:
    """Distinct ``key`` values in ``a`` but NOT in ``b`` — SQL ``SELECT key
    FROM a EXCEPT SELECT key FROM b``.  Same single-shuffle tagged-distinct
    plan as ``intersect_keys`` with the keep condition flipped to
    'a-side only'.  With ``intersect_keys`` and ``Dataset.union`` this
    completes the SQL set-operation family."""

    def _tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            u = pc.unique(t[key])
            return pa.table(
                {key: u, "__side": pa.array(np.full(len(u), flag, dtype=np.int8))}
            )

        return f

    at = a.select_columns([key]).map_batches(_tag(0), batch_format="pyarrow")
    bt = b.select_columns([key]).map_batches(_tag(1), batch_format="pyarrow")
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    both = bucket(at.union(bt), key, n_buckets)

    def _ex(g: pd.DataFrame) -> pa.Table:
        piv = g[[key, "__side"]].drop_duplicates()
        agg = piv.groupby(key, sort=False)["__side"].agg(["size", "max"])
        keep = agg.index[(agg["size"].to_numpy() == 1) & (agg["max"].to_numpy() == 0)]
        return from_pandas_clean(pd.DataFrame({key: np.asarray(keep)}))

    return both.groupby("__bucket").map_groups(_ex, batch_format="pandas")


def grouped_ntile(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    n: int,
    descending: list[bool] | None = None,
    out_name: str = "ntile",
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Analytic ``NTILE(n) OVER (PARTITION BY key ORDER BY order_cols)``:
    rows of each key split into ``n`` near-equal ordered tiles, the first
    ``count % n`` tiles one row larger — exactly the SQL function's
    remainder rule.  Same one-shuffle bucketed plan; per bucket ONE stable
    sort + closed-form tile arithmetic from the per-key row number and
    count (no per-group Python)."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    asc = [True] + [not d for d in (descending or [False] * len(order_cols))]

    def _ntile(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop(columns=["__bucket"])
            .sort_values([key, *order_cols], ascending=asc, kind="mergesort")
            .reset_index(drop=True)
        )
        if len(g) == 0:
            g[out_name] = pd.Series([], dtype="int64")
            return from_pandas_clean(g)
        grp = g.groupby(key, sort=False)
        seq = grp.cumcount().to_numpy(np.int64)  # 0-based row number per key
        cnt = grp[key].transform("size").to_numpy(np.int64)
        q, r = cnt // n, cnt % n
        boundary = r * (q + 1)  # rows below it sit in the size-(q+1) tiles
        big = seq < boundary
        tile = np.where(
            big,
            seq // np.maximum(q + 1, 1) + 1,
            np.where(q > 0, (seq - boundary) // np.maximum(q, 1) + r + 1, seq + 1),
        )
        g[out_name] = tile.astype(np.int64)
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_ntile, batch_format="pandas")
