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
    if pa_schema is not None and not isinstance(pa_schema, pa.Schema):
        # pandas-block upstream (e.g. a quality-scored corpus): reconstruct
        # Arrow types from the PandasBlockSchema dtypes; object columns are
        # strings throughout this codebase
        fields = []
        for name, typ in zip(pa_schema.names, pa_schema.types):
            try:
                at = pa.from_numpy_dtype(typ)
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                at = pa.string()
            fields.append(pa.field(name, at))
        pa_schema = pa.schema(fields)
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


def grouped_pct_rank(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    descending: list[bool] | None = None,
    pct_name: str = "pct_rank",
    cume_name: str = "cume_dist",
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Analytic ``PERCENT_RANK()`` + ``CUME_DIST() OVER (PARTITION BY key
    ORDER BY order_cols)`` with full SQL tie semantics: PERCENT_RANK =
    (rank-1)/(n-1) (0.0 for single-row partitions), CUME_DIST = (rows
    ordered ≤ current, i.e. the tie-run's LAST row number)/n.  Same
    one-shuffle bucketed plan as ``grouped_rank`` — run-boundary arithmetic
    per bucket, no per-group Python.  Float determinism: both outputs are
    ONE IEEE division of exact int64 counts (< 2^53), so they hash-compare
    bit-identically against a SQL engine computing the same definition."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_buckets)
    asc = [True] + [not d for d in (descending or [False] * len(order_cols))]

    def _pct(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop(columns=["__bucket"])
            .sort_values([key, *order_cols], ascending=asc, kind="mergesort")
            .reset_index(drop=True)
        )
        n = len(g)
        if n == 0:
            g[pct_name] = pd.Series([], dtype="float64")
            g[cume_name] = pd.Series([], dtype="float64")
            return from_pandas_clean(g)
        kv = g[key].to_numpy()
        kchange = np.ones(n, dtype=bool)
        kchange[1:] = kv[1:] != kv[:-1]
        first = kchange.copy()  # new (key, order-tuple) run starts here
        for c in order_cols:
            v = g[c].to_numpy()
            first[1:] |= v[1:] != v[:-1]
        seq = g.groupby(key, sort=False).cumcount().to_numpy(np.int64)
        cnt = g.groupby(key, sort=False)[key].transform("size").to_numpy(np.int64)
        run_id = np.cumsum(first) - 1            # global run counter, 0-based
        rank = seq[first][run_id] + 1            # run-start row number per key
        # run END row number per key: the seq of the last row in each run
        last = np.empty(n, dtype=bool)
        last[:-1] = first[1:]
        last[-1] = True
        run_end_seq = seq[last][run_id] + 1      # rows ordered ≤ current
        pct = np.where(cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0)
        g[pct_name] = pct.astype(np.float64)
        g[cume_name] = run_end_seq / cnt
        return from_pandas_clean(g)

    return bucketed.groupby("__bucket").map_groups(_pct, batch_format="pandas")


def _hash_col_u64(col) -> np.ndarray:
    """uint64 hashes for a key column: Fibonacci+xorshift mix for integer
    dtypes (no string round-trip), siphash otherwise — the same families
    the bucketing helpers use."""
    arr = np.asarray(col)
    if arr.dtype.kind in "iu":
        k = arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        k ^= k >> np.uint64(29)
        k *= np.uint64(0xBF58476D1CE4E5B9)
        k ^= k >> np.uint64(32)
        return k
    return url_hash_batch([str(v) for v in col])


def bloom_of_keys(
    ds: Dataset, key: str, n_bits: int = 1 << 23, n_hashes: int = 4
) -> np.ndarray:
    """Distributed bloom-filter build over ``ds[key]``: each block emits ONE
    fixed-size partial bitmap (the HLL combiner shape), a distributed
    OR-merge round coalesces them 16-to-1 (partials are ``n_bits/8`` bytes
    EACH — at 100 TB that is n_blocks MiB, too much for one driver pull),
    and the driver ORs the ≤16 survivors.  ``n_bits`` must be a power of
    two.  Returns the packed uint64 word array (``n_bits/64`` words)."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    n_words = n_bits // 64
    mask = np.uint64(n_bits - 1)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(n_words, dtype=np.uint64)
        h1 = _hash_col_u64(df[key].to_numpy())
        h2 = (h1 >> np.uint64(17)) | np.uint64(1)  # odd → full-period probe
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pd.DataFrame({"words": [words]})

    def _or_merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_words, dtype=np.uint64)
        for w in df["words"]:
            np.bitwise_or(acc, np.asarray(w, dtype=np.uint64), out=acc)
        return pd.DataFrame({"words": [acc]})

    partials = ds.select_columns([key]).map_batches(
        _partial, batch_format="pandas", batch_size=None
    )
    merged = partials.repartition(16).map_batches(
        _or_merge, batch_format="pandas", batch_size=None
    )
    rows = merged.take_all()  # ≤ 16 rows × n_bits/8 bytes
    out = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        np.bitwise_or(out, np.asarray(r["words"], dtype=np.uint64), out=out)
    return out


def semi_join_bloom(
    left: Dataset,
    right: Dataset,
    key: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    exact: bool = True,
    n_buckets: int = 64,
) -> Dataset:
    """Bloom semi-join — the 100-TB pattern for ``left WHERE key IN right``
    when the right side is too big to broadcast as a set but the LEFT side
    is far bigger still: build a fixed-size bloom over right's keys
    (``bloom_of_keys``), broadcast it once via ``ray.put``, prefilter left
    per batch (no shuffle of either side), then — ``exact=True``, the
    default — finish with the exact ``semi_join_shuffled`` on the few
    surviving rows, so false positives cost only shuffle volume, never
    correctness.  ``exact=False`` skips the verify (documented approximate:
    FP rate ≈ (1 - e^(-kn/m))^k keeps non-matching rows)."""
    import ray

    words_ref = ray.put(bloom_of_keys(right, key, n_bits=n_bits, n_hashes=n_hashes))
    mask = np.uint64(n_bits - 1)

    class _Pre:
        def __init__(self) -> None:
            self._words = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._words is None:
                from .util import cached_get

                self._words = cached_get(words_ref)
            h1 = _hash_col_u64(t[key].to_numpy(zero_copy_only=False))
            h2 = (h1 >> np.uint64(17)) | np.uint64(1)
            keep = np.ones(len(t), dtype=bool)
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) & mask
                bit = (
                    self._words[(idx >> np.uint64(6)).astype(np.int64)]
                    >> (idx & np.uint64(63))
                ) & np.uint64(1)
                keep &= bit.astype(bool)
            return t.filter(pa.array(keep))

    pre = left.map_batches(_Pre(), batch_format="pyarrow")
    if not exact:
        return pre
    return semi_join_shuffled(pre, right, key, n_buckets=n_buckets)


def _merge_rank(
    rk: np.ndarray, ro: np.ndarray, qk: np.ndarray, qv: np.ndarray, side: str
) -> np.ndarray:
    """For each query ``(qk[i], qv[i])``, the lexicographic-searchsorted
    position into the (key, on)-sorted right arrays ``(rk, ro)`` — i.e.
    the count of right rows with ``key < qk[i] OR (key == qk[i] AND
    on <[=] qv[i])`` (``side='left'`` / ``'right'``).  np.searchsorted is
    1-D-only, so this is the merge-path form: one stable lexsort of the
    CONCATENATED rows+queries (queries ordered before equal right rows for
    'left', after for 'right'), then each query's answer is the number of
    right rows preceding it — a cumulative sum.  O((n+m) log(n+m)), fully
    vectorized, no per-key Python."""
    n, m = len(rk), len(qk)
    tag = np.concatenate(
        [np.zeros(n, dtype=np.int8), np.ones(m, dtype=np.int8)]
    )
    if side == "left":
        tag = 1 - tag  # queries (now 0) sort before equal right rows
    order = np.lexsort(
        (tag, np.concatenate([ro, qv]), np.concatenate([rk, qk]))
    )
    is_right = order < n  # original index < n ⇒ a right row
    n_right_before = np.cumsum(is_right) - is_right  # exclusive prefix count
    pos = np.empty(n + m, dtype=np.int64)
    pos[order] = n_right_before
    return pos[n:]


def interval_join(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    left_on: str,
    right_on: str,
    lo: int,
    hi: int,
    payload_cols: list[str],
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Distributed banded interval (range) join: one output row per (left
    row, right row) pair with equal keys and ``left_on + lo <= right_on <
    left_on + hi`` — the SQL ``JOIN ... ON l.key = r.key AND r.on >= l.on +
    lo AND r.on < l.on + hi`` shape (event-within-N-days-of-order).  Both
    ``on`` columns must be integer-comparable (cast timestamps to int64
    first).  Ray Data has no range join; this is the explicit partitioned
    form: tag provenance, union, ONE hash shuffle on the key (whole keys
    co-located per bucket), then per bucket sort the right side once by
    (key, on) and resolve EVERY left row's band [start, end) with two
    merge-path lexsorts (``_merge_rank``) — no per-key loop, no cross
    product; output size is exactly the number of matching pairs.  Skew
    note: a single hot key lands in one bucket; pre-split hot keys with a
    salt + band-overlapped right replication if a key's rows exceed a
    worker's heap (same caveat as asof_join)."""
    lcols = list(left.schema().names)
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")

    def _arrow_schema(ds: Dataset) -> pa.Schema | None:
        s = getattr(ds.schema(), "base_schema", None)
        return s if isinstance(s, pa.Schema) else None

    lbase = _arrow_schema(left)
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
        out = {left_key: t[right_key], left_on: t[right_on]}
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
    rt = right.select_columns([right_key, right_on, *payload_cols]).map_batches(
        _tag_right, batch_format="pyarrow"
    )
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    both = bucket(lt.union(rt), left_key, n_buckets)
    out_cols = [*lcols, *payload_cols]

    def _band(g: pa.Table) -> pa.Table:
        is_left = pc.equal(g["__is_left"], 1)
        lf = g.filter(is_left).drop_columns(["__bucket", "__is_left", *payload_cols])
        rf = g.filter(pc.invert(is_left)).select([left_key, left_on, *payload_cols])
        if lf.num_rows == 0 or rf.num_rows == 0:
            empty = {c: lf[c].take(pa.array([], pa.int64())) for c in lf.column_names}
            for p in payload_cols:
                empty[p] = pa.chunked_array([pa.array([], type=ptypes[p])])
            return pa.table(empty).select(out_cols)
        rk = rf[left_key].to_numpy(zero_copy_only=False)
        ro = rf[left_on].to_numpy(zero_copy_only=False)
        rorder = np.lexsort((ro, rk))
        rk, ro = rk[rorder], ro[rorder]
        qk = lf[left_key].to_numpy(zero_copy_only=False)
        qon = lf[left_on].to_numpy(zero_copy_only=False)
        start = _merge_rank(rk, ro, qk, qon + lo, side="left")
        end = _merge_rank(rk, ro, qk, qon + hi, side="left")
        counts = end - start
        tot = int(counts.sum())
        lrep = np.repeat(np.arange(len(qk), dtype=np.int64), counts)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ridx = start[lrep] + within
        lout = lf.take(pa.array(lrep))
        cols = {c: lout[c] for c in lf.column_names}
        rsorted = rf.take(pa.array(rorder))
        for p in payload_cols:
            cols[p] = rsorted[p].take(pa.array(ridx))
        return pa.table(cols).select(out_cols)

    return both.groupby("__bucket").map_groups(_band, batch_format="pyarrow")


def grouped_string_agg(
    ds: Dataset,
    key: str,
    val: str,
    order_col: str,
    sep: str = "|",
    out_name: str = "agg",
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """SQL ``string_agg(val, sep ORDER BY order_col) GROUP BY key``: one
    concatenated string per key, element order fixed by ``order_col`` so
    the result is deterministic (the unordered SQL form is not).  One
    bucketed shuffle; per bucket a single stable sort + pandas groupby
    join.  Scale note: each key's output row holds ALL its values — this
    is for bounded-cardinality groups (names per nation, tags per doc);
    an unbounded group would need a size cap upstream."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds.select_columns([key, val, order_col]), key, n_buckets)

    def _agg(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, order_col], kind="mergesort")
        out = (
            g.groupby(key, sort=False)[val]
            .agg(lambda s: sep.join(s.astype(str)))
            .reset_index(name=out_name)
        )
        return from_pandas_clean(out)

    return bucketed.groupby("__bucket").map_groups(_agg, batch_format="pandas")


def grouped_quantiles_cont(
    ds: Dataset,
    key: str,
    value_col: str,
    qs: dict[str, float],
    n_buckets: int = 64,
    int_key: bool = True,
) -> Dataset:
    """Exact per-group INTERPOLATED quantiles (SQL ``QUANTILE_CONT`` /
    numpy ``method='linear'``: position q·(n-1), result lo + frac·(hi-lo))
    — the continuous-rank complement to :func:`grouped_quantiles_disc`
    (whose histogram plan needs a bounded value domain but no per-group
    sort) and to the mergeable ε-summary (approximate).  One bucketed
    shuffle of (key, value); per bucket a single lexsort resolves every
    key's quantiles from slice offsets — group payload is a key's rows,
    so this is for bounded per-key cardinality.  Bit-identical across
    engines when values are int64 and the q's are dyadic (0.25/0.5/0.75):
    every intermediate is exact in double."""
    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds.select_columns([key, value_col]), key, n_buckets)

    def _q(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, value_col], kind="mergesort")
        keys = g[key].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        cols: dict[str, np.ndarray] = {}
        ns = (ends - starts).astype(np.float64)
        for name, q in qs.items():
            pos = q * (ns - 1.0)
            lo_i = np.floor(pos).astype(np.int64)
            frac = pos - lo_i
            lo = vals[starts + lo_i]
            hi = vals[np.minimum(starts + lo_i + 1, ends - 1)]
            cols[name] = lo + frac * (hi - lo)
        out = pd.DataFrame({key: keys[starts], **cols})
        return from_pandas_clean(out)

    return bucketed.groupby("__bucket").map_groups(_q, batch_format="pandas")


def weighted_sample_k(
    ds: Dataset,
    k: int,
    id_col: str,
    weight_col: str,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the Efraimidis
    & Spirakis 2006 A-ES scheme): each row draws a pseudo-uniform
    ``u ∈ (0,1)`` from a multiplicative scramble of its id (replayable —
    no RNG state) and scores ``key = u^(1/w)``; the k largest keys ARE a
    weighted sample without replacement.  Distributed as a per-block
    top-k combiner (union-closed: the global top-k is within the union
    of block top-ks) + driver merge of ≤ k×n_blocks rows — the
    ``top_terms`` slates shape, no global sort, no shuffle."""
    import numpy as np
    import pyarrow as pa

    def _key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (((ids * 2654435761) % 4294967296) + 1.0) / 4294967297.0
        key = u ** (1.0 / np.maximum(w, 1e-12))
        out = pa.table(
            {
                id_col: pa.array(ids),
                weight_col: pa.array(w),
                "skey": pa.array(key),
            }
        )
        df = out.to_pandas().sort_values(
            ["skey", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return from_pandas_clean(df)

    parts = ds.map_batches(_key, batch_format="pyarrow").to_pandas()
    top = parts.sort_values(
        ["skey", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return top.reset_index(drop=True)


def write_dataset_resumable(
    ds: Dataset,
    out_dir: str,
    key: str,
    n_parts: int = 64,
    int_key: bool = True,
) -> pd.DataFrame:
    """Resumable partitioned parquet sink (the task brief's 'failed run
    skips finished partitions' contract, as a generic operator — the
    crawl checkpoints use the same discipline internally): rows land in
    ``part_NNNN/`` directories by ``hash(key) % n_parts``; each partition
    writes ``data.parquet`` via tmp→rename and then an empty ``_SUCCESS``
    marker (written LAST = the commit point).  A re-run first LISTs the
    markers, drops completed partitions' rows MAP-SIDE (before the
    shuffle — skipped data never enters the all-to-all), and writes only
    the rest; a task retry overwrites its own tmp file and re-renames —
    idempotent.  Returns a per-partition summary (partition, rows,
    skipped)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    done = {
        int(d.split("_")[1])
        for d in os.listdir(out_dir)
        if d.startswith("part_")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }

    bucket = add_hash_bucket_int if int_key else add_hash_bucket
    bucketed = bucket(ds, key, n_parts)

    if done:
        skip = np.array(sorted(done), np.int64)

        def _drop(t: pa.Table) -> pa.Table:
            b = t["__bucket"].to_numpy()
            return t.filter(pa.array(~np.isin(b, skip)))

        bucketed = bucketed.map_batches(_drop, batch_format="pyarrow")

    sum_schema = pa.schema([("partition", pa.int64()), ("rows", pa.int64())])

    def _write(g: pd.DataFrame):
        part = int(g["__bucket"].iloc[0])
        pdir = os.path.join(out_dir, f"part_{part:04d}")
        os.makedirs(pdir, exist_ok=True)
        body = g.drop(columns="__bucket").sort_values(key, kind="mergesort")
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False), tmp,
            compression="zstd",
        )
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        with open(os.path.join(pdir, "_SUCCESS"), "w"):
            pass
        return from_pandas_clean(
            pd.DataFrame({"partition": [part], "rows": [len(body)]}), sum_schema
        )

    written = (
        bucketed.groupby("__bucket")
        .map_groups(_write, batch_format="pandas")
        .to_pandas()
    )
    written["skipped"] = False
    skipped = pd.DataFrame(
        {"partition": sorted(done), "rows": -1, "skipped": True}
    )
    out = pd.concat([written, skipped], ignore_index=True)
    return out.sort_values("partition").reset_index(drop=True)
