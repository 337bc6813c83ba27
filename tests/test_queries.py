"""Driver-contract checks: every SQL-backed ``queries()`` entry must match
its ``oracle_sql()`` on the same parquet tables (row count + values after
sorting columns by name — the driver's comparison, at sf0.001 for speed);
rows-only queries must return stable, non-empty results.
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_sql_backed_query_matches_oracle(ray_session, name):
    ray_df = entrymod.queries()[name](SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    duck_df = _duck(entrymod.oracle_sql()[name])
    a, b = _norm(ray_df), _norm(duck_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)


ROWS_ONLY = [
    "events_users_approx",
    "events_value_quantiles_approx",
    "docs_top_terms_approx",
    "docs_langid",
    "docs_quality",
    "docs_token_counts",
    "docs_fingerprint",
    "docs_minhash_clusters",
    "docs_dedup_fuzzy",
    "docs_dedup_keep_best",
    "docs_cdc_chunks",
    "docs_lm_nll",
    "docs_term_counts_cms",
    "docs_training_pipeline",
    "embeddings_ann_ivf_persisted",
    "embeddings_ann_lsh_persisted",
    "docs_simhash",
    "url_canonicalize",
    "media_image_features",
    "lineitem_pagerank",
    "lineitem_communities",
    "docs_cosine_pairs",
    "parts_copurchase_kcore",
    "docs_weighted_sample",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(ray_session, name):
    fn = entrymod.queries()[name]
    a = fn(SF_DIR)
    if not isinstance(a, pd.DataFrame):
        a = a.to_pandas()
    assert len(a) > 0
    b = fn(SF_DIR)
    if not isinstance(b, pd.DataFrame):
        b = b.to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_tfidf_partition_count_above_vocab_regression(ray_session):
    """Round-2 regression: the old native-join tfidf plan raised
    ArrowInvalid whenever the join partition count exceeded the distinct
    term count (empty schema-less right-side partitions — exactly the
    32-CPU driver config, which crashed the whole round-2 bench).  The
    co-group plan must be exact with n_buckets far above the vocabulary
    (~31 terms at this sf): empty buckets simply produce no group."""
    import ray.data

    from crawler_uni_ray.functions.text import tfidf_top_terms

    ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    hi = tfidf_top_terms(ds, k=5, n_buckets=256)
    duck = _duck(entrymod.oracle_sql()["docs_tfidf_top"])
    pd.testing.assert_frame_equal(
        _norm(hi), _norm(duck), check_dtype=False, atol=1e-6
    )


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    assert len(df) >= 0 and "quality" in df.columns and "lang_pred" in df.columns
