"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship document-processing pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query.  Ray is initialised by the
driver BEFORE this module is imported — nothing here calls ``ray.init()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers don't inherit the driver's sys.path; if the driver runs from
# outside the repo, tasks would fail to import the package by reference.
# Registering the package for by-value cloudpickle makes every closure
# self-contained regardless of worker cwd.
try:
    import crawler_uni_ray as _pkg
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(_pkg)
except Exception:  # pragma: no cover - best-effort hardening
    pass


def entry() -> Any:
    """Flagship on /root/testdata/sf0.001: the full training-data pipeline
    — normalize → language ID → quality gate → exact dedup (normalized
    text) → MinHash near-dedup keep-first → token counts — one streaming
    Dataset chain (pinned oracle: tests/test_local_oracles.py::
    test_pin_docs_training_pipeline)."""
    from crawler_uni_ray.pipelines import queries as q

    return q.docs_training_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from crawler_uni_ray.pipelines import queries as q

    return {
        # relational core (SURVEY.md §2.6)
        "lineitem_agg": q.lineitem_agg,
        "orders_topk": q.orders_topk,
        "orders_by_mktsegment": q.orders_by_mktsegment,
        "customers_without_orders": q.customers_without_orders,
        "events_by_type": q.events_by_type,
        "events_windowed": q.events_windowed,
        "events_sessionized": q.events_sessionized,
        "events_sliding": q.events_sliding,
        "events_with_last_order": q.events_with_last_order,
        "docs_distinct_langs": q.docs_distinct_langs,
        "parts_by_brand": q.parts_by_brand,
        "suppliers_per_nation": q.suppliers_per_nation,
        "lineitem_date_range": q.lineitem_date_range,
        "docs_sample": q.docs_sample,
        "orders_top3_per_cust": q.orders_top3_per_cust,
        "revenue_by_priority": q.revenue_by_priority,
        "events_distinct_users_by_type": q.events_distinct_users_by_type,
        "events_users_approx": q.events_users_approx,
        "orders_monthly": q.orders_monthly,
        # dedup suite
        "docs_dedup_exact": q.docs_dedup_exact,
        "docs_minhash_clusters": q.docs_minhash_clusters,
        "docs_simhash": q.docs_simhash,
        "docs_simhash_pairs": q.docs_simhash_pairs,
        "docs_ngram_jaccard_pairs": q.docs_ngram_jaccard_pairs,
        "embeddings_dup_pairs": q.embeddings_dup_pairs,
        # text analysis
        "docs_text_stats": q.docs_text_stats,
        "docs_top_terms": q.docs_top_terms,
        "docs_tfidf_top": q.docs_tfidf_top,
        "docs_chars_quantiles": q.docs_chars_quantiles,
        "docs_langid": q.docs_langid,
        "docs_quality": q.docs_quality,
        "docs_token_counts": q.docs_token_counts,
        "docs_fingerprint": q.docs_fingerprint,
        "docs_pii_redact": q.docs_pii_redact,
        "docs_repetition": q.docs_repetition,
        "docs_normalize": q.docs_normalize,
        # similarity search
        "embeddings_ann": q.embeddings_ann,
        "embeddings_ann_lsh": q.embeddings_ann_lsh,
        "embeddings_ann_ivf": q.embeddings_ann_ivf,
        "embeddings_ann_ivf_persisted": q.embeddings_ann_ivf_persisted,
        "embeddings_ann_lsh_persisted": q.embeddings_ann_lsh_persisted,
        "docs_dedup_fuzzy": q.docs_dedup_fuzzy,
        "docs_dedup_keep_best": q.docs_dedup_keep_best,
        "docs_cdc_chunks": q.docs_cdc_chunks,
        "docs_lm_nll": q.docs_lm_nll,
        "docs_strip_dup_spans": q.docs_strip_dup_spans,
        "docs_term_counts_cms": q.docs_term_counts_cms,
        "docs_tokenize_stats": q.docs_tokenize_stats,
        "lineitem_communities": q.lineitem_communities,
        "parts_copurchase_triangles": q.parts_copurchase_triangles,
        "docs_cosine_pairs": q.docs_cosine_pairs,
        "parts_copurchase_kcore": q.parts_copurchase_kcore,
        "docs_weighted_sample": q.docs_weighted_sample,
        "customers_rfm": q.customers_rfm,
        "docs_write_partitioned": q.docs_write_partitioned,
        "lineitem_corr_moments": q.lineitem_corr_moments,
        "docs_training_pipeline": q.docs_training_pipeline,
        # crawl / url / media
        "url_canonicalize": q.url_canonicalize,
        "crawl_bfs_visited": q.crawl_bfs_visited,
        "media_image_features": q.media_image_features,
        "media_frame_samples": q.media_frame_samples,
        # archive / seed sources (round 5)
        "docs_warc_roundtrip": q.docs_warc_roundtrip,
        "sitemap_seeds": q.sitemap_seeds,
        # analytic window + multi-way join (round 5)
        "orders_cumulative_spend": q.orders_cumulative_spend,
        "events_time_deltas": q.events_time_deltas,
        "revenue_by_nation": q.revenue_by_nation,
        "revenue_rollup": q.revenue_rollup,
        # rank / moving-frame analytics, semi-join, pivot, cube,
        # histogram, set intersection (round 5)
        "orders_price_ranks": q.orders_price_ranks,
        "orders_moving_spend": q.orders_moving_spend,
        "customers_with_urgent_orders": q.customers_with_urgent_orders,
        "events_pivot_daily": q.events_pivot_daily,
        "revenue_cube": q.revenue_cube,
        "docs_length_histogram": q.docs_length_histogram,
        "events_user_overlap": q.events_user_overlap,
        "events_click_only_users": q.events_click_only_users,
        "events_last_per_user": q.events_last_per_user,
        "orders_spend_quartiles": q.orders_spend_quartiles,
        # outer joins, correlated subquery, exact moments, HAVING,
        # PERCENT_RANK/CUME_DIST, mode, scalar string kernels (round 5)
        "customers_urgent_order_counts": q.customers_urgent_order_counts,
        "activity_full_outer": q.activity_full_outer,
        "orders_above_cust_avg": q.orders_above_cust_avg,
        "orders_price_percentiles": q.orders_price_percentiles,
        "events_top_type_per_day": q.events_top_type_per_day,
        "repeat_customers": q.repeat_customers,
        "customer_name_features": q.customer_name_features,
        "orders_spend_variance": q.orders_spend_variance,
        # mergeable approx-quantile sketch (continuous domain; rows-only)
        "events_value_quantiles_approx": q.events_value_quantiles_approx,
        # interval join, bloom semi-join, ordered string_agg,
        # Misra-Gries heavy hitters (round 5)
        "events_click_attribution": q.events_click_attribution,
        "orders_from_event_users": q.orders_from_event_users,
        "nation_customer_names": q.nation_customer_names,
        "docs_top_terms_approx": q.docs_top_terms_approx,
        # benchmark decontamination, stratified sampling, conversion
        # funnel, SemDeDup (round 5)
        "docs_decontaminate": q.docs_decontaminate,
        "docs_stratified_sample": q.docs_stratified_sample,
        "events_funnel": q.events_funnel,
        "embeddings_semdedup": q.embeddings_semdedup,
        "docs_dup_spans": q.docs_dup_spans,
        "docs_collocations": q.docs_collocations,
        "orders_price_quartiles_cont": q.orders_price_quartiles_cont,
        # round-5 final session: retention / packing / domain-mix
        "events_retention": q.events_retention,
        "docs_pack_chunks": q.docs_pack_chunks,
        "docs_domain_mix": q.docs_domain_mix,
        # round-5 final session: JSON props, gap-fill, user lifetime,
        # inverted index, link-graph PageRank (iterative → rows-only)
        "events_props_agg": q.events_props_agg,
        "events_daily_gapfill": q.events_daily_gapfill,
        "events_user_lifetime": q.events_user_lifetime,
        "docs_inverted_index": q.docs_inverted_index,
        "lineitem_pagerank": q.lineitem_pagerank,
        # actor-pool model inference, integer-exact z-score anomalies,
        # global-percentile gate
        "docs_model_score": q.docs_model_score,
        "events_anomalies": q.events_anomalies,
        "docs_above_p90": q.docs_above_p90,
        # behavioral bigrams, incremental-ingest dedup, group-wise
        # standardization
        "events_transitions": q.events_transitions,
        "docs_incremental_new": q.docs_incremental_new,
        "docs_chars_zscore": q.docs_chars_zscore,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)      AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "orders_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "orders_by_mktsegment": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "customers_without_orders": """
            SELECT c_custkey
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey
        """,
        "events_by_type": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "events_windowed": """
            SELECT user_id,
                   CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_bucket,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS total_value
            FROM events
            GROUP BY user_id, hour_bucket
            ORDER BY user_id, hour_bucket
        """,
        "events_sessionized": """
            WITH d AS (
                SELECT user_id, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM d
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events, MIN(ts) AS session_start
            FROM s GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "events_sliding": """
            WITH w AS (
                SELECT user_id, value,
                       (FLOOR(EPOCH(ts) / 1800) - off) * 1800 AS window_start
                FROM events CROSS JOIN (SELECT 0 AS off UNION ALL SELECT 1) offs
            )
            SELECT user_id, CAST(window_start AS BIGINT) AS window_start,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
            FROM w
            GROUP BY user_id, window_start
            ORDER BY user_id, window_start
        """,
        "events_with_last_order": """
            WITH o1 AS (
                SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            )
            SELECT e.event_id, e.user_id, o.last_orderkey
            FROM events e
            ASOF JOIN o1 o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.event_id
        """,
        "docs_distinct_langs": """
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
        """,
        "parts_by_brand": """
            SELECT p_brand, COUNT(*) AS n_parts,
                   ROUND(SUM(p_retailprice), 2) AS total_price
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "suppliers_per_nation": """
            SELECT n_name, COUNT(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "lineitem_date_range": """
            SELECT l_returnflag, MIN(l_shipdate) AS first_ship,
                   MAX(l_shipdate) AS last_ship, COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "docs_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id % 10 = 0 ORDER BY doc_id
        """,
        "docs_dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, text
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "docs_text_stats": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_calc,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
                   END AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "docs_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))
                   END AS n_tokens,
                   LEN(REGEXP_EXTRACT_ALL(
                       text, '[A-Za-z]+|[0-9]+|[^ \t\n\r\f\vA-Za-z0-9]'
                   )) AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        # langid/quality: per-language stopword-hit counts via RE2
        # regexes mirroring text.py's profiles; rounding is scaled
        # half-up (FLOOR(x*1e6+0.5)/1e6) — bit-identical to the engine's
        # round6 (np.round half-even vs SQL ROUND half-away differ by an
        # ulp on boundary values and would flip the driver hash)
        "docs_langid": r"""
            WITH h AS (
              SELECT doc_id,
                LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:the|and|of|to|a|in|is|that|for|it)\b')) AS h_en,
                LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:der|die|und|das|ist|nicht|ein|mit|für|auf)\b')) AS h_de,
                LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:le|la|et|les|des|est|un|une|dans|pour)\b')) AS h_fr,
                LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:el|la|de|que|y|los|es|un|una|por)\b')) AS h_es,
                LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:il|la|di|che|e|un|per|non|con|del)\b')) AS h_it,
                GREATEST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) END, 1) AS ntok
              FROM documents)
            SELECT doc_id,
              CASE WHEN GREATEST(h_en,h_de,h_fr,h_es,h_it) >= 1 THEN
                CASE WHEN h_en >= GREATEST(h_en,h_de,h_fr,h_es,h_it) THEN 'en'
                     WHEN h_de >= GREATEST(h_en,h_de,h_fr,h_es,h_it) THEN 'de'
                     WHEN h_fr >= GREATEST(h_en,h_de,h_fr,h_es,h_it) THEN 'fr'
                     WHEN h_es >= GREATEST(h_en,h_de,h_fr,h_es,h_it) THEN 'es'
                     ELSE 'it' END
              ELSE 'und' END AS lang_pred,
              FLOOR(CAST(GREATEST(h_en,h_de,h_fr,h_es,h_it) AS DOUBLE)/ntok*1000000 + 0.5)/1000000 AS lang_score
            FROM h ORDER BY doc_id
        """,
        "docs_quality": r"""
            WITH h AS (
              SELECT doc_id,
                CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                CAST(GREATEST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) END, 1) AS DOUBLE) AS n_tokens,
                CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^A-Za-z0-9_ \t\n\r\f\v]')) AS DOUBLE) AS n_punct,
                CAST(LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:the|and|of|to|a|in|is|that|for|it)\b'))
                   + LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:der|die|und|das|ist|nicht|ein|mit|für|auf)\b'))
                   + LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:le|la|et|les|des|est|un|une|dans|pour)\b'))
                   + LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:el|la|de|que|y|los|es|un|una|por)\b'))
                   + LEN(REGEXP_EXTRACT_ALL(text, '(?i)\b(?:il|la|di|che|e|un|per|non|con|del)\b')) AS DOUBLE) AS n_stop
              FROM documents)
            SELECT doc_id,
              FLOOR(n_punct / GREATEST(n_chars, 1) * 1000000 + 0.5)/1000000 AS punct_ratio,
              FLOOR(n_stop / n_tokens * 1000000 + 0.5)/1000000 AS stop_ratio,
              FLOOR((
                LEAST(GREATEST(n_chars/500.0, 0), 1)*0.3
                + LEAST(GREATEST(1.0 - ABS(n_chars/n_tokens - 5.0)/5.0, 0), 1)*0.3
                + LEAST(GREATEST((n_stop/n_tokens)*5.0, 0), 1)*0.2
                + LEAST(GREATEST(1.0 - (n_punct/GREATEST(n_chars, 1))*5.0, 0), 1)*0.2
              ) * 1000000 + 0.5)/1000000 AS quality
            FROM h ORDER BY doc_id
        """,
        "docs_top_terms": """
            SELECT term, COUNT(*) AS n FROM (
                SELECT LOWER(UNNEST(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'))) AS term
                FROM documents
            ) GROUP BY term
            ORDER BY n DESC, term
            LIMIT 50
        """,
        # Grouped Pearson sufficient statistics, integer-exact (y =
        # FLOOR(price) whole dollars: cents² would overflow int64 at sf0.1,
        # and ROUND ties at .50 diverge between numpy half-even and SQL
        # half-away — FLOOR has no ties).
        "lineitem_corr_moments": """
            SELECT l_returnflag,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_x,
                   SUM(CAST(FLOOR(l_extendedprice) AS BIGINT))::BIGINT AS sum_y,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(FLOOR(l_extendedprice) AS BIGINT))::BIGINT AS sum_xy,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT))::BIGINT AS sum_x2,
                   SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
                       * CAST(FLOOR(l_extendedprice) AS BIGINT))::BIGINT AS sum_y2
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        # Resumable partitioned sink: per-partition row counts; the oracle
        # reproduces the engine's Fibonacci multiplicative hash in HUGEINT
        # ((k * 0x9E3779B97F4A7C15) mod 2^64) >> 33 mod n_parts.
        "docs_write_partitioned": """
            SELECT CAST(((doc_id * CAST(11400714819323198485 AS HUGEINT))
                         % CAST(18446744073709551616 AS HUGEINT))
                        // 8589934592 % 8 AS BIGINT) AS partition,
                   COUNT(*)::BIGINT AS n_rows
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # RFM segmentation: exact integer per-customer stats + three global
        # NTILE(4) scores; day = floor(epoch/86400), cents = round(price*100).
        "customers_rfm": """
            WITH pc AS (
              SELECT o_custkey,
                     MAX(CAST(FLOOR(epoch(o_orderdate)/86400) AS BIGINT))
                       AS last_day,
                     COUNT(*)::BIGINT AS frequency,
                     SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))::BIGINT
                       AS monetary_cents
              FROM orders GROUP BY 1
            ), mx AS (SELECT MAX(last_day) AS md FROM pc),
            b AS (
              SELECT o_custkey, (mx.md - last_day)::BIGINT AS recency_days,
                     frequency, monetary_cents
              FROM pc, mx
            )
            SELECT o_custkey, recency_days, frequency, monetary_cents,
              NTILE(4) OVER (ORDER BY recency_days, o_custkey)::BIGINT
                AS r_tile,
              NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)::BIGINT
                AS f_tile,
              NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey)::BIGINT
                AS m_tile
            FROM b ORDER BY o_custkey
        """,
        # Triangle census of the parts co-purchase graph; engine uses
        # degree-ordered orientation, the oracle an id-ordered 3-way join
        # (orientation doesn't change the count).
        "parts_copurchase_triangles": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                  FROM li x JOIN li y
                    ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey),
            n AS (SELECT COUNT(DISTINCT node)::BIGINT AS n_nodes FROM
                  (SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
            tri AS (
              SELECT COUNT(*)::BIGINT AS n_triangles
              FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                       JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            )
            SELECT n.n_nodes, (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
                   tri.n_triangles
            FROM n, tri
        """,
        # Tokenize-for-training: ids 0..29 by (count desc, term asc);
        # sum_ids pins the exact id assignment, all int64.
        "docs_tokenize_stats": """
            WITH tok AS (
              SELECT doc_id,
                     LOWER(UNNEST(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'))) AS term
              FROM documents
            ),
            cnt AS (SELECT term, COUNT(*)::BIGINT AS n FROM tok GROUP BY 1),
            vocab AS (
              SELECT term,
                     ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) - 1 AS token_id
              FROM cnt ORDER BY n DESC, term LIMIT 30
            ),
            j AS (
              SELECT t.doc_id, v.token_id
              FROM tok t LEFT JOIN vocab v ON v.term = t.term
            ),
            s AS (
              SELECT doc_id, COUNT(*)::BIGINT AS n_ids,
                     COUNT(*) FILTER (WHERE token_id IS NULL)::BIGINT AS n_unk,
                     COALESCE(SUM(token_id), 0)::BIGINT AS sum_ids
              FROM j GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(s.n_ids, 0) AS n_ids,
                   COALESCE(s.n_unk, 0) AS n_unk,
                   COALESCE(s.sum_ids, 0) AS sum_ids
            FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
        """,
        # idf is the LINEAR N/df variant: one IEEE divide + one multiply,
        # bit-identical between numpy and SQL (ln() is libm-dependent and
        # could flip the driver hash by an ulp)
        "docs_tfidf_top": """
            WITH tok AS (
                SELECT doc_id,
                       LOWER(UNNEST(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'))) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
            ), dfreq AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), nd AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
            )
            SELECT doc_id, term, tf_idf FROM (
                SELECT tf.doc_id, tf.term,
                       tf.tf * ((SELECT n FROM nd) / dfreq.df) AS tf_idf,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf * ((SELECT n FROM nd) / dfreq.df) DESC,
                                    tf.term
                       ) AS rnk
                FROM tf JOIN dfreq USING (term)
            ) WHERE rnk <= 5
            ORDER BY doc_id, tf_idf DESC, term
        """,
        "docs_chars_quantiles": """
            SELECT lang,
                   QUANTILE_DISC(n_chars, 0.5)  AS p50,
                   QUANTILE_DISC(n_chars, 0.9)  AS p90,
                   QUANTILE_DISC(n_chars, 0.99) AS p99
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # PII augment string is built identically on both sides (the
        # synthetic docs have no natural PII); redaction regexes are RE2
        # in BOTH engines (pyarrow replace_substring_regex / DuckDB)
        "docs_pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id || '@mail-'
                          || (doc_id % 7) || '.example.com from 10.'
                          || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                          || '.' || ((doc_id * 13) % 256) || ' call +1-555-'
                          || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
              FROM documents)
            SELECT doc_id,
                   REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                     '\+?[0-9][0-9\-]{6,}[0-9]', '<PHONE>', 'g') AS text_redacted
            FROM aug ORDER BY doc_id
        """,
        "docs_repetition": r"""
            WITH tok AS (
              SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+') AS toks
              FROM documents
            ), big AS (
              SELECT doc_id, LEN(toks) AS n_tokens_w,
                     LEN(LIST_DISTINCT(toks)) AS n_distinct,
                     [toks[i] || ' ' || toks[i+1] FOR i IN RANGE(1, LEN(toks))] AS bigrams
              FROM tok
            )
            SELECT doc_id, n_tokens_w, n_distinct,
                   FLOOR(CASE WHEN n_tokens_w > 0
                         THEN 1.0 - CAST(n_distinct AS DOUBLE)/GREATEST(n_tokens_w,1)
                         ELSE 0 END * 1000000 + 0.5)/1000000 AS dup_word_ratio,
                   FLOOR(CAST(CASE WHEN LEN(bigrams) = 0 THEN 0
                          ELSE (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                                FROM UNNEST(bigrams) AS t(b) GROUP BY b))
                          END AS DOUBLE) / GREATEST(n_tokens_w - 1, 1)
                          * 1000000 + 0.5)/1000000 AS top_bigram_frac
            FROM big ORDER BY doc_id
        """,
        "docs_normalize": r"""
            SELECT doc_id,
                   TRIM(REGEXP_REPLACE(REGEXP_REPLACE(NFC_NORMALIZE(LOWER(text)),
                        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS text_norm
            FROM documents ORDER BY doc_id
        """,
        "orders_top3_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rnk
                FROM orders
            ) WHERE rnk <= 3
            ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        """,
        "events_distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "orders_monthly": """
            SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT) AS ym,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_price
            FROM orders GROUP BY ym ORDER BY ym
        """,
        "revenue_by_priority": """
            WITH per_order AS (
                SELECT l_orderkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS revenue
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT o_orderpriority, COUNT(*) AS n_orders,
                   ROUND(SUM(revenue), 2) AS total_revenue
            FROM per_order JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "embeddings_ann": """
            SELECT query_id, neighbor_id, rnk FROM (
                SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(t.embedding, q.embedding) DESC,
                                    t.vec_id
                       ) AS rnk
                FROM embeddings q CROSS JOIN embeddings t
                WHERE q.vec_id < 8
            ) WHERE rnk <= 10
            ORDER BY query_id, rnk
        """,
        # WARC sink→source roundtrip: the oracle recomputes the page rows
        # straight from documents; a value-hash match proves the archive
        # bytes carried the text losslessly.
        "docs_warc_roundtrip": """
            SELECT 'https://w' || (doc_id % 8) || '.example.com/d' || doc_id AS url,
                   '2026-01-01T00:00:00Z' AS warc_ts,
                   text
            FROM documents ORDER BY url
        """,
        # Sitemap tree expansion: every doc contributes exactly one page
        # url via its (doc_id % 4) leaf urlset; the missing + malformed
        # leaves contribute nothing.
        "sitemap_seeds": """
            SELECT 'https://site.example.com/page/' || doc_id AS url,
                   'https://site.example.com/sm/' || (doc_id % 4) || '.xml' AS sitemap_url
            FROM documents ORDER BY url
        """,
        # Analytic window function: the engine's per-key sequential
        # cumulative addition order equals the SQL frame's, so the
        # running doubles hash-compare exactly (both sides round(2)).
        "orders_cumulative_spend": """
            SELECT o_custkey, o_orderkey,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
                   ROUND(SUM(o_totalprice) OVER w, 2) AS cum_spend
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING)
            ORDER BY o_custkey, order_seq
        """,
        # LAG analytic: delta in whole int64 microseconds — no float in
        # the hashed values at all.
        "events_time_deltas": """
            SELECT event_id, user_id,
                   CAST(DATE_DIFF('microseconds', prev_ts, ts) AS BIGINT) AS delta_us
            FROM (
                SELECT event_id, user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events
            )
            WHERE prev_ts IS NOT NULL
            ORDER BY event_id
        """,
        "revenue_by_nation": """
            WITH per_order AS (
                SELECT l_orderkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS rev
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(rev), 2) AS revenue
            FROM per_order
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        # GROUPING SETS: rollup levels use the 'ALL' sentinel (no NULLs
        # in the hashed values; nation/priority domains never collide).
        # Revenue is quantized per lineitem to exact int64 ten-thousandths
        # (FLOOR(x*1e4+0.5), identical for identical input doubles) so
        # every level is an order-free integer sum — a plain float SUM +
        # ROUND(2) straddled a cent boundary at sf0.01 under different
        # summation orders.
        "revenue_rollup": """
            WITH per_order AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                      * 10000 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem GROUP BY l_orderkey
            ), base AS (
                SELECT n_name, o_orderpriority, rev4
                FROM per_order
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
            )
            SELECT COALESCE(n_name, 'ALL') AS n_name,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COUNT(*) AS n_orders,
                   SUM(rev4) / 10000.0 AS revenue
            FROM base
            GROUP BY ROLLUP(n_name, o_orderpriority)
            ORDER BY n_name, o_orderpriority
        """,
        # CUBE = the ROLLUP levels + the per-priority slice; same
        # integer-exact quantization as revenue_rollup.
        "revenue_cube": """
            WITH per_order AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                      * 10000 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem GROUP BY l_orderkey
            ), base AS (
                SELECT n_name, o_orderpriority, rev4
                FROM per_order
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
            )
            SELECT COALESCE(n_name, 'ALL') AS n_name,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COUNT(*) AS n_orders,
                   SUM(rev4) / 10000.0 AS revenue
            FROM base
            GROUP BY CUBE(n_name, o_orderpriority)
            ORDER BY n_name, o_orderpriority
        """,
        # RANK/DENSE_RANK: ties on the double o_totalprice are identical
        # on both engines (same input bits); only int64 ranks are hashed.
        "orders_price_ranks": """
            SELECT o_custkey, o_orderkey,
                   CAST(RANK() OVER w AS BIGINT) AS price_rank,
                   CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
            ORDER BY o_orderkey
        """,
        # Moving frame: prices quantized to exact int64 cents BEFORE the
        # window sum, so the frame math is order-free integers.
        "orders_moving_spend": """
            SELECT o_custkey, o_orderkey,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS spend3_cents
            FROM orders ORDER BY o_orderkey
        """,
        "customers_with_urgent_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
            )
            ORDER BY c_custkey
        """,
        "events_pivot_daily": """
            SELECT CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd,
                   COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
                   COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
                   COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
                   COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
                   COUNT(*) AS n_total
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "docs_length_histogram": """
            SELECT CAST(LENGTH(text) // 200 AS BIGINT) * 200 AS bucket_lo,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # Set ops at (user, day) granularity — user-level sets are
        # degenerate at these scales (every user has every event type).
        "events_user_overlap": """
            SELECT user_id,
                   CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd
            FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id,
                   CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, ymd
        """,
        "events_click_only_users": """
            SELECT user_id,
                   CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id,
                   CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, ymd
        """,
        # Per-key argmax: a UNIQUE descending order makes RANK ≡
        # ROW_NUMBER, so 'rank 1' is well-defined on both engines.
        "events_last_per_user": """
            SELECT user_id, event_id, event_type
            FROM (
                SELECT user_id, event_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            )
            WHERE rn = 1 ORDER BY user_id
        """,
        # NTILE ties are broken by o_orderkey → deterministic tiles.
        "orders_spend_quartiles": """
            SELECT o_custkey, o_orderkey,
                   CAST(NTILE(4) OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey)
                        AS BIGINT) AS spend_quartile
            FROM orders ORDER BY o_orderkey
        """,
        # LEFT OUTER JOIN + zero-fill: the right side is filtered in the
        # join condition (not WHERE — that would kill the null-extended
        # rows); all hashed outputs are exact int64 cents.
        "customers_urgent_order_counts": """
            SELECT c_custkey,
                   COUNT(o_orderkey) AS n_urgent,
                   CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
                        AS BIGINT) AS urgent_cents
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
            GROUP BY c_custkey ORDER BY c_custkey
        """,
        # FULL OUTER JOIN of the two activity rollups; ids 150+ order but
        # never emit events, so the null-extended branch is real.
        "activity_full_outer": """
            WITH e AS (SELECT user_id AS id, COUNT(*) AS n_events
                       FROM events GROUP BY 1),
                 o AS (SELECT o_custkey AS id, COUNT(*) AS n_orders
                       FROM orders GROUP BY 1)
            SELECT COALESCE(e.id, o.id) AS id,
                   COALESCE(e.n_events, 0) AS n_events,
                   COALESCE(o.n_orders, 0) AS n_orders
            FROM e FULL OUTER JOIN o ON e.id = o.id
            ORDER BY id
        """,
        # Correlated scalar subquery, decorrelated; the strictly-above-
        # average test is the integer cross-multiplication cents·n >
        # sum_cents — no float division on either engine.
        "orders_above_cust_avg": """
            WITH o AS (
                SELECT o_orderkey, o_custkey,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                FROM orders
            ), s AS (
                SELECT o_custkey, COUNT(*) AS n, SUM(cents) AS sc
                FROM o GROUP BY 1
            )
            SELECT o.o_orderkey, o.o_custkey
            FROM o JOIN s USING (o_custkey)
            WHERE o.cents * s.n > s.sc
            ORDER BY o.o_orderkey
        """,
        # PERCENT_RANK/CUME_DIST: the unique (price DESC, orderkey) order
        # makes ranks deterministic; both values are one IEEE division of
        # exact int64 counts → bit-identical across engines.
        "orders_price_percentiles": """
            SELECT o_custkey, o_orderkey,
                   PERCENT_RANK() OVER w AS pct_rank,
                   CUME_DIST() OVER w AS cume_dist
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey)
            ORDER BY o_orderkey
        """,
        # Per-group MODE with lexicographic tie-break.
        "events_top_type_per_day": """
            WITH c AS (
                SELECT CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT) AS ymd,
                       event_type, COUNT(*) AS n_events
                FROM events GROUP BY 1, 2
            )
            SELECT ymd, event_type AS top_type, n_events FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY ymd ORDER BY n_events DESC, event_type
                ) AS rn FROM c
            ) WHERE rn = 1 ORDER BY ymd
        """,
        # GROUP BY + HAVING (threshold 18 is non-empty at sf0.001 and 0.01).
        "repeat_customers": """
            SELECT o_custkey, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
            HAVING COUNT(*) >= 18 ORDER BY o_custkey
        """,
        # Scalar string functions — names are ASCII so char and codeunit
        # slicing agree.
        "customer_name_features": """
            SELECT c_custkey,
                   UPPER(c_name) AS name_upper,
                   LENGTH(c_name) AS name_len,
                   REVERSE(c_name) AS name_rev,
                   SUBSTRING(c_name, 1, 8) AS name_prefix,
                   c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag
            FROM customer ORDER BY c_custkey
        """,
        # Exact grouped sample variance from integer moments (HUGEINT sums
        # ≡ the engine's arbitrary-precision Python ints); the only floats
        # are the final two casts + one division, identical on both sides.
        "orders_spend_variance": """
            WITH o AS (
                SELECT o_custkey,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
                FROM orders
            ), a AS (
                SELECT o_custkey, COUNT(*) AS n_orders,
                       SUM(CAST(c AS HUGEINT)) AS s,
                       SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q
                FROM o GROUP BY 1
            )
            SELECT o_custkey, n_orders,
                   CAST(n_orders * q - s * s AS DOUBLE)
                       / CAST(n_orders * (n_orders - 1) AS DOUBLE) AS var_cents2
            FROM a WHERE n_orders > 1 ORDER BY o_custkey
        """,
        # Banded range join + integer-exact aggregate: [ts, ts+1d) is the
        # half-open band interval_join implements (>= lo, < hi).
        "events_click_attribution": """
            SELECT c.event_id,
                   COUNT(*) AS n_purchases,
                   SUM(CAST(FLOOR(p.value * 100 + 0.5) AS BIGINT)) AS value_cents
            FROM events c JOIN events p
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase'
             AND p.ts >= c.ts
             AND p.ts < c.ts + INTERVAL 1 DAY
            WHERE c.event_type = 'click'
            GROUP BY c.event_id ORDER BY c.event_id
        """,
        # IN-subquery semi-join (bloom prefilter + exact verify on the Ray
        # side; plain IN here).
        "orders_from_event_users": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT user_id FROM events)
            ORDER BY o_orderkey
        """,
        # Ordered string_agg — deterministic because the element order is
        # pinned by c_custkey on both engines.
        "nation_customer_names": """
            SELECT c_nationkey,
                   string_agg(c_name, '|' ORDER BY c_custkey) AS names
            FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        # Benchmark decontamination: distinct 5-gram word-shingle overlap
        # vs the doc_id%17=3 benchmark slice.  The engine compares 64-bit
        # shingle hashes (broadcast set), the oracle joins shingle strings
        # — equality coincides unless two distinct 5-grams collide in 64
        # bits.  All hashed outputs are int64.
        "docs_decontaminate": """
            WITH tok AS (
              SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+') AS toks
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       UNNEST([array_to_string(toks[i:i+4], ' ')
                               FOR i IN RANGE(1, LEN(toks)-3)]) AS s
                FROM tok
              )
            ), bench AS (
              SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 3
            ), hits AS (
              SELECT c.doc_id, COUNT(*) AS n_overlap
              FROM sh c JOIN bench b USING (s)
              WHERE c.doc_id % 17 <> 3
              GROUP BY c.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
                   CAST(CASE WHEN COALESCE(h.n_overlap, 0) > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 17 <> 3
            ORDER BY d.doc_id
        """,
        # Stratified per-language sample: the multiplicative scramble is
        # injective mod 2^32, so both engines pick the identical 20 docs
        # per lang; integer arithmetic only.
        "docs_stratified_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 20 ORDER BY lang, doc_id
        """,
        # Ordered conversion funnel: stage k's cutoff is stage k-1's MIN
        # qualifying time; 24 h windows, all comparisons on exact
        # timestamps, outputs are counts.
        "events_funnel": """
            WITH s1 AS (
                SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, MIN(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click'
                  AND e.ts >= s1.t1 AND e.ts < s1.t1 + INTERVAL 24 HOUR
                GROUP BY 1
            ), s3 AS (
                SELECT e.user_id, MIN(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND e.ts >= s2.t2 AND e.ts < s2.t2 + INTERVAL 24 HOUR
                GROUP BY 1
            )
            SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
            UNION ALL SELECT '2_click', COUNT(*) FROM s2
            UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
            ORDER BY stage
        """,
        # Exact interpolated quartiles over int64 cents: dyadic q's make
        # lo + frac*(hi-lo) exact in double on both engines.
        "orders_price_quartiles_cont": """
            SELECT o_custkey,
                   QUANTILE_CONT(cents, 0.25) AS q25_cents,
                   QUANTILE_CONT(cents, 0.5)  AS q50_cents,
                   QUANTILE_CONT(cents, 0.75) AS q75_cents
            FROM (
                SELECT o_custkey,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                FROM orders
            )
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        # Adjacent-bigram collocations: exact integer sufficient statistics
        # (n_xy, n_x, n_y) for PMI-style scoring; single-space tokenization
        # on both sides.
        "docs_collocations": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents
            ), idx AS (
              SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM t
            ), big AS (
              SELECT l[i] AS w1, l[i+1] AS w2 FROM idx
            ), uni AS (
              SELECT unnest(l) AS term FROM t
            ), un AS (
              SELECT term, COUNT(*)::BIGINT AS n FROM uni GROUP BY 1
            ), bc AS (
              SELECT w1, w2, COUNT(*)::BIGINT AS n_xy FROM big
              GROUP BY 1, 2 HAVING COUNT(*) >= 5
            )
            SELECT bc.w1, bc.w2, bc.n_xy, ux.n AS n_x, uy.n AS n_y
            FROM bc
            JOIN un ux ON ux.term = bc.w1
            JOIN un uy ON uy.term = bc.w2
            ORDER BY w1, w2
        """,
        # Substring-dedup rewrite: duplicated 10-token spans survive only in
        # their smallest-id doc; other occurrences' tokens are stripped and
        # the text rebuilt.  Engine hashes spans, the oracle joins strings.
        "docs_strip_dup_spans": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            idx AS (
              SELECT doc_id, l, unnest(range(1, len(l) - 10 + 2)) AS i FROM t
            ),
            sp AS (
              SELECT doc_id, i, array_to_string(l[i:i+9], ' ') AS s FROM idx
            ),
            dup AS (
              SELECT s, MIN(doc_id) AS keep_doc FROM sp
              GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            hits AS (
              SELECT sp.doc_id, sp.i FROM sp JOIN dup ON sp.s = dup.s
              WHERE sp.doc_id <> dup.keep_doc
            ),
            cover AS (
              SELECT DISTINCT doc_id, unnest(range(i, i + 10)) AS j FROM hits
            ),
            tok AS (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS j FROM t),
            kept AS (
              SELECT tok.doc_id,
                     string_agg(tok.l[tok.j], ' ' ORDER BY tok.j)
                       FILTER (WHERE c.j IS NULL) AS text_clean,
                     COUNT(c.j)::BIGINT AS n_tokens_removed
              FROM tok LEFT JOIN cover c
                ON c.doc_id = tok.doc_id AND c.j = tok.j
              GROUP BY tok.doc_id
            )
            SELECT doc_id, COALESCE(text_clean, '') AS text_clean,
                   n_tokens_removed
            FROM kept ORDER BY doc_id
        """,
        # Duplicate-span mining: per doc, its distinct 10-token spans that
        # occur in >= 2 docs.  Same hash-vs-string shingle equality caveat
        # as docs_decontaminate; outputs are int64 counts.
        "docs_dup_spans": """
            WITH tok AS (
              SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+') AS toks
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       UNNEST([array_to_string(toks[i:i+9], ' ')
                               FOR i IN RANGE(1, LEN(toks)-8)]) AS s
                FROM tok
              )
            ), dup AS (
              SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
            ), cnt AS (
              SELECT doc_id, COUNT(*) AS n_dup_spans
              FROM sh JOIN dup USING (s) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
            FROM documents d LEFT JOIN cnt c USING (doc_id)
            ORDER BY d.doc_id
        """,
        # Cohort retention: COUNT(*) over distinct (user, day) pairs ==
        # distinct users per (cohort, offset) cell; all-integer epoch-day
        # arithmetic.
        "events_retention": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
                FROM events
            ), c AS (
                SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1
            )
            SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
                   COUNT(*) AS n_users
            FROM ud JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Sequence packing (concat-then-chunk, per shard = doc_id % 16,
        # 128-token chunks): chunk = exclusive-prefix-sum // budget in
        # doc_id order; tokens = spaces+1, integer arithmetic only.
        "docs_pack_chunks": """
            SELECT doc_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // 128 AS BIGINT) AS chunk_id
            FROM (
                SELECT doc_id, doc_id % 16 AS shard,
                       LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                           AS n_tokens
                FROM documents
            )
            ORDER BY doc_id
        """,
        # Domain-mixture downsampling: keep-fraction 1/(1 + src_num % 4),
        # membership by the injective multiplicative scramble — both
        # engines compare the same int64s against the same thresholds.
        "docs_domain_mix": """
            SELECT doc_id, source
            FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 <
                  4294967296 // (1 + CAST(SUBSTR(source, 4) AS BIGINT) % 4)
            ORDER BY doc_id
        """,
        # JSON property extraction: both engines pull the integer k out
        # of the props JSON text and aggregate; sum rounds to 6dp on both
        # sides so summation order can't flip the hash.
        "events_props_agg": """
            SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events
            GROUP BY 1 ORDER BY 1
        """,
        # Dense (day × type) grid, zero-filled: RANGE spans min..max day
        # inclusive so days with no events at all still appear.
        "events_daily_gapfill": """
            WITH b AS (
                SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
                       event_type
                FROM events
            ), d AS (
                SELECT UNNEST(RANGE((SELECT MIN(day) FROM b),
                                    (SELECT MAX(day) FROM b) + 1)) AS day
            ), t AS (
                SELECT DISTINCT event_type FROM b
            ), c AS (
                SELECT day, event_type, COUNT(*) AS n FROM b GROUP BY 1, 2
            )
            SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
            FROM d CROSS JOIN t
            LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
            ORDER BY 1, 2
        """,
        # Per-user lifetime: FIRST/LAST with an explicit (ts, event_id)
        # order — the deterministic ROW_NUMBER()=1 semantics; span in
        # integer microseconds (epoch_us), no float time arithmetic.
        "events_user_lifetime": """
            SELECT user_id,
                   FIRST(event_type ORDER BY ts, event_id) AS first_type,
                   LAST(event_type ORDER BY ts, event_id)  AS last_type,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts))   AS span_us,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY user_id ORDER BY user_id
        """,
        # Linear model scoring: identical products + same 3-term sum
        # order on both engines; rounded to 6dp on both sides.
        "docs_model_score": """
            SELECT doc_id,
                   ROUND(0.001 * n_chars
                         + 0.05 * (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                         - 0.2  * (LENGTH(text) - LENGTH(REPLACE(text, '.', '')))
                         + 1.5, 6) AS score
            FROM documents ORDER BY doc_id
        """,
        # 3σ outliers with NO float boundary: values are exact cents, so
        # |v-m| > 3σ  ⇔  (n·vc − s1)² > 9·(n·s2 − s1²), all int64.
        "events_anomalies": """
            WITH c AS (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc
                FROM events
            ), s AS (
                SELECT event_type, COUNT(*) AS n, SUM(vc) AS s1,
                       SUM(vc * vc) AS s2
                FROM c GROUP BY 1
            )
            SELECT c.event_id, c.event_type, c.vc
            FROM c JOIN s USING (event_type)
            WHERE (s.n * c.vc - s.s1) * (s.n * c.vc - s.s1)
                  > 9 * (s.n * s.s2 - s.s1 * s.s1)
            ORDER BY c.event_id
        """,
        # Global-percentile gate: QUANTILE_DISC picks an actual data
        # value (integer), so the threshold compare is exact.
        "docs_above_p90": """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars >= (SELECT QUANTILE_DISC(n_chars, 0.9) FROM documents)
            ORDER BY doc_id
        """,
        # Markov transition counts: LEAD over the per-user ordered stream.
        "events_transitions": """
            WITH o AS (
                SELECT user_id, event_type,
                       LEAD(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS next_type
                FROM events
            )
            SELECT event_type, next_type, COUNT(*) AS n
            FROM o WHERE next_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Incremental-ingest dedup: engine compares 64-bit content
        # hashes, the oracle compares strings — equal unless two
        # distinct texts collide in 64 bits.
        "docs_incremental_new": """
            SELECT doc_id FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM documents b
                WHERE b.doc_id % 10 = 0 AND b.text = d.text
            )
            ORDER BY doc_id
        """,
        # Group-wise z-score from integer moments: both engines feed the
        # IDENTICAL int64s into the same formula, so the doubles match
        # bit-for-bit before the 6dp round.
        "docs_chars_zscore": """
            WITH s AS (
                SELECT lang, COUNT(*) AS n, SUM(n_chars) AS s1,
                       SUM(n_chars * n_chars) AS s2
                FROM documents GROUP BY 1
            )
            SELECT d.doc_id, d.lang,
                   ROUND((s.n * d.n_chars - s.s1)
                         / SQRT(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)),
                         6) AS z
            FROM documents d JOIN s USING (lang)
            ORDER BY d.doc_id
        """,
        # Inverted index: distinct (doc, term) pairs, then per-term df +
        # the ordered posting list — element order pinned by doc_id so
        # the string compares byte-equal.
        "docs_inverted_index": """
            SELECT term, COUNT(*) AS df,
                   STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                       AS postings
            FROM (
                SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           LOWER(UNNEST(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+')))
                               AS term
                    FROM documents
                )
            )
            GROUP BY term ORDER BY term
        """,
        # Remaining queries (fingerprint/minhash/simhash/LSH ANN/
        # embedding-dup/semdedup/crawl/media) are genuinely non-SQL-expressible
        # (iterative/probabilistic algorithms) → rows-only driver check,
        # each pinned to a hard local oracle in tests/test_local_oracles.py.
    }
