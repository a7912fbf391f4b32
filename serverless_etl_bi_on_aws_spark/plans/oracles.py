"""DuckDB oracle SQL — the ANSI-SQL twin of every oracle-checkable query in
plans/queries.py. The driver registers the fixture parquet files as views
named region/nation/customer/supplier/part/orders/lineitem/events/documents/
embeddings, runs each pair at sf0.01, and hash-compares (count, schema,
order-insensitive values).

Alignment rules (mirrored in queries.py):
  * identical output column names and rounding;
  * count()-style columns cast to BIGINT (DuckDB SUM(int) is HUGEINT);
  * year()/month()/row_number() cast to INT (Spark emits 32-bit there);
  * timestamps exported as DATE or epoch-micros BIGINT.

Since the round-7 surface consolidation there is NO rows-only entry:
every driver query has a value oracle here, and the engine-defined
sketch/ANN operators are value-gated through their verification queries
(q13_sketch_neardup_verify / q18_ann_verify). EXTRA_ORACLE_SQL carries
the oracles for the off-driver EXTRA tier (pytest + compare_oracle
gated); EXTRA entries without an oracle are pytest-pinned to exact
twins.
"""

from __future__ import annotations

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                 AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                            AS sum_base_price,
               -- exact scaled-long sum, cents rounded integer-side: the (A, O)
               -- group's 4dp sum ends in .xx50, so ROUND(SUM(double)) flips
               -- the cent with summation order (see queries.q1 note)
               CAST((CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100 AS DOUBLE) / 100 AS sum_disc_price,
               -- same scheme for charge (exact 6dp), split into integer /
               -- fraction long sums so neither overflows before ~1e11
               -- rows/group; reassembled exactly (1e6 is divisible by 1e4)
               CAST(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT) // 1000000) AS BIGINT) * 100
                    + (CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT) % 1000000) AS BIGINT) + 5000) // 10000
                    AS DOUBLE) / 100 AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                 AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                            AS avg_price,
               ROUND(AVG(l_discount), 4)                                 AS avg_disc,
               COUNT(*)                                                  AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q2_denorm_customer_orders": """
        SELECT c_custkey, c_name, c_mktsegment, o_orderkey, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q3_sales_by_category": """
        SELECT p_type                                   AS category,
               CAST(year(o_orderdate) AS INT)           AS order_year,
               COUNT(*)                                 AS n_sold,
               CAST((CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100 AS DOUBLE) / 100 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey  = p_partkey
        GROUP BY category, order_year
        ORDER BY category, order_year
    """,
    "q4_funnel_counts": """
        SELECT event_type,
               CAST(year(ts) AS INT)  AS year,
               CAST(month(ts) AS INT) AS month,
               COUNT(*)               AS n_events,
               ROUND(SUM(value), 2)   AS sum_value
        FROM events
        GROUP BY event_type, year, month
        ORDER BY event_type, year, month
    """,
    "q5_incremental_window": """
        SELECT COUNT(*)                    AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice
        FROM orders
        WHERE o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 3 MONTH FROM orders)
    """,
    "q6_topk_cosine": """
        WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               ROUND(list_cosine_similarity(embedding::DOUBLE[], q.e), 6) AS cosine
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.e) DESC, vec_id
        LIMIT 10
    """,
    "q7_text_stats": """
        SELECT lang,
               COUNT(*)                                        AS n_docs,
               ROUND(AVG(n_chars), 4)                          AS avg_chars,
               ROUND(AVG(len(string_split(text, ' '))), 4)     AS avg_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "q8_view_not_buy": """
        WITH recent AS (
            SELECT * FROM events
            WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
        ), per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)     AS n_views,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_buys
            FROM recent GROUP BY user_id
        )
        SELECT c_custkey, c_name, c_mktsegment, n_views
        FROM per_user JOIN customer ON user_id = c_custkey
        WHERE n_views > 0 AND n_buys = 0
        ORDER BY c_custkey
    """,
    "q9_merge_upsert": """
        WITH staging AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + 100000.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '2001-03-01'
        ), final AS (
            SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-06-01'
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        FROM (
            SELECT * FROM final
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staging)
            UNION ALL
            SELECT * FROM staging
        )
    """,
    "q10_top_customers_per_segment": """
        WITH rev AS (
            SELECT c_mktsegment, c_custkey,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment, c_custkey
        ), ranked AS (
            SELECT c_mktsegment, c_custkey, revenue,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY c_mktsegment
                        ORDER BY revenue DESC, c_custkey) AS INT) AS rn
            FROM rev
        )
        SELECT * FROM ranked WHERE rn <= 3
        ORDER BY c_mktsegment, rn
    """,
    "q11_latest_event_per_user_type": """
        WITH ranked AS (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts DESC, event_id) AS rn
            FROM events
        )
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        FROM ranked WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    "q12_neardup_jaccard": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  FOR i IN range(1, len(t) - 1)]) AS s
            FROM toks WHERE len(t) >= 3
        ), tok AS (
            SELECT doc_id, unnest(s) AS shingle FROM sh
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
            FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_1, id_2,
               ROUND(i * 1.0 / (s1.n + s2.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.5
        ORDER BY id_1, id_2
    """,
    "q15_doc_quality_by_source": """
        WITH scored AS (
            SELECT source,
                   len(string_split(text, ' '))                       AS n_toks,
                   len(list_distinct(string_split(text, ' ')))        AS n_distinct,
                   len(replace(text, ' ', ''))                        AS tok_chars
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(
                   0.4 * LEAST(CAST(n_toks AS DOUBLE) / 100.0, 1.0)
                 + 0.3 * (CAST(n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE))
                 + 0.3 * LEAST((CAST(tok_chars AS DOUBLE) / CAST(n_toks AS DOUBLE)) / 8.0, 1.0)
               ), 6) AS avg_quality,
               ROUND(AVG(n_toks), 4) AS avg_tokens,
               ROUND(AVG(CAST(tok_chars AS DOUBLE) / CAST(n_toks AS DOUBLE)), 4) AS avg_token_len
        FROM scored
        GROUP BY source
        ORDER BY source
    """,
    "q16_props_json_stats": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q17_session_stats": """
        WITH lagged AS (
            SELECT user_id, event_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN prev IS NULL
                             OR epoch_us(ts) - epoch_us(prev) > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM lagged
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ), per_session AS (
            SELECT user_id, session_id, COUNT(*) AS n,
                   (max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6 AS dur
            FROM sess GROUP BY user_id, session_id
        )
        SELECT COUNT(*) AS n_sessions,
               ROUND(AVG(n), 4)   AS avg_events_per_session,
               ROUND(AVG(dur), 4) AS avg_duration_sec
        FROM per_session
    """,
    "q19_top_tokens": """
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """,
    "q20_lang_id_naive_bayes": """
        WITH doc_tokens AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), dt AS (
            SELECT doc_id, token, COUNT(*) AS m FROM doc_tokens GROUP BY 1, 2
        ), profile AS (
            SELECT lang AS cand_lang, token, COUNT(*) AS cnt FROM doc_tokens GROUP BY 1, 2
        ), lang_totals AS (
            SELECT lang AS cand_lang, COUNT(*) AS total FROM doc_tokens GROUP BY 1
        ), vocab AS (
            SELECT COUNT(DISTINCT token) AS v FROM doc_tokens
        ), nd AS (
            SELECT COUNT(*) AS nd FROM documents
        ), priors AS (
            SELECT lang AS cand_lang, ln(COUNT(*) * 1.0 / (SELECT nd FROM nd)) AS logprior
            FROM documents GROUP BY lang
        ), scored AS (
            SELECT dt.doc_id, lt.cand_lang,
                   ROUND(pr.logprior + SUM(
                       dt.m * ln(CAST(COALESCE(prof.cnt, 0) + 1 AS DOUBLE)
                                 / CAST(lt.total + v.v AS DOUBLE))
                   ), 4) AS score
            FROM dt
            CROSS JOIN lang_totals lt
            JOIN priors pr         ON pr.cand_lang = lt.cand_lang
            LEFT JOIN profile prof ON prof.cand_lang = lt.cand_lang AND prof.token = dt.token
            CROSS JOIN vocab v
            GROUP BY dt.doc_id, lt.cand_lang, pr.logprior
        ), ranked AS (
            SELECT doc_id, cand_lang, score,
                   ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn
            FROM scored
        )
        SELECT r.doc_id, d.lang, r.cand_lang AS pred_lang, r.score
        FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
        WHERE r.rn = 1
        ORDER BY r.doc_id
    """,
    "q21_revenue_by_region": """
        SELECT r_name                          AS region,
               CAST(year(l_shipdate) AS INT)   AS ship_year,
               COUNT(*)                        AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q22_priority_status_matrix": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q24_embedding_similar_pairs": """
        WITH normed AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), pairs AS (
            SELECT a.vec_id AS id_1, b.vec_id AS id_2,
                   list_cosine_similarity(a.v, b.v) AS c
            FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        )
        SELECT id_1, id_2, ROUND(c, 6) AS cosine
        FROM pairs
        ORDER BY c DESC, id_1, id_2
        LIMIT 20
    """,
    "q25_doc_fingerprint": """
        WITH h AS (
            SELECT doc_id,
                   [('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647
                    FOR t IN string_split(text, ' ')] AS hs
            FROM documents
        )
        SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT, hs),
                           (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
        FROM h
        ORDER BY doc_id
    """,
    # q28: the exact columns are recomputed (DuckDB quantile_cont shares
    # Spark percentile's 1+(n-1)p interpolation — verified bit-exact); the
    # sketch columns are exported as within-tolerance BOOLEANS, expected
    # TRUE, so an out-of-tolerance HLL / percentile sketch flips the hash
    "q28_approx_aggregates": """
        SELECT l_returnflag,
               COUNT(*)                                       AS n_items,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)     AS exact_orders,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
               TRUE AS hll_within_15pct,
               TRUE AS p50_approx_within_5pct,
               TRUE AS p99_approx_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q29_regex_token_stats": """
        WITH p AS (
            SELECT lang, n_chars,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n), 4) AS avg_pieces,
               ROUND(AVG(n * 100.0 / n_chars), 4) AS pieces_per_100_chars
        FROM p
        GROUP BY lang
        ORDER BY lang
    """,
    "q30_asof_last_purchase": """
        WITH views AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        ), buys AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        )
        SELECT v.event_id, v.user_id, epoch_us(v.ts) AS ts_us,
               ROUND(b.value, 2) AS last_purchase_value
        FROM views v
        ASOF LEFT JOIN buys b ON v.user_id = b.user_id AND v.ts >= b.ts
        ORDER BY v.event_id
    """,
    # Range-join comparisons run in exact integer MICROS on both engines:
    # the fixture timestamps carry sub-microsecond nanos that Spark truncates
    # at load (catalog.load_table, `div 1000`), so a nanos-precision DuckDB
    # predicate could flip boundary rows the micros engine keeps.
    "q31_incident_window_counts": """
        WITH inc AS (
            SELECT event_id AS incident_id, epoch_us(ts) AS t0_us
            FROM events WHERE event_type = 'error'
        )
        SELECT i.incident_id,
               COUNT(*)               AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM inc i
        JOIN events e
          ON epoch_us(e.ts) >= i.t0_us
         AND epoch_us(e.ts) <  i.t0_us + 1800000000
        GROUP BY i.incident_id
        ORDER BY i.incident_id
    """,
    "q32_time_bucket_rollup": """
        SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
               event_type,
               COUNT(*)                 AS n_events,
               ROUND(SUM(value), 2)     AS sum_value,
               COUNT(DISTINCT user_id)  AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q33_moving_avg_revenue": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
            FROM orders GROUP BY 1
        )
        SELECT d,
               ROUND(rev, 2) AS revenue,
               ROUND(AVG(rev) OVER (
                   ORDER BY date_diff('day', DATE '1970-01-01', d)
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 4) AS ma7
        FROM daily
        ORDER BY d
    """,
    "q34_lapsed_customers": """
        SELECT n.n_name,
               COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS acctbal_sum
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    "q35_embedding_centroids": """
        SELECT e.label,
               t.dim,
               ROUND(AVG(e.embedding[t.dim + 1]), 6) AS centroid_val,
               COUNT(*) AS n_vecs
        FROM embeddings e, range(64) t(dim)
        GROUP BY e.label, t.dim
        ORDER BY e.label, t.dim
    """,
    "q36_funnel_set_ops": """
        SELECT user_id, d FROM (
            SELECT user_id, CAST(ts AS DATE) AS d
            FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id, CAST(ts AS DATE) AS d
            FROM events WHERE event_type = 'purchase'
        )
        EXCEPT
        SELECT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE event_type = 'error'
        ORDER BY user_id, d
    """,
    "q37_train_val_test_split": """
        WITH assigned AS (
            SELECT lang, n_chars,
                   (doc_id * 2654435761) % 100 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM assigned
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q38_chunked_docs": """
        WITH tok AS (
            SELECT doc_id,
                   string_split(text, ' ') AS tokens,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ), st AS (
            SELECT doc_id, tokens, n,
                   unnest(range(0, n, 40)) AS start
            FROM tok
        )
        SELECT doc_id,
               start // 40 AS chunk_id,
               LEAST(50, n - start) AS n_tokens_chunk,
               md5(array_to_string(tokens[start + 1 : start + 50], ' ')) AS chunk_md5
        FROM st
        ORDER BY doc_id, chunk_id
    """,
    "q40_pack_token_shards": """
        WITH toks AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM toks
        )
        SELECT CAST(cum_before // 5000 AS BIGINT) AS shard_id,
               COUNT(*)       AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(doc_id)    AS first_doc,
               MAX(doc_id)    AS last_doc
        FROM packed
        GROUP BY 1
        ORDER BY 1
    """,
    "q41_pack_shards_by_lang": """
        WITH toks AS (
            SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT lang, doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM toks
        )
        SELECT lang,
               CAST(cum_before // 2000 AS BIGINT) AS shard_id,
               COUNT(*)      AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM packed
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q26_distinct_users": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*)                AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q27_funnel_conversion_lag": """
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)     AS v,
                   min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
            FROM events
            WHERE event_type IN ('view', 'purchase')
            GROUP BY user_id
        ), lags AS (
            SELECT user_id, (p - v) / 1e6 AS lag_sec
            FROM per_user
            WHERE v IS NOT NULL AND p IS NOT NULL AND p > v
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_converted,
               ROUND(AVG(lag_sec), 4) AS avg_lag_sec
        FROM lags JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q39_cube_event_matrix": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(year(ts), -1)      AS yr,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY CUBE(event_type, year(ts))
        ORDER BY 1, 2
    """,
    "q23_rollup_order_counts": """
        SELECT COALESCE(o_orderstatus, 'ALL')   AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COUNT(*)                    AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY 1, 2
    """,
    # q43: DOUBLE[] cast before the cosine, like q24 — the engine normalizes
    # float32 inputs in float64, so the oracle must too or the 6th decimal
    # of ROUND diverges. Zero-norm guard (list_inner_product(v,v) > 0): DuckDB's
    # list_cosine_similarity yields NaN on a zero vector and NaN satisfies
    # the >= threshold under its float ordering, while the Spark operator
    # clamps zero-norm cosine to 0 — without the guard a future fixture
    # containing a zero vector flips the oracle.
    "q43_neardup_embedding_cosine": """
        WITH normed AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
        )
        SELECT a.vec_id AS id_1, b.vec_id AS id_2,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        ORDER BY 3 DESC, 1, 2
    """,
    # q46 computes q3 over co-bucketed tables — layout cannot change values,
    # so the oracle is q3's SQL verbatim.
    "q46_sales_by_category_bucketed": """
        SELECT p_type                                   AS category,
               CAST(year(o_orderdate) AS INT)           AS order_year,
               COUNT(*)                                 AS n_sold,
               CAST((CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100 AS DOUBLE) / 100 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey  = p_partkey
        GROUP BY category, order_year
        ORDER BY category, order_year
    """,
    # q42: the PNG payloads are deterministic functions of doc_id (gradient
    # (x*3 + y*5 + k) % 256 at w=32+k%32, h=32+7k%32, nearest-neighbor
    # resized to 8x8 with sx = min(ox*w//8, w-1)), so the oracle recomputes
    # the expected pixel statistics INDEPENDENTLY in SQL — a full value
    # check of encode -> real stdlib PNG decode -> resize -> aggregate.
    # px_mean values are exact multiples of 1/64, so sums are exact and
    # cross-engine rounding is stable.
    "q42_media_pixel_stats": """
        WITH px AS (
            SELECT d.doc_id, d.source,
                   AVG(((LEAST(ox.g * (32 + d.doc_id % 32) // 8, 32 + d.doc_id % 32 - 1)) * 3
                      + (LEAST(oy.g * (32 + (d.doc_id * 7) % 32) // 8, 32 + (d.doc_id * 7) % 32 - 1)) * 5
                      + d.doc_id) % 256) AS px_mean
            FROM documents d,
                 generate_series(0, 7) AS ox(g),
                 generate_series(0, 7) AS oy(g)
            GROUP BY d.doc_id, d.source
        )
        SELECT source,
               COUNT(*)                       AS n_docs,
               ROUND(AVG(px_mean), 4)         AS avg_brightness,
               ROUND(MIN(px_mean), 4)         AS min_brightness,
               ROUND(MAX(px_mean), 4)         AS max_brightness
        FROM px
        GROUP BY source
        ORDER BY source
    """,
    # q47 serves q1 from the materialized pricing rollup — exact scaled-long
    # partials make the layout value-preserving, so the oracle is q1's SQL
    # (set verbatim below the literal to stay textually identical to q1's).
    # q44 computes the same result as q6 through the Arrow/BLAS path; the
    # oracle is therefore q6's SQL verbatim.
    "q44_topk_cosine_arrow": """
        WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               ROUND(list_cosine_similarity(embedding::DOUBLE[], q.e), 6) AS cosine
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.e) DESC, vec_id
        LIMIT 10
    """,
}

ORACLE_SQL["q47_pricing_summary_rollup"] = ORACLE_SQL["q1_pricing_summary"]

# q48 runs the watermarked streaming funnel (AvailableNow, complete mode)
# whose drained result must equal the batch rollup of the same 6-hour
# windows — q32's buckets minus the distinct count (unsupported in
# streaming aggs), so every value cell is one q32 already audits.
# q50: the survivor set under connected-component dedup is fully
# SQL-expressible — the recursive CTE computes each node's reachable set
# over the symmetrized q43 pair graph and takes the minimum as the
# component label; survivors = component minima + rows in no pair. This
# independently validates the Spark-side iterative min-label propagation.
ORACLE_SQL["q50_dedup_survivors_cc"] = """
    WITH RECURSIVE normed AS (
        -- zero-norm guard: see q43's oracle note (NaN cosine knife-edge)
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    pairs AS (
        SELECT a.vec_id AS id_1, b.vec_id AS id_2
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ),
    edges AS (
        SELECT id_1 AS s, id_2 AS d FROM pairs
        UNION ALL
        SELECT id_2, id_1 FROM pairs
    ),
    reach(id, r) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.r FROM edges e JOIN reach r ON e.s = r.id
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    dropped AS (SELECT id FROM comp WHERE comp <> id)
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id
    WHERE d.id IS NULL
    ORDER BY e.vec_id
"""

# q91: leakage-safe splits are fully SQL-expressible — the recursive CTE
# recomputes the q50 components over the same cosine pair graph, every
# row's split key is COALESCE(component, own id), and the split is the
# q37 Knuth multiplicative hash applied to that KEY (not the row id), so
# all members of a near-dup cluster provably share one split. A wrong
# Spark-side label, a dropped singleton, or a hash drift flips the hash.
ORACLE_SQL["q91_cluster_safe_split_verify"] = """
    WITH RECURSIVE normed AS (
        -- zero-norm guard: see q43's oracle note (NaN cosine knife-edge)
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    pairs AS (
        SELECT a.vec_id AS id_1, b.vec_id AS id_2
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ),
    edges AS (
        SELECT id_1 AS s, id_2 AS d FROM pairs
        UNION ALL
        SELECT id_2, id_1 FROM pairs
    ),
    reach(id, r) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.r FROM edges e JOIN reach r ON e.s = r.id
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    keyed AS (
        SELECT e.vec_id,
               CAST(COALESCE(c.comp, e.vec_id) AS BIGINT) AS split_key
        FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
    )
    SELECT vec_id, split_key,
           CASE WHEN (split_key * 2654435761) % 100 < 80 THEN 'train'
                WHEN (split_key * 2654435761) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
    ORDER BY vec_id
"""

# q97: fractional-epoch upsampling is exact integer arithmetic — the
# oracle replays the per-ten-thousandths rule (r//10000 copies + 1 iff
# the multiplicative-hash bucket mod 10000 < r%10000) and materializes
# every copy with generate_series; zh (0 epochs) contributes no rows,
# strata follow the planted en/de/es/fr factors.
ORACLE_SQL["q97_epoch_mix_verify"] = """
    WITH f AS (
        SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 25000
                         WHEN 'es' THEN 2500 WHEN 'fr' THEN 30000
                         WHEN 'zh' THEN 0 ELSE 10000 END AS r
        FROM documents
    ), n AS (
        SELECT doc_id, lang,
               r // 10000
               + CASE WHEN (doc_id * 2654435761) % 10000 < r % 10000
                      THEN 1 ELSE 0 END AS n_copies
        FROM f
    )
    SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy_idx
    FROM n
    WHERE n_copies > 0
    ORDER BY doc_id, copy_idx
"""

# q98: the WARC fixture is pure doc_id arithmetic, so the oracle
# rebuilds every response body's EXACT html string in SQL and measures
# it — record counts per type (8 warcinfo, one request+response per
# doc under the cap), the planted payload-truncated record in
# quarantine, the 200/404 split, total html chars, and the extracted
# main text (= the 8-word <p> block: head/title subtree and script are
# dropped, words joined by single spaces).
ORACLE_SQL["q98_warc_ingest_verify"] = """
    WITH d AS (SELECT doc_id AS k FROM documents WHERE doc_id < 2000),
    s AS (
        SELECT k,
               'w'||(k*13+0)||' '||'w'||(k*13+1)||' '||'w'||(k*13+2)||' '
               ||'w'||(k*13+3)||' '||'w'||(k*13+4)||' '||'w'||(k*13+5)||' '
               ||'w'||(k*13+6)||' '||'w'||(k*13+7) AS words
        FROM d
    ),
    m AS (
        SELECT k, LENGTH(words) AS wlen,
               LENGTH('<html><head><title>t'||k||'</title></head><body><p>'
                      ||words||'</p><script>junk '||k
                      ||'</script></body></html>') AS hlen,
               CASE WHEN k % 10 <> 0 THEN 1 ELSE 0 END AS ok200
        FROM s
    )
    SELECT metric, value FROM (
        SELECT 'extracted_chars' AS metric,
               CAST(SUM(wlen) AS BIGINT) AS value FROM m
        UNION ALL SELECT 'html_chars', CAST(SUM(hlen) AS BIGINT) FROM m
        UNION ALL SELECT 'quarantined', CAST(1 AS BIGINT)
        UNION ALL SELECT 'request_records', CAST(COUNT(*) AS BIGINT) FROM m
        UNION ALL SELECT 'response_records', CAST(COUNT(*) AS BIGINT) FROM m
        UNION ALL SELECT 'status_200', CAST(SUM(ok200) AS BIGINT) FROM m
        UNION ALL SELECT 'status_404',
                  CAST(COUNT(*) - SUM(ok200) AS BIGINT) FROM m
        UNION ALL SELECT 'warcinfo_records', CAST(8 AS BIGINT)
    ) ORDER BY metric
"""

# q96: the decontamination survivor set is fully SQL-expressible — the
# oracle recomputes q54's distinct-gram stats and replays the SAME exact
# integer decision rule (10000*hits > 1000*grams for max_overlap=0.1),
# then re-derives the survivors; docs with fewer than 3 tokens carry no
# gram row and always survive, in both engines.
ORACLE_SQL["q96_decontaminate_verify"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, source,
               unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                     FOR i IN range(1, len(t) - 1)])) AS gram
        FROM toks WHERE len(t) >= 3
    ), bench AS (
        SELECT DISTINCT gram FROM grams WHERE source = 'src0'
    ), stats AS (
        SELECT c.doc_id,
               COUNT(*) AS n,
               SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS c
        FROM grams c LEFT JOIN bench b USING (gram)
        WHERE c.source <> 'src0'
        GROUP BY c.doc_id
    ), dirty AS (
        SELECT doc_id FROM stats WHERE c * 10000 > n * 1000
    )
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN dirty x ON d.doc_id = x.doc_id
    WHERE d.source <> 'src0' AND x.doc_id IS NULL
    ORDER BY d.doc_id
"""

# q95: the snapshot diff's counts are fixture arithmetic over the
# planted corpus (doc k < 80): the one commit removes {0,10,20}, rewrites
# text where doc_id % 9 = 1 among the survivors, and adds 2 fresh rows —
# so added=2, removed=|targets present|, changed=|survivors with k%9=1|,
# unchanged = corpus − removed − changed, all recomputed from documents.
ORACLE_SQL["q95_snapshot_diff_verify"] = """
    WITH n AS (SELECT COUNT(*) AS c FROM documents WHERE doc_id < 80),
         t AS (SELECT COUNT(*) AS c FROM documents
               WHERE doc_id IN (0, 10, 20)),
         ch AS (SELECT COUNT(*) AS c FROM documents
                WHERE doc_id < 80 AND doc_id % 9 = 1
                  AND doc_id NOT IN (0, 10, 20))
    SELECT dataset, status, value AS n_rows FROM (
        SELECT 'corpus' AS dataset, 'added' AS status,
               CAST(2 AS BIGINT) AS value
        UNION ALL
        SELECT 'corpus', 'changed', CAST(ch.c AS BIGINT) FROM ch
        UNION ALL
        SELECT 'corpus', 'removed', CAST(t.c AS BIGINT) FROM t
        UNION ALL
        SELECT 'corpus', 'unchanged', CAST(n.c - t.c - ch.c AS BIGINT)
        FROM n, t, ch
    ) ORDER BY dataset, status
"""

# q94: priority-aware survivors are fully SQL-expressible — the
# recursive CTE recomputes the q50/q91 components, every row carries the
# SAME planted priority (vec_id*7) % 11, and the survivor per cluster is
# the window winner (priority DESC, id ASC); singletons survive as their
# own cluster. A ranking or tie-break drift on the Spark side flips rows.
ORACLE_SQL["q94_priority_survivors_verify"] = """
    WITH RECURSIVE normed AS (
        -- zero-norm guard: see q43's oracle note (NaN cosine knife-edge)
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    pairs AS (
        SELECT a.vec_id AS id_1, b.vec_id AS id_2
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ),
    edges AS (
        SELECT id_1 AS s, id_2 AS d FROM pairs
        UNION ALL
        SELECT id_2, id_1 FROM pairs
    ),
    reach(id, r) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.r FROM edges e JOIN reach r ON e.s = r.id
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    scored AS (
        SELECT e.vec_id, e.label,
               CAST((e.vec_id * 7) % 11 AS BIGINT) AS pref,
               COALESCE(c.comp, e.vec_id) AS comp
        FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
    ),
    ranked AS (
        SELECT vec_id, label, pref,
               ROW_NUMBER() OVER (
                   PARTITION BY comp ORDER BY pref DESC, vec_id ASC
               ) AS rk
        FROM scored
    )
    SELECT vec_id, label, pref FROM ranked WHERE rk = 1
    ORDER BY vec_id
"""

# q49: JPEG is lossy, so the decoded pixels are codec-defined — but the
# gradient's ANALYTIC mean is engine-independent (recomputed here via
# generate_series over the full w x h grid) and the decoded mean must sit
# within 1.5 gray levels of it (expected-TRUE boolean; DC-quantization
# bounds the true error at ~1 level, measured <= 0.21).
ORACLE_SQL["q49_media_pixel_stats_jpeg"] = """
    WITH ana AS (
        SELECT d.doc_id, d.source,
               AVG((x.g * 3 + y.g * 5 + d.doc_id) % 256) AS ana_mean
        FROM documents d,
             generate_series(0, 62) AS x(g),
             generate_series(0, 62) AS y(g)
        WHERE x.g < 32 + d.doc_id % 32
          AND y.g < 32 + (d.doc_id * 7) % 32
        GROUP BY d.doc_id, d.source
    )
    SELECT source,
           COUNT(*)                  AS n_docs,
           ROUND(AVG(ana_mean), 4)   AS avg_brightness,
           TRUE                      AS decoded_within_tol
    FROM ana
    GROUP BY source
    ORDER BY source
"""

ORACLE_SQL["q48_streaming_funnel_rollup"] = """
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

# q51: WAV PCM is LOSSLESS, so the oracle recomputes every decoded sample
# independently — generate_series materializes the analytic waveform
# samp[i] = ((i*a + k) % 65536) - 32768 per doc (n = 256 + k%256 samples,
# a = k%31+3) and aggregates the exact integer statistics the Spark side
# obtained by decoding the actual RIFF bytes. A full value hash, not a
# tolerance boolean: any codec bit slip shifts an integer cell.
ORACLE_SQL["q51_audio_pcm_stats"] = """
    WITH per_doc AS (
        SELECT doc_id, source,
               256 + (doc_id % 256)  AS n,
               (doc_id % 31) + 3     AS a
        FROM documents
    ), stats AS (
        SELECT p.doc_id, p.source, p.n,
               SUM(((g.i * p.a + p.doc_id) % 65536) - 32768) AS s_amp,
               MIN(((g.i * p.a + p.doc_id) % 65536) - 32768) AS m_amp,
               MAX(((g.i * p.a + p.doc_id) % 65536) - 32768) AS x_amp
        FROM per_doc p CROSS JOIN UNNEST(generate_series(0, CAST(p.n - 1 AS BIGINT))) AS g(i)
        GROUP BY p.doc_id, p.source, p.n
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)     AS n_docs,
           CAST(SUM(n) AS BIGINT)       AS total_samples,
           CAST(SUM(s_amp) AS BIGINT)   AS sum_amp,
           CAST(MIN(m_amp) AS BIGINT)   AS min_amp,
           CAST(MAX(x_amp) AS BIGINT)   AS max_amp,
           CAST(SUM(n // 8) AS BIGINT)  AS sum_duration_ms
    FROM stats
    GROUP BY source
    ORDER BY source
"""

# q52: AVI container + PNG frames are BOTH lossless, so — like q51 — the
# oracle regenerates every frame pixel analytically (triple
# generate_series over frame x row x column) and the Spark side must
# reproduce the exact integer statistics by re-parsing the real container
# bytes and PNG-decoding each frame. Full value hash.
ORACLE_SQL["q52_video_frame_stats"] = """
    WITH per_doc AS (
        SELECT doc_id AS k, source,
               2 + (doc_id % 3)       AS n_frames,
               8 + (doc_id % 8)       AS w,
               8 + ((doc_id * 3) % 8) AS h
        FROM documents
    ), stats AS (
        SELECT p.k, p.source,
               SUM((x.i * 3 + y.i * 5 + p.k + 11 * f.i) % 256) AS s,
               MIN((x.i * 3 + y.i * 5 + p.k + 11 * f.i) % 256) AS mn,
               MAX((x.i * 3 + y.i * 5 + p.k + 11 * f.i) % 256) AS mx
        FROM per_doc p
        CROSS JOIN UNNEST(generate_series(0, CAST(p.n_frames - 1 AS BIGINT))) AS f(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.h - 1 AS BIGINT))) AS y(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.w - 1 AS BIGINT))) AS x(i)
        GROUP BY p.k, p.source
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(p.n_frames) AS BIGINT) AS total_frames,
           CAST(SUM(s.s) AS BIGINT)        AS sum_px,
           CAST(MIN(s.mn) AS BIGINT)       AS min_px,
           CAST(MAX(s.mx) AS BIGINT)       AS max_px
    FROM stats s JOIN per_doc p ON s.k = p.k
    GROUP BY s.source
    ORDER BY s.source
"""

# q53: smoothed tf-idf — the output carries only exact integers (tf, df,
# rank, term); the float score orders the per-doc window but never
# surfaces, so a last-ulp ln() difference between engines cannot flip a
# ROUND. The tiebreak ladder (tf DESC, df ASC, term) is an exact-integer
# surrogate that also pins near-equal scores: within a score class the
# score is monotone in tf and anti-monotone in df, so a last-ulp ln()
# disagreement between JVM Math.log and libm cannot flip the rank.
ORACLE_SQL["q53_tfidf_top_terms"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n FROM documents
    ), ranked AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY t.doc_id
                    ORDER BY t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0) DESC,
                             t.tf DESC, d.df ASC, t.term) AS INT) AS rank
        FROM tf t JOIN df d USING (term) CROSS JOIN n
    )
    SELECT doc_id, rank, term, tf, df
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
"""

# q54: train-test contamination — candidate docs' distinct 3-grams probed
# against the DISTINCT benchmark gram set (src0 slice), so each candidate
# gram matches at most once and the join cannot blow up. Rate is an exact
# small-integer ratio; ROUND is stable across engines.
ORACLE_SQL["q54_contamination_check"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, source,
               unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                     FOR i IN range(1, len(t) - 1)])) AS gram
        FROM toks WHERE len(t) >= 3
    ), bench AS (
        SELECT DISTINCT gram FROM grams WHERE source = 'src0'
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           ROUND(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS contamination_rate
    FROM grams c LEFT JOIN bench b USING (gram)
    WHERE c.source <> 'src0'
    GROUP BY c.doc_id
    ORDER BY c.doc_id
"""

# q55: all output cells are exact integers or ratios of two exact
# integers (same IEEE quotient in any engine -> ROUND stable). Docs with
# fewer than 2 tokens have no 2-gram row and drop via the inner join.
ORACLE_SQL["q55_repetition_stats"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term
    ), dominance AS (
        SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS max_c
        FROM tf GROUP BY doc_id
    ), grams AS (
        SELECT doc_id,
               len(t) - 1 AS n2,
               len(list_distinct([t[i] || ' ' || t[i+1]
                                  FOR i IN range(1, len(t))])) AS d2
        FROM toks WHERE len(t) >= 2
    )
    SELECT d.doc_id,
           CAST(d.n_tokens AS BIGINT)          AS n_tokens,
           CAST(d.max_c AS BIGINT)             AS max_token_count,
           ROUND(d.max_c * 1.0 / d.n_tokens, 6) AS top_token_frac,
           CAST(g.n2 AS BIGINT)                AS n_2grams,
           CAST(g.d2 AS BIGINT)                AS n_distinct_2grams,
           ROUND(1 - g.d2 * 1.0 / g.n2, 6)     AS dup_2gram_frac
    FROM dominance d JOIN grams g USING (doc_id)
    ORDER BY d.doc_id
"""

# q56: the SAME multiplicative-hash arithmetic as q37's split — exact
# integers end to end, so the selected id set is engine-identical.
# q56 (round 7): WEIGHTED mix — w(src_i) = 1 + (i mod 3); per-source keep
# threshold = min over t of floor(10000 * w_s * cnt_t / (cnt_s * w_t)),
# exact bigint arithmetic identical to operators/sampling.
# weighted_mix_sample; selection is the q37 multiplicative hash.
ORACLE_SQL["q56_domain_mix_rebalance"] = """
    WITH c AS (
        SELECT source, COUNT(*) AS cnt,
               1 + (CAST(substr(source, 4) AS BIGINT) % 3) AS w
        FROM documents GROUP BY source
    ), t AS (
        -- HUGEINT: exact 128-bit, mirrors the Spark side's DECIMAL(38,0)
        -- threshold math (bigint wrapped at temperature-weight magnitudes)
        SELECT s.source, MIN((CAST(10000 AS HUGEINT) * s.w * o.cnt) // (s.cnt * o.w)) AS thresh
        FROM c s CROSS JOIN c o
        GROUP BY s.source
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN t USING (source)
    WHERE (d.doc_id * 2654435761) % 10000 < t.thresh
"""

# q57: gap-filled rollup — the spine is generate_series over the (min,max)
# bucket bounds cross the distinct types; empty buckets coalesce to
# 0 / 0.0. Value cells are q32's own (already-audited) aggregates.
ORACLE_SQL["q57_gapfilled_rollup"] = """
    WITH b AS (
        SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
               event_type, value
        FROM events
    ), bounds AS (
        SELECT MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM b
    ), spine AS (
        SELECT g.i AS bucket_us, t.event_type
        FROM bounds
        CROSS JOIN UNNEST(generate_series(lo, hi, 21600000000)) AS g(i)
        CROSS JOIN (SELECT DISTINCT event_type FROM b) t
    ), agg AS (
        SELECT bucket_us, event_type,
               CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS s
        FROM b GROUP BY bucket_us, event_type
    )
    SELECT s.bucket_us, s.event_type,
           COALESCE(a.n, 0)   AS n_events,
           COALESCE(a.s, 0.0) AS sum_value
    FROM spine s LEFT JOIN agg a USING (bucket_us, event_type)
    ORDER BY s.bucket_us, s.event_type
"""

# q13_sketch_neardup_verify (round 7): the sketch operators' outputs are
# engine-defined, but their agreement with the EXACT Jaccard tiers is a
# value contract — n_exact recomputed by the oracle from first principles
# (q12's inverted-index CTE at threshold 0.35), recall/false-positive
# assertions exported as expected-TRUE booleans (the q49 pattern).
# Thresholds are measured with margin: minhash 25/25 of the J>=0.5 tier
# (bar: >=90%), simhash 22/25 of the J>=0.8 tier (bar: >=70%), both with
# zero pairs outside J>=0.35.
ORACLE_SQL["q13_sketch_neardup_verify"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS s
        FROM toks WHERE len(t) >= 3
    ), tok AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_1, id_2, i * 1.0 / (s1.n + s2.n - i) AS j
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.35
    )
    SELECT * FROM (
        SELECT 'minhash_lsh' AS method,
               CAST((SELECT COUNT(*) FROM pairs WHERE j >= 0.5) AS BIGINT) AS n_exact,
               TRUE AS recall_ok,
               TRUE AS no_false_positives
        UNION ALL
        SELECT 'simhash',
               CAST((SELECT COUNT(*) FROM pairs WHERE j >= 0.8) AS BIGINT),
               TRUE, TRUE
    ) ORDER BY method
"""

# q18_ann_verify (round 7): ANN internals are engine-defined; the value
# contract is agreement with the exact top-k. exact_top10_idsum is
# recomputed independently (q6's formulation); the recall / score /
# cardinality assertions are expected-TRUE booleans with measured margin
# (lsh 2 hits vs bar 1; ivf 10 vs bar 3; score deltas ~1e-16 vs bar 1e-9).
ORACLE_SQL["q18_ann_verify"] = """
    WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
    top10 AS (
        SELECT vec_id FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.e) DESC, vec_id
        LIMIT 10
    )
    SELECT method,
           CAST((SELECT SUM(vec_id) FROM top10) AS BIGINT) AS exact_top10_idsum,
           TRUE AS returned_ok,
           TRUE AS recall_ok,
           TRUE AS scores_exact
    FROM (VALUES ('ivf_persisted'), ('lsh_hyperplane')) AS m(method)
    ORDER BY method
"""

# q58: the JSON-lines and ORC round-trips must reproduce the parquet
# truth exactly — good JSON rows = events row count, exactly the 3
# planted malformed lines in quarantine, ORC per-type counts = parquet
# per-type counts.
ORACLE_SQL["q58_format_roundtrip"] = """
    SELECT * FROM (
        SELECT 'jsonl' AS fmt, 'good' AS key,
               CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'jsonl', 'quarantined', CAST(3 AS BIGINT)
        UNION ALL
        SELECT 'orc', event_type, CAST(COUNT(*) AS BIGINT)
        FROM events GROUP BY event_type
    ) ORDER BY fmt, key
"""

# q92: the XML roundtrip must reproduce the parquet truth exactly — good
# rows = events count, exactly the 3 planted malformed row elements in
# quarantine, exact user_id and scaled-long value sums over the good rows,
# and every markup-hostile planted name ('x<&>" ' || user_id) must survive
# the writer's entity escaping and the reader's decoding byte-for-byte
# (hostile_names_roundtrip = good_rows).
ORACLE_SQL["q92_xml_roundtrip"] = """
    SELECT metric, value FROM (
        SELECT 'event_id_sum' AS metric,
               CAST(SUM(event_id) AS BIGINT) AS value FROM events
        UNION ALL
        SELECT 'good_rows', CAST(COUNT(*) AS BIGINT) FROM events
        UNION ALL
        SELECT 'hostile_names_roundtrip', CAST(COUNT(*) AS BIGINT) FROM events
        UNION ALL
        SELECT 'quarantined', CAST(3 AS BIGINT)
        UNION ALL
        SELECT 'ts_us_max', CAST(MAX(epoch_us(ts)) AS BIGINT) FROM events
        UNION ALL
        SELECT 'ts_us_min', CAST(MIN(epoch_us(ts)) AS BIGINT) FROM events
        UNION ALL
        SELECT 'user_id_sum', CAST(SUM(user_id) AS BIGINT) FROM events
        UNION ALL
        SELECT 'value_scaled_sum',
               CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        FROM events
    ) ORDER BY metric
"""

# q93: the VARIANT parse/extract path is value-checked without any JSON
# on the oracle side — every planted field is doc_id arithmetic, so the
# oracle regenerates the expected extractions directly: device grouping
# (a sentinel for the malformed 1/97), battery present 2/3, nested screen 1/2,
# the type-flipping v (int 3/5, string 2/5), and the dead-letter count.
ORACLE_SQL["q93_variant_props"] = """
    WITH base AS (
        SELECT CASE WHEN event_id % 97 = 0 THEN '(malformed)'
                    ELSE 'd' || CAST(user_id % 3 AS VARCHAR) END AS device,
               (event_id % 97 = 0) AS bad,
               event_id
        FROM events
    )
    SELECT device,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN NOT bad AND event_id % 3 <> 0
                         THEN event_id % 100 END), 0) AS BIGINT) AS battery_sum,
           CAST(COUNT(CASE WHEN NOT bad AND event_id % 3 = 0
                           THEN 1 END) AS BIGINT) AS no_battery_rows,
           CAST(COALESCE(SUM(CASE WHEN NOT bad AND event_id % 2 = 0
                         THEN event_id % 640 END), 0) AS BIGINT) AS screen_w_sum,
           CAST(COALESCE(SUM(CASE WHEN NOT bad AND event_id % 5 < 3
                         THEN event_id % 50 END), 0) AS BIGINT) AS v_int_sum,
           CAST(COUNT(CASE WHEN NOT bad AND event_id % 5 >= 3
                           THEN 1 END) AS BIGINT) AS v_str_rows,
           CAST(COUNT(CASE WHEN bad THEN 1 END) AS BIGINT) AS quarantined
    FROM base
    GROUP BY device
    ORDER BY device
"""

# q59: the drained stream-static enrichment must equal the batch twin —
# events ⋈ customer, 6-hour event-time windows, per-segment counts/sums
# (epoch-aligned buckets exactly as q48; value cells audited for
# half-cent edges like every ROUND(SUM) oracle).
ORACLE_SQL["q59_stream_enriched_segments"] = """
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
           c_mktsegment,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

#: Off-driver tier (round 7): oracles for EXTRA_QUERIES entries whose
#: driver-window slot was consolidated away. Same SQL, same pytest
#: compare (tests/test_oracle_queries.py runs the union); only the
#: driver's own sweep skips them.
EXTRA_ORACLE_SQL: dict[str, str] = {
    k: ORACLE_SQL.pop(k)
    for k in (
        "q2_denorm_customer_orders",
        "q6_topk_cosine",
        "q19_top_tokens",
        "q23_rollup_order_counts",
        "q26_distinct_users",
        "q32_time_bucket_rollup",
        "q40_pack_token_shards",
    )
}
# the denormalized-fact twin serves q3's verbatim semantics from the
# write-once layout (operators/denorm.py) — layout cannot move a cent
EXTRA_ORACLE_SQL["q60_sales_by_category_denorm"] = ORACLE_SQL["q3_sales_by_category"]

# q63: the oracle replants the same deterministic contact block and
# applies the same masking chain (URL -> email -> IPv4) in RE2; the
# masked-text md5 checks the dialects agree span for span.
EXTRA_ORACLE_SQL["q63_pii_scrub"] = r"""
    WITH t AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com ip 10.'
                    || (doc_id % 256) || '.0.1 see https://ex.com/d/' || doc_id AS s
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)          AS n_ips,
           CAST(len(regexp_extract_all(s, 'https?://[A-Za-z0-9./_%-]+')) AS BIGINT)                       AS n_urls,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(s, 'https?://[A-Za-z0-9./_%-]+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS masked_md5
    FROM t
    ORDER BY doc_id
"""

# q62: the HLL sketch bytes are engine-defined, but the exported surface
# is not — exact n_events/n_users recomputed in SQL, plus the
# expected-TRUE booleans (estimate within 5% of exact; union-of-hourly
# estimate == direct-6h estimate, which HLL register-max unions make an
# identity).
EXTRA_ORACLE_SQL["q62_sketch_rollup_users"] = """
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
           event_type,
           COUNT(*)                                    AS n_events,
           COUNT(DISTINCT user_id)                     AS n_users,
           TRUE                                        AS estimate_within_5pct,
           TRUE                                        AS merge_is_exact
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

# q61: animated GIF89a is LOSSLESS (LZW) — like q51/q52 the oracle
# regenerates every frame pixel analytically (frame x row x column
# generate_series over the gradient (x*3 + y*5 + k + 13*f) % 256 with
# n_frames = 2+k%4, w = 7+k%9, h = 7+(k*5)%9, 25 cs per frame) and the
# Spark side must reproduce the exact integers by LZW-decoding the real
# GIF bytes. Full value hash.
EXTRA_ORACLE_SQL["q61_gif_frame_stats"] = """
    WITH per_doc AS (
        SELECT doc_id AS k, source,
               2 + (doc_id % 4)       AS n_frames,
               7 + (doc_id % 9)       AS w,
               7 + ((doc_id * 5) % 9) AS h
        FROM documents
    ), stats AS (
        SELECT p.k, p.source,
               SUM((x.i * 3 + y.i * 5 + p.k + 13 * f.i) % 256) AS s,
               MIN((x.i * 3 + y.i * 5 + p.k + 13 * f.i) % 256) AS mn,
               MAX((x.i * 3 + y.i * 5 + p.k + 13 * f.i) % 256) AS mx
        FROM per_doc p
        CROSS JOIN UNNEST(generate_series(0, CAST(p.n_frames - 1 AS BIGINT))) AS f(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.h - 1 AS BIGINT))) AS y(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.w - 1 AS BIGINT))) AS x(i)
        GROUP BY p.k, p.source
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT)             AS n_docs,
           CAST(SUM(p.n_frames) AS BIGINT)      AS total_frames,
           CAST(SUM(s.s) AS BIGINT)             AS sum_px,
           CAST(MIN(s.mn) AS BIGINT)            AS min_px,
           CAST(MAX(s.mx) AS BIGINT)            AS max_px,
           CAST(SUM(p.n_frames) * 25 AS BIGINT) AS total_delay_cs
    FROM stats s JOIN per_doc p ON s.k = p.k
    GROUP BY s.source
    ORDER BY s.source
"""

# q64: corpus-level exact span dedup — 10-word segments, globally-first
# occurrence survives (order: doc_id, seg_idx), documents reassembled from
# survivors. clean_md5 hash-checks FULL reassembly. COALESCE('') matches
# Spark's array_join over an empty survivor list for fully-duplicated docs.
EXTRA_ORACLE_SQL["q64_span_dedup"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), spans AS (
        SELECT doc_id, s.i AS seg_idx,
               array_to_string(t[s.i * 10 + 1 : s.i * 10 + 10], ' ') AS span_text
        FROM toks
        CROSS JOIN UNNEST(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS s(i)
    ), ranked AS (
        SELECT doc_id, seg_idx, span_text,
               ROW_NUMBER() OVER (
                   PARTITION BY span_text ORDER BY doc_id, seg_idx) AS rn
        FROM spans
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                               AS n_spans,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END,
                                   ' ' ORDER BY seg_idx), ''))     AS clean_md5
    FROM ranked
    GROUP BY doc_id
    ORDER BY doc_id
"""

# q64_span_dedup_agg: the scaling-tier rollup of q64 — identical CTE,
# one-row aggregate (see the query docstring: the per-doc collect was
# result-transfer noise at benchdata scale).
EXTRA_ORACLE_SQL["q64_span_dedup_agg"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), spans AS (
        SELECT doc_id, s.i AS seg_idx,
               array_to_string(t[s.i * 10 + 1 : s.i * 10 + 10], ' ') AS span_text
        FROM toks
        CROSS JOIN UNNEST(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS s(i)
    ), ranked AS (
        SELECT doc_id, seg_idx, span_text,
               ROW_NUMBER() OVER (
                   PARTITION BY span_text ORDER BY doc_id, seg_idx) AS rn
        FROM spans
    ), per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_spans,
               SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
               md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END,
                                       ' ' ORDER BY seg_idx), '')) AS clean_md5
        FROM ranked GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_spans) AS BIGINT) AS spans_total,
           CAST(SUM(n_kept) AS BIGINT) AS spans_kept,
           CAST(COUNT(DISTINCT clean_md5) AS BIGINT) AS distinct_clean
    FROM per_doc
"""

# q126: late-interaction MaxSim retrieval. Token vectors derive from the
# embeddings fixture by pure id arithmetic (doc = vec_id % 50); cosines
# are bit-identical across engines (q6/q44 left-fold discipline) and the
# MaxSim sum runs over exact micro-ints, so the top-5 is a full
# row-level value compare.
EXTRA_ORACLE_SQL["q126_maxsim_retrieval"] = """
    WITH q AS (
        SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id IN (1, 2, 3)
    ), t AS (
        SELECT vec_id % 50 AS doc_id, embedding::DOUBLE[] AS v
        FROM embeddings
    ), m AS (
        SELECT doc_id, qid,
               MAX(list_cosine_similarity(v, qv)) AS mx
        FROM t, q GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(CAST(floor(mx * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS score_micro
    FROM m GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT 5
"""

# q129: the PSI drift monitor — the oracle reruns the identical smoothed
# milli-nat arithmetic (the dsir/q117 discipline: two ln() calls on
# identical doubles, rounded once per bucket, integer totals).
EXTRA_ORACLE_SQL["q129_drift_report"] = """
    WITH base AS (
        SELECT lang FROM documents WHERE doc_id % 2 = 0
    ), nodrift AS (
        SELECT lang FROM documents WHERE doc_id % 2 = 1
    ), drift AS (
        SELECT lang FROM documents
        WHERE doc_id % 2 = 1 AND (lang = 'en' OR doc_id % 10 = 9)
    ), rep_d AS (
        SELECT COALESCE(a.lang, b.lang) AS bucket,
               COALESCE(a.c, 0) AS a_cnt, COALESCE(b.c, 0) AS b_cnt
        FROM (SELECT lang, COUNT(*) AS c FROM base GROUP BY 1) a
        FULL OUTER JOIN (SELECT lang, COUNT(*) AS c FROM drift GROUP BY 1) b
        USING (lang)
    ), tot_d AS (
        SELECT SUM(a_cnt) AS ta, SUM(b_cnt) AS tb, COUNT(*) AS nb FROM rep_d
    ), psi_d AS (
        SELECT bucket, a_cnt, b_cnt,
               CAST(round(((a_cnt + 1.0) / (ta + nb) - (b_cnt + 1.0) / (tb + nb))
                    * (ln((a_cnt + 1.0) / (ta + nb)) - ln((b_cnt + 1.0) / (tb + nb)))
                    * 1000) AS BIGINT) AS psi_milli
        FROM rep_d, tot_d
    ), rep_n AS (
        SELECT COALESCE(a.lang, b.lang) AS bucket,
               COALESCE(a.c, 0) AS a_cnt, COALESCE(b.c, 0) AS b_cnt
        FROM (SELECT lang, COUNT(*) AS c FROM base GROUP BY 1) a
        FULL OUTER JOIN (SELECT lang, COUNT(*) AS c FROM nodrift GROUP BY 1) b
        USING (lang)
    ), tot_n AS (
        SELECT SUM(a_cnt) AS ta, SUM(b_cnt) AS tb, COUNT(*) AS nb FROM rep_n
    ), psi_n AS (
        SELECT bucket, a_cnt, b_cnt,
               CAST(round(((a_cnt + 1.0) / (ta + nb) - (b_cnt + 1.0) / (tb + nb))
                    * (ln((a_cnt + 1.0) / (ta + nb)) - ln((b_cnt + 1.0) / (tb + nb)))
                    * 1000) AS BIGINT) AS psi_milli
        FROM rep_n, tot_n
    )
    SELECT bucket, CAST(a_cnt AS BIGINT) AS a_cnt,
           CAST(b_cnt AS BIGINT) AS b_cnt,
           CAST(psi_milli AS BIGINT) AS psi_milli FROM (
        SELECT * FROM psi_d
        UNION ALL
        SELECT '__total_drift', SUM(a_cnt), SUM(b_cnt), SUM(psi_milli)
        FROM psi_d
        UNION ALL
        SELECT '__total_nodrift', SUM(a_cnt), SUM(b_cnt), SUM(psi_milli)
        FROM psi_n
    ) ORDER BY bucket
"""

# q128: the deterministic KMV quantile sketch — the oracle reruns the
# IDENTICAL bottom-64 Knuth-hash sample per language and the identical
# nearest-rank-lower pick, exact integers end to end.
EXTRA_ORACLE_SQL["q128_quantile_sketch_verify"] = """
    WITH d AS (
        SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT lang, doc_id, n_tokens,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id % 1000000007) * 2654435761 % 1000000007,
                            doc_id) AS rk
        FROM d
    ), samp AS (
        SELECT lang, doc_id, n_tokens FROM ranked WHERE rk <= 64
    ), o AS (
        SELECT lang, n_tokens,
               row_number() OVER (
                   PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM samp
    )
    SELECT lang, CAST(q AS INTEGER) AS q_permille, n_tokens AS est
    FROM o CROSS JOIN (VALUES (500), (900), (990)) AS qs(q)
    WHERE rn = ((n - 1) * q) // 1000 + 1
    ORDER BY lang, q_permille
"""

# q127: gazetteer phrase tagging. The dictionary rebuilds from the corpus
# by the same rule (first 3 tokens of docs 0-4 + first token of doc 0);
# overlapping-occurrence counts are exact integers.
EXTRA_ORACLE_SQL["q127_gazetteer_tag"] = """
    WITH dict AS (
        SELECT DISTINCT term, len(string_split(term, ' ')) AS n FROM (
            SELECT array_to_string(list_slice(string_split(text, ' '), 1, 3),
                                   ' ') AS term
            FROM documents WHERE doc_id < 5
            UNION ALL
            SELECT string_split(text, ' ')[1] FROM documents WHERE doc_id = 0
        )
    ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, dn.n AS n,
               array_to_string(list_slice(t, s.i, s.i + dn.n - 1), ' ') AS g
        FROM toks
        CROSS JOIN (SELECT DISTINCT n FROM dict) dn(n)
        CROSS JOIN UNNEST(range(1, len(t) - dn.n + 2)) AS s(i)
        WHERE len(t) >= dn.n
    ), hits AS (
        SELECT doc_id, term, COUNT(*) AS nh
        FROM grams JOIN dict ON g = term AND grams.n = dict.n
        GROUP BY 1, 2
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nh) AS BIGINT) AS n_hits
    FROM hits GROUP BY term ORDER BY term
"""

# q65: PQ-ADC internals are engine-defined (seeded subspace k-means); the
# value contract is agreement with the exact top-k — exact_top10_idsum
# recomputed independently (q6's formulation) + expected-TRUE booleans
# with measured margin (raw-ADC recall 7/10 at sf0.01, 6/10 at sf0.1 vs
# bar 3; corpus-scaled rerank shortlist max(100, n/8) vs worst
# true-top-10 ADC rank 15 / 102, so the two-stage result IS the exact
# top-10 id set at both sweep scales).
EXTRA_ORACLE_SQL["q65_pq_verify"] = """
    WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
    top10 AS (
        SELECT vec_id FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.e) DESC, vec_id
        LIMIT 10
    )
    SELECT 'pq_adc' AS method,
           CAST((SELECT SUM(vec_id) FROM top10) AS BIGINT) AS exact_top10_idsum,
           TRUE AS returned_ok,
           TRUE AS recall_ok,
           TRUE AS rerank_matches_exact
"""

# q66: data-quality expectations — exact integer violation counts over
# orders (+ one FK check vs customer), recomputed independently. The
# in_range bound fires for real (6033 rows over 300000 at sf0.01).
EXTRA_ORACLE_SQL["q66_data_quality_report"] = """
    SELECT "check", col, n_violations, n_violations = 0 AS passed FROM (
        SELECT 'not_null' AS "check", 'o_custkey' AS col,
               (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                FROM orders) AS n_violations
        UNION ALL
        SELECT 'unique', 'o_orderkey',
               -- COUNT(col), not COUNT(*): both sides skip NULLs, so the
               -- check counts duplicated NON-NULL values only (NULL policy
               -- belongs to not_null) — matches operators/expectations.py
               (SELECT CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'in_range', 'o_totalprice',
               (SELECT CAST(SUM(CASE WHEN o_totalprice IS NULL
                                       OR o_totalprice < 0
                                       OR o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'accepted_values', 'o_orderstatus',
               (SELECT CAST(SUM(CASE WHEN o_orderstatus IS NULL
                                       OR o_orderstatus NOT IN ('O','F','P')
                                     THEN 1 ELSE 0 END) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'matches_regex', 'o_orderpriority',
               (SELECT CAST(SUM(CASE WHEN o_orderpriority IS NULL
                                       OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                                     THEN 1 ELSE 0 END) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'foreign_key', 'o_custkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_custkey IS NULL)
    )
    ORDER BY "check", col
"""

# q67: mergeable histogram percentile layout — exact integer bin counts
# and targets (ceil(q*total) in integer arithmetic), one double floor
# both engines agree on, edge = bin * 5.0 exact. The oracle builds the
# same day cells, merges, and reads the same first-crossing bin.
EXTRA_ORACLE_SQL["q67_histogram_rollup"] = """
    WITH day_cells AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(floor(value / 5.0) AS BIGINT) AS bin_id,
               COUNT(*) AS n
        FROM events GROUP BY day, event_type, bin_id
    ), type_cells AS (
        SELECT event_type, bin_id, CAST(SUM(n) AS BIGINT) AS n
        FROM day_cells GROUP BY event_type, bin_id
    ), cum AS (
        SELECT event_type, bin_id, n,
               SUM(n) OVER (PARTITION BY event_type ORDER BY bin_id) AS cum_n,
               SUM(n) OVER (PARTITION BY event_type) AS n_total
        FROM type_cells
    ), qs AS (
        SELECT * FROM (VALUES (1, 2), (9, 10)) AS q(q_num, q_den)
    )
    SELECT event_type,
           CAST(q_num AS INT)                AS q_num,
           CAST(q_den AS INT)                AS q_den,
           CAST(n_total AS BIGINT)           AS n_total,
           CAST(MIN(bin_id) AS BIGINT)       AS qbin,
           CAST(MIN(bin_id) * 5.0 AS DOUBLE)  AS q_edge
    FROM cum CROSS JOIN qs
    WHERE cum_n >= (q_num * n_total + q_den - 1) // q_den
    GROUP BY event_type, q_num, q_den, n_total
    ORDER BY event_type, q_num, q_den
"""

# q68: merge audit — the oracle independently rebuilds the q9 merged
# table and diffs it against orders with a FULL OUTER JOIN; change
# detection is IS DISTINCT FROM per column (NULL-safe, the SQL twin of
# Spark's eqNullSafe). Exact integer counts in both sections.
EXTRA_ORACLE_SQL["q68_merge_audit_diff"] = """
    WITH staging AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 100000.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-03-01'
    ), final AS (
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-06-01'
    ), merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        FROM (
            SELECT * FROM final
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staging)
            UNION ALL
            SELECT * FROM staging
        )
    ), l AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        FROM orders
    ), j AS (
        SELECT l.o_orderkey AS lk, m.o_orderkey AS rk,
               CASE WHEN l.o_orderkey IS NULL THEN 'added'
                    WHEN m.o_orderkey IS NULL THEN 'removed'
                    WHEN (l.o_custkey      IS DISTINCT FROM m.o_custkey)
                      OR (l.o_orderstatus  IS DISTINCT FROM m.o_orderstatus)
                      OR (l.o_totalprice   IS DISTINCT FROM m.o_totalprice)
                      OR (l.o_orderdate    IS DISTINCT FROM m.o_orderdate)
                      OR (l.o_orderpriority IS DISTINCT FROM m.o_orderpriority)
                    THEN 'changed' ELSE 'unchanged' END AS status,
               CASE WHEN l.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                    AND l.o_custkey IS DISTINCT FROM m.o_custkey THEN 1 ELSE 0 END AS d_cust,
               CASE WHEN l.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                    AND l.o_orderstatus IS DISTINCT FROM m.o_orderstatus THEN 1 ELSE 0 END AS d_status,
               CASE WHEN l.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                    AND l.o_totalprice IS DISTINCT FROM m.o_totalprice THEN 1 ELSE 0 END AS d_price,
               CASE WHEN l.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                    AND l.o_orderdate IS DISTINCT FROM m.o_orderdate THEN 1 ELSE 0 END AS d_date,
               CASE WHEN l.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                    AND l.o_orderpriority IS DISTINCT FROM m.o_orderpriority THEN 1 ELSE 0 END AS d_prio
        FROM l FULL OUTER JOIN merged m ON l.o_orderkey = m.o_orderkey
    )
    SELECT section, item, n FROM (
        SELECT 'rows' AS section, s.status AS item,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM (VALUES ('added'), ('removed'), ('changed'), ('unchanged')) AS s(status)
        LEFT JOIN (SELECT status, COUNT(*) AS n FROM j GROUP BY status) c
          ON s.status = c.status
        UNION ALL
        SELECT 'columns', 'o_custkey',      CAST(SUM(d_cust) AS BIGINT)   FROM j
        UNION ALL
        SELECT 'columns', 'o_orderstatus',  CAST(SUM(d_status) AS BIGINT) FROM j
        UNION ALL
        SELECT 'columns', 'o_totalprice',   CAST(SUM(d_price) AS BIGINT)  FROM j
        UNION ALL
        SELECT 'columns', 'o_orderdate',    CAST(SUM(d_date) AS BIGINT)   FROM j
        UNION ALL
        SELECT 'columns', 'o_orderpriority', CAST(SUM(d_prio) AS BIGINT)  FROM j
    )
    ORDER BY section, item
"""

# q69: SCD Type 2 over a deterministic two-snapshot sequence — the oracle
# reconstructs the full history table in SQL: unchanged orders keep one
# open T0 version; every order dated >= 2001-03-01 carries a closed
# [T0, T1) version at the old price and an open T1 version at +100000.
# Validity bounds are fixed epoch-micros instants (TZ-independent).
EXTRA_ORACLE_SQL["q69_scd2_order_history"] = """
    WITH changed AS (
        SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-03-01'
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           valid_from_us, valid_to_us, is_current
    FROM (
        -- unchanged keys: one open version from T0
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
               946684800000000 AS valid_from_us,
               CAST(NULL AS BIGINT) AS valid_to_us,
               TRUE AS is_current
        FROM orders o
        WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM changed)
        UNION ALL
        -- changed keys: closed old version [T0, T1)
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
               946684800000000, 993945600000000, FALSE
        FROM orders o
        WHERE o.o_orderkey IN (SELECT o_orderkey FROM changed)
        UNION ALL
        -- changed keys: new open version from T1
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice + 100000.0,
               993945600000000, CAST(NULL AS BIGINT), TRUE
        FROM orders o
        WHERE o.o_orderkey IN (SELECT o_orderkey FROM changed)
    )
    ORDER BY o_orderkey, valid_from_us
"""

# q70: analytic-window breadth — lag/lead/ntile/percent_rank/cume_dist,
# everything tie-broken on a key so rank outputs are engine-exact; the
# ROUND(.,6) on the two distribution functions guards double formatting,
# not order (their values are exact small-denominator rationals).
EXTRA_ORACLE_SQL["q70_window_suite"] = """
    WITH per_order AS (
        SELECT o_custkey, o_orderkey,
               LAG(o_totalprice)  OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev_price,
               LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS next_price
        FROM orders
    ), agg_lag AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               ROUND(SUM(COALESCE(prev_price, 0.0)), 2) AS sum_prev,
               ROUND(SUM(COALESCE(next_price, 0.0)), 2) AS sum_next
        FROM per_order GROUP BY o_custkey
    ), spend AS (
        SELECT c_custkey, c_mktsegment,
               ROUND(SUM(o_totalprice), 2) AS spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    ), ranked AS (
        SELECT c_custkey, c_mktsegment, spend,
               CAST(NTILE(4) OVER w AS INT)          AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6)       AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6)          AS cume
        FROM spend
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend, c_custkey)
    )
    SELECT r.c_custkey, r.c_mktsegment, r.spend, r.quartile, r.pct_rank,
           r.cume, a.n_orders, a.sum_prev, a.sum_next
    FROM ranked r JOIN agg_lag a ON r.c_custkey = a.o_custkey
    ORDER BY r.c_custkey
"""

# q71: pivot->unpivot round-trip — the long form is the complete
# priority x status grid with exact counts, absent combos as zeros;
# the oracle rebuilds it relationally (cross grid LEFT JOIN counts).
EXTRA_ORACLE_SQL["q71_pivot_unpivot_roundtrip"] = """
    WITH grid AS (
        SELECT p.o_orderpriority, s.o_orderstatus
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p
        CROSS JOIN (VALUES ('O'), ('F'), ('P')) AS s(o_orderstatus)
    ), counts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT g.o_orderpriority, g.o_orderstatus,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
    FROM grid g LEFT JOIN counts c
      ON g.o_orderpriority = c.o_orderpriority
     AND g.o_orderstatus = c.o_orderstatus
    ORDER BY g.o_orderpriority, g.o_orderstatus
"""

# q72: temporal dimension join — the oracle rebuilds the two-version
# segment history relationally and applies the same validity-window
# predicates; instants are the same naive timestamps the fixture's
# event instants compare against.
EXTRA_ORACLE_SQL["q72_temporal_dim_join"] = """
    WITH versions AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 3 = 0
                    THEN TIMESTAMP '2024-01-15 00:00:00' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'MOVED',
               TIMESTAMP '2024-01-15 00:00:00', CAST(NULL AS TIMESTAMP)
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT v.c_mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e
    LEFT JOIN versions v
      ON e.user_id = v.c_custkey
     AND v.valid_from <= e.ts
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    GROUP BY v.c_mktsegment, e.event_type
    ORDER BY v.c_mktsegment, e.event_type
"""

# q73: unicode normalization — the oracle plants the identical dirty
# suffix (chr() codepoints so the decomposed form is explicit) and
# applies the identical chain with utf8proc NFC; md5 cross-checks two
# independent Unicode implementations.
EXTRA_ORACLE_SQL["q73_unicode_normalize"] = """
    WITH dirty AS (
        SELECT doc_id,
               text || ' caf' || 'e' || chr(769) || chr(7) ||
               chr(9) || 'x' || chr(10) || 'y' || '  z  ' AS dirty
        FROM documents
    ), cleaned AS (
        SELECT doc_id, dirty,
               trim(regexp_replace(
                   regexp_replace(
                       replace(replace(replace(nfc_normalize(dirty),
                           chr(9), ' '), chr(10), ' '), chr(13), ' '),
                       '[\\x00-\\x08\\x0B-\\x1F\\x7F-\\x9F]', '', 'g'),
                   ' {2,}', ' ', 'g')) AS clean_text
        FROM dirty
    )
    SELECT doc_id,
           CAST(length(dirty) AS INT)      AS n_raw,
           CAST(length(clean_text) AS INT) AS n_clean,
           md5(clean_text)                 AS clean_md5
    FROM cleaned
    ORDER BY doc_id
"""

# q74: arbitrary GROUPING SETS — DuckDB evaluates the identical grains;
# GROUPING() composes the same bitmask Spark's grouping_id() emits
# (priority bit 1, status bit 0).
EXTRA_ORACLE_SQL["q74_grouping_sets"] = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT)
               AS grain_id,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS (
        (o_orderpriority, o_orderstatus),
        (o_orderpriority),
        (o_orderstatus)
    )
    ORDER BY grain_id, o_orderpriority, o_orderstatus
"""

# q75: bigram-LM quality scoring — the oracle trains the identical
# add-one-smoothed LM on src0 and scores the identical slice; counts are
# exact, the mean log-prob rounds at 2dp (double noise ~1e-12).
EXTRA_ORACLE_SQL["q75_lm_quality_score"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, source,
               unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bigram
        FROM toks WHERE len(t) >= 2
    ), b AS (
        SELECT bigram, COUNT(*) AS c2 FROM grams WHERE source = 'src0' GROUP BY bigram
    ), u AS (
        SELECT w, COUNT(*) AS c1 FROM (
            SELECT unnest(t) AS w FROM toks WHERE source = 'src0'
        ) WHERE w <> '' GROUP BY w
    ), v AS (SELECT COUNT(*) AS vs FROM u
    ), scored AS (
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               SUM(CASE WHEN b.c2 IS NULL THEN 1 ELSE 0 END) AS n_unseen,
               AVG(ln((COALESCE(b.c2, 0) + 1.0) /
                      (COALESCE(u.c1, 0) + (SELECT vs FROM v)))) AS avg_logprob
        FROM grams g
        LEFT JOIN b USING (bigram)
        LEFT JOIN u ON string_split(g.bigram, ' ')[1] = u.w
        WHERE g.source <> 'src0'
        GROUP BY g.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT)            AS n_docs,
           CAST(SUM(s.n_bigrams) AS BIGINT)    AS total_bigrams,
           CAST(SUM(s.n_unseen) AS BIGINT)     AS total_unseen,
           ROUND(AVG(s.avg_logprob), 2)        AS mean_logprob
    FROM scored s JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
"""

# q76_incremental_dedup_verify (round 8): incremental dedup-against-index
# is engine-defined in its signature internals, but (a) the batch split,
# (b) the exact-Jaccard dup tier among new docs (q12/q13's inverted-index
# CTE), and (c) the equivalence/recall/false-drop assertions are a value
# contract — integers recomputed from first principles plus expected-TRUE
# booleans (q13's pattern). Measured margins at sf0.01: equals-oneshot
# exact, recall 100% of the exact J>=0.5 tier (bar 90%), zero false drops.
EXTRA_ORACLE_SQL["q76_incremental_dedup_verify"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS s
        FROM toks WHERE len(t) >= 3
    ), tok AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_1, id_2, i * 1.0 / (s1.n + s2.n - i) AS j
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.35
    ), mid AS (SELECT MAX(doc_id) // 2 AS m FROM documents)
    SELECT 'minhash_index' AS method,
           CAST((SELECT COUNT(*) FROM documents, mid WHERE doc_id > m) AS BIGINT)
               AS n_new,
           CAST((SELECT COUNT(DISTINCT id_2) FROM pairs, mid
                 WHERE j >= 0.5 AND id_2 > m) AS BIGINT) AS n_exact_dups_new,
           TRUE AS incremental_equals_oneshot,
           TRUE AS recall_ok,
           TRUE AS no_false_drops
"""

# q77_image_phash_dedup (round 8): the planted corpus renders a 24x24-cell
# integer pattern at cell-aligned sizes, so the dHash of ANY render equals
# the closed-form dHash of the cell grid: thumbnail pixel (x, y) is
# pat(8x//3, 3y, k) by the nested-floor identity floor(floor(xW/9)/(W/24))
# = floor(8x/3) for W a multiple of 24. The oracle recomputes every hash
# from that closed form in pure SQL (no codec anywhere) and derives the
# SAME hamming pair set the Spark side reaches through real PNG/GIF
# encode -> decode -> resize -> dHash -> blocked self-join. Measured:
# exactly the 15 planted pairs at hamming 0; nearest unrelated pair 16.
EXTRA_ORACLE_SQL["q77_image_phash_dedup"] = """
    WITH ks AS (
        SELECT doc_id AS k, doc_id AS id FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id AS k, doc_id + 100000 AS id FROM documents
        WHERE doc_id < 150 AND doc_id % 10 = 0
    ), grid AS (
        SELECT t1.range AS x, t2.range AS y FROM range(8) t1, range(8) t2
    ), bits AS (
        SELECT id, x, y,
               CASE WHEN (
                   ((8*(x+1)//3) * (8*(x+1)//3) * (k % 7 + 1)
                    + (3*y) * (3*y) * (k % 11 + 3)
                    + (8*(x+1)//3) * (3*y) * (k % 5 + 1)
                    + (8*(x+1)//3) * (k % 13) * 17
                    + (3*y) * (k % 17) * 23 + k) % 256
               ) > (
                   ((8*x//3) * (8*x//3) * (k % 7 + 1)
                    + (3*y) * (3*y) * (k % 11 + 3)
                    + (8*x//3) * (3*y) * (k % 5 + 1)
                    + (8*x//3) * (k % 13) * 17
                    + (3*y) * (k % 17) * 23 + k) % 256
               ) THEN CAST(1 AS UBIGINT) ELSE CAST(0 AS UBIGINT) END AS bit
        FROM ks, grid
    ), hashes AS (
        SELECT id, SUM(bit * (CAST(1 AS UBIGINT) << CAST(y*8 + x AS INTEGER))) AS h
        FROM bits GROUP BY id
    )
    SELECT a.id AS id_1, b.id AS id_2,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.id < b.id
    WHERE bit_count(xor(a.h, b.h)) <= 8
    ORDER BY id_1, id_2
"""

# q78: MP4/BMFF container + Motion-JPEG frames. Container columns
# (n_frames, fps) are exact; frame pixels are lossy JPEG, so — exactly
# the q49 pattern — the oracle recomputes the ANALYTIC per-doc mean
# brightness via generate_series (frames x rows x cols; every frame
# shares w,h so the flat average equals the avg of per-frame means) and
# the Spark side must agree on the exact container counts, the rounded
# analytic mean, and an expected-TRUE tolerance boolean for the decode.
EXTRA_ORACLE_SQL["q78_mp4_frame_stats"] = """
    WITH per_doc AS (
        SELECT doc_id AS k, source,
               2 + (doc_id % 3)        AS n_frames,
               32 + (doc_id % 32)      AS w,
               32 + ((doc_id * 7) % 32) AS h
        FROM documents
    ), ana AS (
        SELECT p.k, p.source, p.n_frames,
               AVG((x.i * 3 + y.i * 5 + p.k + 11 * f.i) % 256) AS ana_mean
        FROM per_doc p
        CROSS JOIN UNNEST(generate_series(0, CAST(p.n_frames - 1 AS BIGINT))) AS f(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.h - 1 AS BIGINT))) AS y(i)
        CROSS JOIN UNNEST(generate_series(0, CAST(p.w - 1 AS BIGINT))) AS x(i)
        GROUP BY p.k, p.source, p.n_frames
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           CAST(SUM(n_frames) AS BIGINT)  AS total_frames,
           CAST(4 AS INT)                 AS min_fps,
           ROUND(AVG(ana_mean), 4)        AS avg_brightness,
           TRUE                           AS decoded_within_tol
    FROM ana
    GROUP BY source
    ORDER BY source
"""

# q79: audio energy-envelope fingerprint under a closed-form oracle (the
# q77 pattern for WAV): every fingerprint is recomputed in pure SQL from
# the analytic waveform — AVG(ABS()) envelope per 1/65th segment, LEAD
# comparisons, exact bit pack (1<<63 wraps to the signed long exactly as
# the engine's signed-64 representation does; SUM promotes to HUGEINT so
# the wrap survives, then casts back) — and the pair set comes from
# bit_count(xor()) over the 165-row fingerprint table. Duplicates
# (sample-repetition re-encodes) share their base doc's fingerprint BY
# CONSTRUCTION (n = 65*m keeps segment means exactly invariant under
# repetition), so the oracle assigns fp by base key.
EXTRA_ORACLE_SQL["q79_audio_fingerprint_dedup"] = """
    WITH ks AS (
        SELECT DISTINCT doc_id AS k FROM documents WHERE doc_id < 150
    ), params AS (
        SELECT k, 8 + (k % 8) AS m, (k % 31) + 3 AS a FROM ks
    ), env AS (
        SELECT p.k, (g.i // p.m) AS seg,
               AVG(ABS((((g.i * p.a + p.k) % 7168) - 3584)
                       * (((g.i // p.m) * (g.i // p.m) * (p.k % 7 + 1)
                           + (g.i // p.m) * (p.k % 13) + p.k) % 9 + 1))) AS e
        FROM params p
        CROSS JOIN UNNEST(generate_series(0, CAST(65 * p.m - 1 AS BIGINT))) AS g(i)
        GROUP BY p.k, (g.i // p.m)
    ), fp_by_k AS (
        SELECT k,
               CAST(SUM(CASE WHEN nxt <= e THEN CAST(0 AS BIGINT)
                             WHEN seg = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                             ELSE (CAST(1 AS BIGINT) << CAST(seg AS INT)) END) AS BIGINT) AS afp
        FROM (
            SELECT k, seg, e, LEAD(e) OVER (PARTITION BY k ORDER BY seg) AS nxt
            FROM env
        )
        WHERE seg < 64
        GROUP BY k
    ), ids AS (
        SELECT k AS id, k FROM ks
        UNION ALL
        SELECT k + 100000, k FROM ks WHERE k % 10 = 0
    ), fps AS (
        SELECT i.id, f.afp FROM ids i JOIN fp_by_k f USING (k)
    )
    SELECT a.id AS id_1, b.id AS id_2,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM fps a JOIN fps b ON a.id < b.id
    WHERE bit_count(xor(a.afp, b.afp)) <= 6
    ORDER BY id_1, id_2
"""

# q80: the exact side of the semantic-dedup verify — corpus count and the
# >= 0.4 cosine pair count recomputed with DuckDB's own
# list_cosine_similarity (q43's zero-norm guard); the cluster-dependent
# quantities surface as VALUE-checked invariants (subset-violation count
# must be exactly 0, survivors + dropped must repartition the corpus
# exactly) plus the calibrated capture-floor expected-TRUE boolean
# (measured 0.565/0.642/0.572 at sf0.001/0.01/0.1 vs the 0.45 floor —
# see plans/queries.q80_semantic_dedup_verify).
EXTRA_ORACLE_SQL["q80_semantic_dedup_verify"] = """
    WITH normed AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ), pairs AS (
        SELECT a.vec_id AS id_1, b.vec_id AS id_2
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    )
    SELECT * FROM (
        SELECT 'capture_floor' AS metric, CAST(0 AS BIGINT) AS n, TRUE AS ok
        UNION ALL
        SELECT 'cluster_pairs_subset', CAST(0 AS BIGINT), TRUE
        UNION ALL
        SELECT 'corpus', (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings), TRUE
        UNION ALL
        SELECT 'exact_pairs', (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs), TRUE
        UNION ALL
        SELECT 'partition', (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings), TRUE
    ) ORDER BY metric
"""

# q82: the exact side of the minhash-strategy verify — q81's funnel CTEs
# aggregated to corpus / unique / final counts. The minhash-strategy
# survivor count is engine-defined in general, but at the funnel's 0.35
# threshold with 128 hashes / 32 bands the fixture's near-dup pairs sit
# deep in the LSH S-curve (est-Jaccard recall ~= 1, false collisions
# ~= 0) and the strategies agree EXACTLY — measured symdiff 0 at
# sf0.001/0.01/0.1, local[8] == local[32] (est_jaccard is integer-exact
# /128); the oracle therefore quotes the exact value and a literal-0
# divergence count, so any signature/banding/threshold break flips the
# driver's hash (see plans/queries.q82_minhash_curation_verify).
EXTRA_ORACLE_SQL["q82_minhash_curation_verify"] = """
    WITH scored AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' '))                       AS n_toks,
               len(list_distinct(string_split(text, ' ')))        AS n_distinct,
               len(replace(text, ' ', ''))                        AS tok_chars
        FROM documents
    ), quality AS (
        SELECT doc_id, source, text, n_toks FROM scored
        WHERE 0.4 * LEAST(CAST(n_toks AS DOUBLE) / 100.0, 1.0)
            + 0.3 * (CAST(n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE))
            + 0.3 * LEAST((CAST(tok_chars AS DOUBLE) / CAST(n_toks AS DOUBLE)) / 8.0, 1.0)
            >= 0.49999
    ), uniq AS (
        SELECT doc_id, source, text, n_toks FROM quality
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
    ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM uniq
    ), sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS s
        FROM toks WHERE len(t) >= 3
    ), tok AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), dropped AS (
        SELECT DISTINCT id_2 FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.35
    ), final AS (
        SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_2 FROM dropped)
    )
    SELECT * FROM (
        SELECT 'corpus' AS metric,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n,
               TRUE AS strategies_agree
        UNION ALL
        SELECT 'exact_final', (SELECT CAST(COUNT(*) AS BIGINT) FROM final), TRUE
        UNION ALL
        SELECT 'minhash_final', (SELECT CAST(COUNT(*) AS BIGINT) FROM final), TRUE
        UNION ALL
        SELECT 'strategy_symdiff', CAST(0 AS BIGINT), TRUE
        UNION ALL
        SELECT 'unique_docs', (SELECT CAST(COUNT(*) AS BIGINT) FROM uniq), TRUE
    ) ORDER BY metric
"""

# q81: the whole curation funnel in SQL — quality filter (q15's score
# formula, threshold 0.49999: offset from the fixture's exact-0.5 score
# mass, nearest score >= 1e-5 away at every sf), exact dedup (MIN doc_id
# per text via QUALIFY), 3-gram Jaccard near-dup pairs (q12's shingle SQL
# restricted to the surviving set) with the dominance drop rule, then the
# per-source stage counts + final whitespace-token sum.
EXTRA_ORACLE_SQL["q81_curation_funnel"] = """
    WITH scored AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' '))                       AS n_toks,
               len(list_distinct(string_split(text, ' ')))        AS n_distinct,
               len(replace(text, ' ', ''))                        AS tok_chars
        FROM documents
    ), quality AS (
        SELECT doc_id, source, text, n_toks FROM scored
        WHERE 0.4 * LEAST(CAST(n_toks AS DOUBLE) / 100.0, 1.0)
            + 0.3 * (CAST(n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE))
            + 0.3 * LEAST((CAST(tok_chars AS DOUBLE) / CAST(n_toks AS DOUBLE)) / 8.0, 1.0)
            >= 0.49999
    ), uniq AS (
        SELECT doc_id, source, text, n_toks FROM quality
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
    ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM uniq
    ), sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS s
        FROM toks WHERE len(t) >= 3
    ), tok AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), dropped AS (
        SELECT DISTINCT id_2 FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.35
    ), final AS (
        SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_2 FROM dropped)
    )
    SELECT r.source,
           r.n_raw,
           COALESCE(q.n, 0) AS n_quality,
           COALESCE(u.n, 0) AS n_unique,
           COALESCE(f.n, 0) AS n_final,
           COALESCE(f.tok, 0) AS tokens_final
    FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
          FROM documents GROUP BY source) r
    LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM quality GROUP BY source) q USING (source)
    LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM uniq GROUP BY source) u USING (source)
    LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(n_toks) AS BIGINT) AS tok
               FROM final GROUP BY source) f USING (source)
    ORDER BY r.source
"""

# q83_forget_verify (round 12): the takedown story over a PLANTED corpus
# whose every count is pure id arithmetic — doc k (k < 60) carries a
# synthetic stride-13 token text (distinct docs share zero shingles), the
# k % 10 == 0 docs are indexed twice (the dropped cross-batch copy is the
# content shadow), and the embedding side mirrors it with byte-identical
# IVF twins. Forgetting {0, 10, 20} therefore removes exactly 2 rows per
# target from each index (target + shadow/twin), leaves zero matching
# rows, re-admits the forgotten content under fresh ids, still dedups a
# copy of a surviving doc, and a full janitor maintenance cycle preserves
# the post-takedown IVF corpus count. The oracle recomputes every number
# from the planted arithmetic over the fixture's dense ids.
EXTRA_ORACLE_SQL["q83_forget_verify"] = """
    WITH n AS (SELECT COUNT(*) AS c FROM documents WHERE doc_id < 60),
         t AS (SELECT COUNT(*) AS c FROM documents
               WHERE doc_id IN (0, 10, 20)),
         e AS (SELECT COUNT(*) AS c FROM embeddings WHERE vec_id < 60),
         e10 AS (SELECT COUNT(*) AS c FROM embeddings
                 WHERE vec_id < 60 AND vec_id % 10 = 0),
         et AS (SELECT COUNT(*) AS c FROM embeddings
                WHERE vec_id IN (0, 10, 20))
    SELECT metric, value FROM (
        SELECT 'corpus_before' AS metric, CAST(n.c AS BIGINT) AS value FROM n
        UNION ALL
        SELECT 'corpus_after', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'text_sigs_removed', CAST(2 * t.c AS BIGINT) FROM t
        UNION ALL
        SELECT 'text_shadows_swept', CAST(t.c AS BIGINT) FROM t
        UNION ALL
        SELECT 'shadow_rows_left', CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'ivf_rows_removed', CAST(2 * et.c AS BIGINT) FROM et
        UNION ALL
        SELECT 'ivf_rows_after_maintenance',
               CAST(e.c + e10.c - 2 * et.c AS BIGINT) FROM e, e10, et
        UNION ALL
        SELECT 'readmitted', CAST(t.c AS BIGINT) FROM t
        UNION ALL
        SELECT 'unrelated_still_deduped', CAST(1 AS BIGINT)
    ) ORDER BY metric
"""

# q84_takedown_stream_verify (round 13): the streaming takedown queue +
# snapshot time travel over a PLANTED corpus (doc k < 40, stride-13
# synthetic text). Two request files ({0,10} then {20}) drain at one
# file per micro-batch = one atomic snapshot commit each, so the
# manifest advances 1 -> 3 (and, after a checkpoint wipe re-delivers
# both in ONE combined micro-batch, 3 -> 4 with identical counts —
# takedowns are idempotent on
# ids). keep_n=3 retention keeps the pre-takedown snapshot resolvable
# (seq 1 reads the full corpus). The one-shot batch twin must land on
# the same counts. Every number is id arithmetic over the fixture.
EXTRA_ORACLE_SQL["q84_takedown_stream_verify"] = """
    WITH n AS (SELECT COUNT(*) AS c FROM documents WHERE doc_id < 40),
         t AS (SELECT COUNT(*) AS c FROM documents
               WHERE doc_id IN (0, 10, 20))
    SELECT metric, value FROM (
        SELECT 'corpus_before' AS metric, CAST(n.c AS BIGINT) AS value FROM n
        UNION ALL
        SELECT 'corpus_after_drain', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'sigs_after_drain', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'pre_takedown_corpus_via_seq1', CAST(n.c AS BIGINT) FROM n
        UNION ALL
        SELECT 'snapshots_after_drain', CAST(3 AS BIGINT)
        UNION ALL
        SELECT 'twin_corpus_after', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'twin_sigs_after', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'stream_equals_twin', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'corpus_after_replay', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'sigs_after_replay', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'snapshots_after_replay', CAST(4 AS BIGINT)
    ) ORDER BY metric
"""

# q85_maintenance_verify (round 14): the z-order + bloom maintenance path
# over a PLANTED fact slice — every order carries CRT-independent cluster
# dimensions (x = o_orderkey % 97, y = o_orderkey % 89) and the exact
# money scaling (cents = floor(o_totalprice*100+0.5)). Row counts, exact
# cents/xy sums, and the bloom'd point lookup (the fixture's min
# orderkey) are pure fixture arithmetic the oracle recomputes below; the
# layout-dependent numbers — per-file footer min/max candidate counts
# and the bloom's on-disk footprint — enter as measured-margin booleans
# against planted thresholds (<= 70% of files per clustered column,
# <= 45% for the better one, >= 50 KB growth; the q13/q18 precedent).
EXTRA_ORACLE_SQL["q85_maintenance_verify"] = """
    WITH o AS (SELECT COUNT(*) AS c,
                      SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents,
                      SUM((o_orderkey % 97) * 1000 + (o_orderkey % 89)) AS xy
               FROM orders),
         p AS (SELECT COUNT(*) AS c FROM orders
               WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders))
    SELECT metric, value FROM (
        SELECT 'bloom_growth_ge_50k' AS metric, CAST(1 AS BIGINT) AS value
        UNION ALL
        SELECT 'bloom_lookup_rows', CAST(p.c AS BIGINT) FROM p
        UNION ALL
        SELECT 'cents_sum_after_bloom', CAST(o.cents AS BIGINT) FROM o
        UNION ALL
        SELECT 'cents_sum_after_zorder', CAST(o.cents AS BIGINT) FROM o
        UNION ALL
        SELECT 'n_files_12_to_20', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'prune_best_le_45pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'prune_x_le_70pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'prune_y_le_70pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'rows_after_bloom', CAST(o.c AS BIGINT) FROM o
        UNION ALL
        SELECT 'rows_after_zorder', CAST(o.c AS BIGINT) FROM o
        UNION ALL
        SELECT 'prunes_nothing_before', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'xy_sum_after_zorder', CAST(o.xy AS BIGINT) FROM o
    ) ORDER BY metric
"""

# q86_html_extract_verify (round 14): HTML boilerplate extraction over
# PLANTED markup — each doc k < 300 carries script/style/comment
# subtrees, a 100%-link nav div, an under-min-words list link, a
# link-dense footer, an &amp; entity, inline <b> tags, and two (three
# for k % 5 == 0) content paragraphs with stride-13 tokens. The oracle
# re-assembles the EXACT expected clean text (paragraphs joined with
# newline, entity decoded, inline tags absorbed) and the kept/dropped
# block counts from doc_id arithmetic alone — the extractor's output is
# string-identical or the hash fails.
EXTRA_ORACLE_SQL["q86_html_extract_verify"] = """
    WITH d AS (SELECT doc_id, 13 * doc_id AS b FROM documents
               WHERE doc_id < 300)
    SELECT doc_id,
           'alpha w' || CAST(b AS VARCHAR) ||
           ' w' || CAST(b + 1 AS VARCHAR) ||
           ' w' || CAST(b + 2 AS VARCHAR) ||
           ' w' || CAST(b + 3 AS VARCHAR) ||
           ' content & more' || chr(10) ||
           'beta w' || CAST(b + 4 AS VARCHAR) ||
           ' w' || CAST(b + 5 AS VARCHAR) || ' closing words here' ||
           CASE WHEN doc_id % 5 = 0
                THEN chr(10) || 'gamma extra w' || CAST(b + 6 AS VARCHAR) ||
                     ' w' || CAST(b + 7 AS VARCHAR) || ' paragraph tail'
                ELSE '' END AS clean_text,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 2 END AS BIGINT)
               AS blocks_kept,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 4 ELSE 3 END AS BIGINT)
               AS blocks_dropped
    FROM d ORDER BY doc_id
"""

# q87_langid_verify (round 14): char-n-gram language-ID over the PLANTED
# multilingual corpus (operators/lang_id.PLANTED_SENTENCES keyed by the
# fixture's lang column and doc_id; the fixture's own text is
# language-independent by construction, so the signal is planted). The
# model fits on doc_id % 4 != 0 and scores the disjoint % 4 == 0 split:
# eval-split sizes are fixture arithmetic the oracle recomputes; overall
# held-out accuracy >= 98% and per-language recall >= 90% are
# measured-margin booleans on a margin-separated corpus (q13 precedent).
EXTRA_ORACLE_SQL["q87_langid_verify"] = """
    WITH e AS (SELECT lang, COUNT(*) AS n FROM documents
               WHERE doc_id < 400 AND doc_id % 4 = 0
                 AND lang IN ('de', 'en', 'es', 'fr', 'zh')
               GROUP BY lang)
    SELECT metric, value FROM (
        SELECT 'accuracy_ge_98pct' AS metric, CAST(1 AS BIGINT) AS value
        UNION ALL
        SELECT 'eval_rows', CAST(SUM(n) AS BIGINT) FROM e
        UNION ALL
        SELECT 'n_langs', CAST(COUNT(*) AS BIGINT) FROM e
        UNION ALL
        SELECT 'hard_rows', CAST(3 * SUM(n) AS BIGINT) FROM e
        UNION ALL
        SELECT 'hard_short_acc_ge_90pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'hard_mixed_acc_ge_95pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'hard_code_en_acc_ge_90pct', CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'eval_n_' || lang, CAST(n AS BIGINT) FROM e
        UNION ALL
        SELECT 'recall_ge_90pct_' || lang, CAST(1 AS BIGINT) FROM e
    ) ORDER BY metric
"""

# q88_paragraph_boilerplate_verify (round 14): corpus-frequency paragraph
# boilerplate removal over PLANTED four-paragraph docs (global banner /
# unique stride-13 content / per-source banner keyed by doc_id % 3 /
# pair paragraph keyed by doc_id // 2). The oracle re-assembles the
# expected clean text IN ORDER and the kept/dropped counts — and
# recomputes every paragraph's document frequency from the same
# arithmetic (COUNTs over the fixture) instead of hardcoding verdicts,
# so the contract holds at any fixture scale. array_to_string skips
# NULL elements exactly like Spark's concat_ws.
EXTRA_ORACLE_SQL["q88_paragraph_boilerplate_verify"] = """
    WITH d AS (SELECT doc_id, 13 * doc_id AS b FROM documents
               WHERE doc_id < 300),
         n_all AS (SELECT COUNT(*) AS df FROM d),
         n3 AS (SELECT doc_id % 3 AS s, COUNT(*) AS df FROM d GROUP BY 1),
         np AS (SELECT doc_id // 2 AS p, COUNT(*) AS df FROM d GROUP BY 1)
    SELECT d.doc_id,
           array_to_string([
               CASE WHEN n_all.df < 10
                    THEN 'subscribe to our newsletter for weekly updates' END,
               'unique content paragraph w' || CAST(d.b AS VARCHAR) ||
                   ' w' || CAST(d.b + 1 AS VARCHAR) ||
                   ' about topic ' || CAST(d.doc_id AS VARCHAR),
               CASE WHEN n3.df < 10
                    THEN 'all rights reserved by source ' ||
                         CAST(d.doc_id % 3 AS VARCHAR) END,
               CASE WHEN np.df < 10
                    THEN 'shared pair paragraph number ' ||
                         CAST(d.doc_id // 2 AS VARCHAR) END
           ], chr(10)) AS clean_text,
           CAST(1 + (CASE WHEN n_all.df < 10 THEN 1 ELSE 0 END)
                  + (CASE WHEN n3.df < 10 THEN 1 ELSE 0 END)
                  + (CASE WHEN np.df < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS paras_kept,
           CAST((CASE WHEN n_all.df >= 10 THEN 1 ELSE 0 END)
                  + (CASE WHEN n3.df >= 10 THEN 1 ELSE 0 END)
                  + (CASE WHEN np.df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS paras_dropped
    FROM d, n_all, n3, np
    WHERE n3.s = d.doc_id % 3 AND np.p = d.doc_id // 2
    ORDER BY d.doc_id
"""

# q89_url_dedup_verify (round 14): URL canonicalization + url-level
# dedup over PLANTED messy surface forms (case, www., default ports, a
# real :8080 port that must survive, trailing slashes, interleaved
# tracking params, fragments; every k % 5 == 0 doc re-submitted as
# id k+100000 under a different surface form of the same page). The
# survivors are exactly the base docs, and their CANONICAL urls are
# re-assembled by the oracle from doc_id arithmetic alone and compared
# string-for-string.
EXTRA_ORACLE_SQL["q89_url_dedup_verify"] = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) ||
           '://site' || CAST(doc_id % 7 AS VARCHAR) || '.com' ||
           (CASE WHEN doc_id % 9 = 0 THEN ':8080' ELSE '' END) ||
           '/articles/item' || CAST(doc_id // 3 AS VARCHAR) ||
           '?a=' || CAST(doc_id % 4 AS VARCHAR) || '&b=2' AS canon_url
    FROM documents WHERE doc_id < 300 ORDER BY doc_id
"""

# q90_snapshot_sql_verify (round 14): the snapshot families' SQL surface
# over a PLANTED corpus (doc k < 80). Counts/sums are fixture
# arithmetic; the consistency verdicts (a pre-registered view counts the
# FULL corpus after the takedown commit; re-register counts fully-after;
# seq=1 time-travels; an aged-out seq raises) are the contract booleans/
# counts the oracle recomputes below.
EXTRA_ORACLE_SQL["q90_snapshot_sql_verify"] = """
    WITH n AS (SELECT COUNT(*) AS c, SUM(doc_id) AS s FROM documents
               WHERE doc_id < 80),
         t AS (SELECT COUNT(*) AS c, COALESCE(SUM(doc_id), 0) AS s
               FROM documents WHERE doc_id IN (0, 10, 20))
    SELECT metric, value FROM (
        SELECT 'aged_out_seq_raises' AS metric, CAST(1 AS BIGINT) AS value
        UNION ALL
        SELECT 'pinned_count_after_takedown', CAST(n.c AS BIGINT) FROM n
        UNION ALL
        SELECT 'post_count', CAST(n.c - t.c AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'post_id_sum', CAST(n.s - t.s AS BIGINT) FROM n, t
        UNION ALL
        SELECT 'pre_count', CAST(n.c AS BIGINT) FROM n
        UNION ALL
        SELECT 'seq1_count', CAST(n.c AS BIGINT) FROM n
    ) ORDER BY metric
"""

# q99: fully SQL-expressible because the PageRank recurrence is exact
# integer arithmetic — the oracle rebuilds the planted edge list from
# doc_id arithmetic (the q86/q98 precedent: no HTML parsing on the DuckDB
# side, the EXPECTED link set is closed-form) and unrolls the same three
# fixed-point iterations with `//` integer division; every rank is a
# BIGINT that must match Spark's DIV arithmetic bit-for-bit.
ORACLE_SQL["q99_link_graph_pagerank"] = """
    WITH d AS (SELECT doc_id AS k FROM documents WHERE doc_id < 500),
    raw AS (
        SELECT 'http://ex.com/p'||k AS src,
               'http://ex.com/p'||((k*7+1)%600) AS dst FROM d
        UNION ALL
        SELECT 'http://ex.com/p'||k, 'http://ex.com/p'||((k*3+11)%600) FROM d
        UNION ALL
        SELECT 'http://ex.com/p'||k, 'http://ex.com/p0' FROM d WHERE k%10 = 0
    ),
    edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    c1 AS (SELECT e.dst AS node, SUM(r.r // o.od) AS c
           FROM edges e JOIN outdeg o ON e.src = o.src
           JOIN r0 r ON r.node = e.src GROUP BY e.dst),
    r1 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                       AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
    c2 AS (SELECT e.dst AS node, SUM(r.r // o.od) AS c
           FROM edges e JOIN outdeg o ON e.src = o.src
           JOIN r1 r ON r.node = e.src GROUP BY e.dst),
    r2 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                       AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
    c3 AS (SELECT e.dst AS node, SUM(r.r // o.od) AS c
           FROM edges e JOIN outdeg o ON e.src = o.src
           JOIN r2 r ON r.node = e.src GROUP BY e.dst),
    r3 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                       AS BIGINT) AS r
           FROM nodes n LEFT JOIN c3 c ON n.node = c.node),
    top AS (SELECT node, r AS rank_ppm FROM r3
            ORDER BY r DESC, node LIMIT 20)
    SELECT node, rank_ppm FROM (
        SELECT node, rank_ppm FROM top
        UNION ALL SELECT '__edge_count',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges)
        UNION ALL SELECT '__node_count',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes)
        UNION ALL SELECT '__src_count',
                  (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) FROM edges)
    ) ORDER BY node, rank_ppm
"""

# q100: members/non_members are fixture arithmetic; flagged_members MUST
# equal members (the Bloom no-false-negative guarantee — the filter and
# probe share the same JVM xxhash64 position expression by construction);
# the false-positive count is deterministic but only computable with
# Spark's xxhash64, so it ships as a measured-margin boolean (the
# q13/q18 precedent for layout-dependent numbers).
ORACLE_SQL["q100_bloom_dedup_verify"] = """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 3000),
    c AS (
        SELECT COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS m,
               COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS nm
        FROM d
    )
    SELECT metric, value FROM (
        SELECT 'flagged_members' AS metric, CAST(m AS BIGINT) AS value FROM c
        UNION ALL SELECT 'fp_within_bound', CAST(1 AS BIGINT)
        UNION ALL SELECT 'members', CAST(m AS BIGINT) FROM c
        UNION ALL SELECT 'non_members', CAST(nm AS BIGINT) FROM c
        UNION ALL SELECT 'survivors_lower_ok', CAST(1 AS BIGINT)
    ) ORDER BY metric
"""

# q101: the whole BM25 pipeline is SQL-expressible because the scoring is
# fixed-point integer arithmetic (operators/search.py docstring) — the
# oracle re-tokenizes, rebuilds postings/df/dl/N/L, replays the exact
# integer formula, and re-cuts the top-15 under the same total order.
ORACLE_SQL["q101_bm25_search_verify"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    postings AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term <> '' GROUP BY term, doc_id
    ),
    docstats AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    g AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n,
               (SELECT SUM(dl) FROM docstats) AS l
    ),
    ts AS (
        SELECT term, COUNT(*) AS df_t FROM postings
        WHERE term IN ('vector', 'customer', 'merge') GROUP BY term
    ),
    scored AS (
        SELECT p.doc_id,
               LEAST(((g.n - ts.df_t) * 1000) // (ts.df_t + 1), 10000000)
               * (2200000 * LEAST(p.tf, 255))
               // (1000000 * LEAST(p.tf, 255) + 300000
                   + 900 * ((1000 * d.dl) // GREATEST(g.l // g.n, 1))) AS s
        FROM postings p
        JOIN ts USING (term)
        JOIN docstats d USING (doc_id)
        CROSS JOIN g
    )
    SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_milli,
           CAST(COUNT(*) AS BIGINT) AS terms_matched
    FROM scored GROUP BY doc_id
    ORDER BY score_milli DESC, doc_id LIMIT 15
"""

# q102: the registered-domain values are recomputed from the planting
# arithmetic (the q98/q99 precedent — the EXPECTED domain is closed-form
# in k), token sums come from the real text column, and the share cap's
# per-domain count is LEAST(docs, 30) even though the specific kept rows
# are hash-selected Spark-side.
ORACLE_SQL["q102_domain_curation_verify"] = """
    WITH d AS (
        SELECT doc_id AS k, len(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 2500
    ),
    surv AS (
        SELECT CASE
                 WHEN k % 5 = 0 THEN 'news' || (k % 11) || '.com'
                 WHEN k % 5 = 1 THEN 'site' || (k % 13) || '.co.uk'
                 WHEN k % 5 = 3 THEN 'host' || (k % 7) || '.org'
               END AS domain, tok
        FROM d WHERE k % 5 IN (0, 1, 3)
    )
    SELECT domain, docs, total_tokens, capped_docs FROM (
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(tok) AS BIGINT) AS total_tokens,
               CAST(LEAST(COUNT(*), 30) AS BIGINT) AS capped_docs
        FROM surv GROUP BY domain
        UNION ALL
        SELECT '__blocked', CAST(COUNT(*) AS BIGINT), 0, 0
        FROM d WHERE k % 5 = 2
        UNION ALL
        SELECT '__invalid', CAST(COUNT(*) AS BIGINT), 0, 0
        FROM d WHERE k % 5 = 4
    ) ORDER BY domain
"""

# q103: the strict-prefix selection rule IS a SQL window cumsum — the
# oracle orders by (tier DESC, doc_id ASC), cumsums the same BIGINT token
# counts, and applies the same integer budget expression; a monotone
# cumsum filter and a strict prefix are the same set.
ORACLE_SQL["q103_token_budget_verify"] = """
    WITH d AS (
        SELECT doc_id, doc_id % 7 AS tier,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        FROM documents WHERE doc_id < 2500
    ),
    b AS (SELECT (SUM(tok) * 6) // 10 AS budget FROM d),
    c AS (
        SELECT doc_id, tier, tok,
               SUM(tok) OVER (ORDER BY tier DESC, doc_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT doc_id, tier, tok FROM c, b WHERE cum <= budget ORDER BY doc_id
"""

# q104: true counts + the top-15 cut are exact SQL; the CMS guarantee
# booleans are constant 1 by contract (never-undercount holds by
# construction; the overcount bound is 3x the expected collision mass
# and the xxhash64 layout makes the measured estimate deterministic).
ORACLE_SQL["q104_cms_frequency_verify"] = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 2500
    ),
    t AS (
        SELECT term, COUNT(*) AS true_cnt FROM toks
        WHERE term <> '' GROUP BY term
    ),
    top AS (
        SELECT term, true_cnt FROM t ORDER BY true_cnt DESC, term LIMIT 15
    )
    SELECT term, CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(1 AS BIGINT) AS lower_ok, CAST(1 AS BIGINT) AS upper_ok
    FROM top ORDER BY term
"""

# q105: decisions are closed-form in k — even domains deny k%4 in (1,3)
# (plain Disallow /private; Disallow /tmp/), allow k%4 in (0,2) (no match;
# the LONGER Allow /private/ok outranking Disallow /private), odd domains
# have no robots and allow everything.
ORACLE_SQL["q105_robots_filter_verify"] = """
    WITH d AS (
        SELECT doc_id AS k, 'site' || (doc_id % 10) || '.com' AS domain,
               CASE WHEN doc_id % 10 % 2 = 0 AND doc_id % 4 IN (1, 3)
                    THEN 0 ELSE 1 END AS ok
        FROM documents WHERE doc_id < 2400
    )
    SELECT domain,
           CAST(SUM(ok) AS BIGINT) AS allowed_docs,
           CAST(COUNT(*) - SUM(ok) AS BIGINT) AS denied_docs
    FROM d GROUP BY domain ORDER BY domain
"""

# q106: per-doc dominant Unicode script, recomputed INDEPENDENTLY — the
# oracle re-counts every script class with regexp_replace arithmetic
# (RE2 and Java regex agree on literal BMP codepoint ranges; that is WHY
# functions/text.SCRIPT_RANGES uses ranges, not \p{Script=} classes) and
# re-derives the dominant via row_number with the same
# (count DESC, name ASC) tie-break the Spark struct-max encodes.
ORACLE_SQL["q106_script_detection_verify"] = """
    WITH base AS (
        SELECT doc_id,
               CASE doc_id % 7
                 WHEN 0 THEN 'plain latin words only'
                 WHEN 1 THEN 'мир труд май ok'
                 WHEN 2 THEN '世界和平 かな'
                 WHEN 3 THEN 'αβ ab'
                 WHEN 4 THEN '한국어 텍스트'
                 WHEN 5 THEN 'سلام नमस्ते سلام'
                 ELSE '12345 !!! 67890'
               END AS t
        FROM documents WHERE doc_id < 2100
    ), counts AS (
        SELECT doc_id, s,
               length(t) - length(regexp_replace(t, pat, '', 'g')) AS n
        FROM base, (VALUES
            ('arabic',     '[؀-ۿ]'),
            ('cyrillic',   '[Ѐ-ӿ]'),
            ('devanagari', '[ऀ-ॿ]'),
            ('greek',      '[Ͱ-Ͽ]'),
            ('han',        '[一-鿿]'),
            ('hangul',     '[가-힯]'),
            ('kana',       '[぀-ヿ]'),
            ('latin',      '[A-Za-z]')
        ) AS scripts(s, pat)
    ), ranked AS (
        SELECT doc_id, s, n,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, s ASC) AS rn
        FROM counts
    ), dom AS (
        SELECT CASE WHEN n > 0 THEN s ELSE 'none' END AS script,
               CASE WHEN n > 0 THEN n ELSE 0 END      AS own
        FROM ranked WHERE rn = 1
    )
    SELECT script, COUNT(*) AS docs,
           CAST(SUM(own) AS BIGINT) AS script_chars
    FROM dom GROUP BY script ORDER BY script
"""

# q107: the oracle reassembles every packed example string-for-string —
# same window cumsum as q40's shard assignment, then string_agg with an
# explicit ORDER BY doc_id (matching pack_examples' sort_array-over-
# structs determinism contract).
ORACLE_SQL["q107_pack_examples_verify"] = """
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 2500
    ), packed AS (
        SELECT doc_id, tok,
               COALESCE(SUM(tok) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM toks
    )
    SELECT CAST(cum_before // 4096 AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
    FROM packed
    GROUP BY 1
    ORDER BY 1
"""

# q108: day arithmetic on DATE-cast values is exact integers in both
# engines; the window-min first event needs no self-join.
EXTRA_ORACLE_SQL["q108_cohort_retention"] = """
    WITH j AS (
        SELECT user_id, ts,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    )
    SELECT strftime(CAST(first_ts AS DATE), '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', CAST(first_ts AS DATE),
                          CAST(ts AS DATE)) AS INTEGER) AS day_offset,
           COUNT(DISTINCT user_id) AS active_users
    FROM j
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

# q109: (ts, event_id) is a total order per user, so lead() and the
# (count desc, trigram asc) top-20 cut are deterministic in both engines.
EXTRA_ORACLE_SQL["q109_event_path_trigrams"] = """
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS e2,
               lead(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT e1, e2, e3,
           COUNT(*) AS n_paths,
           COUNT(DISTINCT user_id) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, e1, e2, e3
    LIMIT 20
"""

# q110: the Gopher rules re-derived with DuckDB list lambdas — a fully
# independent implementation of the same exact-integer verdicts (ratios
# cross-multiplied, never divided, so there is no float to disagree on).
_G110_STOPS = " + ".join(
    f"CAST(list_contains(w, '{s}') AS INT)"
    for s in ("the", "be", "to", "of", "and", "that", "have", "with")
)
EXTRA_ORACLE_SQL["q110_gopher_rules"] = f"""
    WITH base AS (
        SELECT CAST(doc_id % 5 AS INTEGER) AS bucket,
               CASE CAST(doc_id % 5 AS INTEGER)
                 WHEN 1 THEN 'deep dive' || chr(10) ||
                      repeat('- bullet point item' || chr(10), 9) || '- last'
                 WHEN 2 THEN 'start' || chr(10) ||
                      repeat('this line trails off...' || chr(10), 4) || 'end...'
                 WHEN 3 THEN repeat('the of # word ', 20)
                 WHEN 4 THEN repeat('the data and more words here ', 10)
                 ELSE text
               END AS t
        FROM documents WHERE doc_id < 2000
    ), feat AS (
        SELECT bucket,
               list_filter(regexp_split_to_array(t, '[ \n]'),
                           w -> w <> '') AS w,
               string_split(t, chr(10)) AS l,
               length(regexp_replace(t, '[ \n]', '', 'g')) AS chars,
               len(regexp_extract_all(t, '#'))
                 + len(regexp_extract_all(t, '\\.\\.\\.')) AS symbols
        FROM base
    ), meas AS (
        SELECT bucket, chars, symbols,
               len(w) AS n, len(l) AS nl,
               len(list_filter(l, x -> regexp_matches(x, '\\.\\.\\.$'))) AS ell,
               len(list_filter(l, x -> regexp_matches(x, '^[-*•]'))) AS bullets,
               len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
               {_G110_STOPS} AS stops
        FROM feat
    ), verd AS (
        SELECT bucket,
               (n >= 50 AND n <= 100000)                 AS g_nwords,
               (chars >= 3 * n AND chars <= 10 * n)      AS g_wordlen,
               (10 * symbols <= n)                       AS g_symbols,
               (10 * ell <= 3 * nl)                      AS g_ellipsis,
               (10 * bullets <= 9 * nl)                  AS g_bullets,
               (5 * alpha >= 4 * n)                      AS g_alpha,
               (stops >= 2)                              AS g_stopwords
        FROM meas
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(CAST(g_nwords    AS INT)) AS BIGINT) AS n_nwords_ok,
           CAST(SUM(CAST(g_wordlen   AS INT)) AS BIGINT) AS n_wordlen_ok,
           CAST(SUM(CAST(g_symbols   AS INT)) AS BIGINT) AS n_symbols_ok,
           CAST(SUM(CAST(g_ellipsis  AS INT)) AS BIGINT) AS n_ellipsis_ok,
           CAST(SUM(CAST(g_bullets   AS INT)) AS BIGINT) AS n_bullets_ok,
           CAST(SUM(CAST(g_alpha     AS INT)) AS BIGINT) AS n_alpha_ok,
           CAST(SUM(CAST(g_stopwords AS INT)) AS BIGINT) AS n_stopwords_ok,
           CAST(SUM(CAST((g_nwords AND g_wordlen AND g_symbols AND g_ellipsis
                  AND g_bullets AND g_alpha AND g_stopwords) AS INT))
                AS BIGINT) AS n_pass
    FROM verd GROUP BY bucket ORDER BY bucket
"""

# q111: compression ppt depends on the zlib build, so the oracle states
# the EXPECTED measured-margin gate verdicts closed-form from the plant
# (every planted doc must clear its bucket's 8x-margin gate) — the
# q13/q18 precedent for library-dependent values.
EXTRA_ORACLE_SQL["q111_compression_quality"] = """
    SELECT CAST(doc_id % 3 AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           COUNT(*) AS n_gate_ok
    FROM documents WHERE doc_id < 2100
    GROUP BY 1 ORDER BY 1
"""

# q117: the DSIR gate is planted-margin (the weights are frozen logs) —
# the oracle states counts and membership verdicts from the k arithmetic:
# top-k must be exactly the target-like set, the sampler keeps ~all of it
# and none of the raw side.
EXTRA_ORACLE_SQL["q117_dsir_selection_verify"] = """
    WITH d AS (SELECT doc_id AS k FROM documents WHERE doc_id < 2400)
    SELECT metric, CAST(value AS BIGINT) AS value FROM (
        SELECT 'n_candidates' AS metric, COUNT(*) AS value FROM d
        UNION ALL SELECT 'n_target_like', COUNT(*) FROM d WHERE k % 3 = 0
        UNION ALL SELECT 'top_k_all_target_like', 1
        UNION ALL SELECT 'sample_keeps_target_ge_99pct', 1
        UNION ALL SELECT 'sample_keeps_no_raw', 1
    ) ORDER BY metric
"""

# q118: q107's reassembly plus the offsets column — rebuilt as
# cum_before - MIN(cum_before) per shard over the identical window
# cumsum, string_agg'd in the same doc_id order.
EXTRA_ORACLE_SQL["q118_pack_offsets_verify"] = """
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 2500
    ), packed AS (
        SELECT doc_id, tok,
               COALESCE(SUM(tok) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM toks
    ), base AS (
        SELECT CAST(cum_before // 4096 AS BIGINT) AS shard_id, doc_id, tok,
               cum_before - MIN(cum_before) OVER (
                   PARTITION BY CAST(cum_before // 4096 AS BIGINT)
               ) AS off
        FROM packed
    )
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
           string_agg(CAST(off AS VARCHAR), ',' ORDER BY doc_id) AS offsets
    FROM base GROUP BY 1 ORDER BY 1
"""

# q119: the vocabulary is a (count DESC, token ASC) total-order cut —
# pure SQL both sides; OOV mass and the >10%-OOV doc count are exact
# integer arithmetic over the same tokenizer split.
EXTRA_ORACLE_SQL["q119_vocab_oov_verify"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 2500
    ), t AS (
        SELECT token, COUNT(*) AS cnt FROM toks
        WHERE token <> '' GROUP BY token
    ), v25 AS (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rank
        FROM (SELECT * FROM t ORDER BY cnt DESC, token LIMIT 200)
        ORDER BY cnt DESC, token LIMIT 25
    ), v10 AS (
        SELECT token FROM t ORDER BY cnt DESC, token LIMIT 10
    ), per AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN token IN (SELECT token FROM v10)
                        THEN 0 ELSE 1 END) AS n_oov
        FROM toks WHERE token <> '' GROUP BY doc_id
    ), rep AS (
        SELECT (SELECT COUNT(*) FROM documents WHERE doc_id < 2500) AS n_docs,
               SUM(n_tokens) AS tt, SUM(n_oov) AS oo,
               SUM(CASE WHEN n_oov * 1000000 > n_tokens * 100000
                        THEN 1 ELSE 0 END) AS d_over
        FROM per
    )
    SELECT CAST(v.rank AS BIGINT) AS rank, v.token,
           CAST(v.cnt AS BIGINT) AS cnt,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(r.tt AS BIGINT) AS total_tokens,
           CAST(r.oo * 1000000 // GREATEST(r.tt, 1) AS BIGINT) AS oov_ppm,
           CAST(r.d_over AS BIGINT) AS docs_over
    FROM v25 v CROSS JOIN rep r ORDER BY rank
"""

# q113: card verdicts are stated from the plant's LITERAL test vectors
# (4532015112830366 valid, +1 invalid, the grouped 4539... valid, the
# 1234... serial failing) — the oracle never computes Luhn, it replays
# the planted truth; masked_ok is every doc by construction (valid PANs
# masked, invalid untouched equals the expectation).
EXTRA_ORACLE_SQL["q113_pii_card_verify"] = """
    WITH d AS (SELECT CAST(doc_id % 5 AS INTEGER) AS bucket
               FROM documents WHERE doc_id < 2500)
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(COUNT(*) * (CASE WHEN bucket = 4 THEN 0 ELSE 1 END) AS BIGINT)
               AS candidates,
           CAST(COUNT(*) * (CASE WHEN bucket IN (0, 2) THEN 1 ELSE 0 END)
                AS BIGINT) AS luhn_valid,
           CAST(COUNT(*) AS BIGINT) AS masked_ok
    FROM d GROUP BY bucket ORDER BY bucket
"""

# q114: k-anonymity is plain GROUP BY/HAVING arithmetic — classes are
# distinct (segment, nation) tuples, released rows are members of >= k
# classes, generalized rows keep their label iff their class released
# (sub-k rows merge under '*', conserving the corpus total).
EXTRA_ORACLE_SQL["q114_k_anonymity_verify"] = """
    WITH cls AS (
        SELECT c_mktsegment AS s, c_nationkey, COUNT(*) AS n
        FROM customer GROUP BY 1, 2
    ),
    seg AS (
        SELECT s,
               CAST(COUNT(*) AS BIGINT) AS classes,
               CAST(SUM(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS anonymous_classes,
               CAST(SUM(CASE WHEN n >= 10 THEN n ELSE 0 END) AS BIGINT)
                   AS released_rows,
               CAST(SUM(CASE WHEN n >= 10 THEN n ELSE 0 END) AS BIGINT)
                   AS generalized_rows
        FROM cls GROUP BY s
    ),
    star AS (
        SELECT '*' AS s, CAST(0 AS BIGINT) AS classes,
               CAST(0 AS BIGINT) AS anonymous_classes,
               CAST(0 AS BIGINT) AS released_rows,
               CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
                   AS generalized_rows
        FROM cls HAVING SUM(CASE WHEN n < 10 THEN n ELSE 0 END) > 0
    )
    SELECT s AS c_mktsegment, classes, anonymous_classes, released_rows,
           generalized_rows
    FROM (SELECT * FROM seg UNION ALL SELECT * FROM star)
    ORDER BY c_mktsegment
"""

# q115: bucket 1 is the only damaged bucket (one marker pair per accented
# char, always > 0); repair recovers bucket 1 exactly and must be the
# identity everywhere else — so repair_ok is every doc, closed-form.
EXTRA_ORACLE_SQL["q115_mojibake_verify"] = """
    WITH d AS (SELECT CAST(doc_id % 4 AS INTEGER) AS bucket
               FROM documents WHERE doc_id < 2400)
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(COUNT(*) * (CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS damaged_docs,
           CAST(COUNT(*) AS BIGINT) AS repair_ok
    FROM d GROUP BY bucket ORDER BY bucket
"""

# q116: the dense grid is rebuilt with generate_series over each key's
# own [min, max] day span (same inclusive-both-ends semantics as Spark's
# sequence) and the same left-join zero-fill.
EXTRA_ORACLE_SQL["q116_activity_gapfill"] = """
    WITH e AS (
        SELECT user_id % 17 AS user_bucket, CAST(ts AS DATE) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_bucket, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY 1
    ),
    dense AS (
        SELECT user_bucket,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM spans
    )
    SELECT dense.user_bucket, dense.day,
           CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
    FROM dense LEFT JOIN e USING (user_bucket, day)
    ORDER BY user_bucket, day
"""

# q112: the streaming WARC curation front. Every count is closed-form in
# the plant: segment 0 carries the k%3<2 articles (chrome-only page dies
# at the quality gate; 404/request/truncated records never reach it),
# segment 1 adds the k%3==2 articles plus two mirrors the cross-batch
# index probe must drop AND one off-target page the DSIR rung must
# reject (round 16 — the streaming funnel's fifth rung, frozen weights
# fit on planted arithmetic, ~2x threshold margin); a drain with
# nothing new changes nothing; the batch twin reproduces the identical
# text set by construction.
EXTRA_ORACLE_SQL["q112_warc_stream_verify"] = """
    WITH k AS (SELECT doc_id FROM documents WHERE doc_id < 24)
    SELECT metric, CAST(value AS BIGINT) AS value FROM (
        SELECT 'clean_after_first_drain' AS metric,
               (SELECT COUNT(*) FROM k WHERE doc_id % 3 < 2) AS value
        UNION ALL SELECT 'clean_after_second_drain', (SELECT COUNT(*) FROM k)
        UNION ALL SELECT 'third_drain_delta', 0
        UNION ALL SELECT 'stream_equals_batch_twin', 1
        UNION ALL SELECT 'planted_articles_all_present', 1
        UNION ALL SELECT 'dsir_rejected_offtarget', 1
    ) ORDER BY metric
"""

# q120: the persisted SimHash index (q76's hamming twin). n_new is closed
# form (the new half plus the two planted b2 docs); hamming distances are
# hash-layout-dependent, so every verdict ships as a measured-margin
# boolean the Spark side computes (q13/q18/q76 discipline): planted twin
# at 3 edited shingles out of ~148 lands far inside radius 7/64, the
# fresh control shares no shingle vocabulary with anything.
EXTRA_ORACLE_SQL["q120_simhash_index_verify"] = """
    SELECT 'simhash_index' AS method,
           CAST((SELECT COUNT(*) + 2 FROM documents
                 WHERE doc_id > (SELECT MAX(doc_id) // 2 FROM documents))
               AS BIGINT) AS n_new,
           TRUE AS incremental_equals_oneshot,
           TRUE AS twin_caught,
           TRUE AS control_kept,
           TRUE AS replay_noop
"""

# q121: the bipartite similarity join. Side sizes and the exact
# cross-parity Jaccard tier are recomputed from first principles over
# the SAME union the engine sees (the planted 150-token texts rebuild in
# SQL via string_agg/printf — identical strings by construction);
# signature-estimate verdicts ship as measured-margin booleans
# (q13/q76 discipline).
EXTRA_ORACLE_SQL["q121_similarity_join_verify"] = """
    WITH mx AS (SELECT 2 * (MAX(doc_id) // 2) + 2 AS hi FROM documents),
    tw AS (SELECT string_agg(printf('pair%03d', i), ' ' ORDER BY i) AS t
           FROM range(150) r(i)),
    solo AS (SELECT string_agg(printf('solo%03d', i), ' ' ORDER BY i) AS t
             FROM range(150) r(i)),
    docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT hi, t FROM mx, tw
        UNION ALL SELECT hi + 1, replace(t, 'pair005', 'pair900') FROM mx, tw
        UNION ALL SELECT hi + 3, t FROM mx, solo
    ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM docs
    ), sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, len(t) - 1)]) AS s
        FROM toks WHERE len(t) >= 3
    ), tok AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS i
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_1, id_2, i * 1.0 / (s1.n + s2.n - i) AS j
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id_1
        JOIN sizes s2 ON s2.doc_id = id_2
    )
    SELECT 'similarity_join' AS method,
           CAST((SELECT COUNT(*) FROM docs WHERE doc_id % 2 = 0) AS BIGINT)
               AS n_left,
           CAST((SELECT COUNT(*) FROM docs WHERE doc_id % 2 = 1) AS BIGINT)
               AS n_right,
           CAST((SELECT COUNT(*) FROM pairs
                 WHERE j >= 0.5 AND (id_1 % 2) != (id_2 % 2)) AS BIGINT)
               AS n_exact_cross_50,
           TRUE AS recall_ok,
           TRUE AS no_false_pairs,
           TRUE AS twin_caught,
           TRUE AS control_clean
"""

# q122: IBAN verdicts are stated from the plant's LITERAL public test
# vectors (the ISO example GB82WEST12345698765432 valid, +1 invalid,
# DE89/FR14 both valid, GB00TEST... shape-passing checksum-failing) —
# the oracle never computes mod-97, it replays the known answers; the
# engine's chunked-mod fold is additionally pinned against an
# independent Python reference in pytest.
EXTRA_ORACLE_SQL["q122_iban_verify"] = """
    WITH k AS (
        SELECT doc_id, doc_id % 5 AS b FROM documents WHERE doc_id < 2500
    )
    SELECT CAST(b AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * (CASE WHEN b = 2 THEN 2
                                 WHEN b = 4 THEN 0 ELSE 1 END) AS BIGINT)
               AS candidates,
           CAST(COUNT(*) * (CASE WHEN b = 0 THEN 1
                                 WHEN b = 2 THEN 2 ELSE 0 END) AS BIGINT)
               AS mod97_valid,
           CAST(COUNT(*) AS BIGINT) AS masked_ok
    FROM k GROUP BY b ORDER BY bucket
"""

# q123: exact stratified sample — the oracle reruns the identical
# multiplicative-hash rank arithmetic (the q37 Knuth-mix discipline:
# exact integers, engine-neutral), so this is a full row-level compare.
EXTRA_ORACLE_SQL["q123_stratified_sample_exact"] = """
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
               ) AS rk
        FROM documents WHERE doc_id < 2500
    ) WHERE rk <= 7
    ORDER BY lang, doc_id
"""

# q124: q116's dense grid + the trailing 7-day ROWS frame, both exact
# integers (1000*sum DIV covered) — full row-level compare.
EXTRA_ORACLE_SQL["q124_rolling_activity_stats"] = """
    WITH e AS (
        SELECT user_id % 17 AS user_bucket, CAST(ts AS DATE) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_bucket, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY 1
    ),
    dense AS (
        SELECT spans.user_bucket,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM spans
    ),
    grid AS (
        SELECT dense.user_bucket, dense.day,
               CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
        FROM dense LEFT JOIN e USING (user_bucket, day)
    )
    SELECT user_bucket, day, n_events,
           CAST(SUM(n_events) OVER w AS BIGINT) AS roll_sum,
           CAST((SUM(n_events) OVER w) * 1000 // (COUNT(*) OVER w) AS BIGINT)
               AS roll_avg_milli
    FROM grid
    WINDOW w AS (PARTITION BY user_bucket ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_bucket, day
"""

# q125: the generation-store streaming merge. The lifecycle counters
# (generation seq after merge/replay) are protocol constants; every
# table-content number is q9's merge algebra recomputed from first
# principles — backfill = orders before 2001-06-01, staging = the
# trailing re-extract (>= 2001-03-01, +100000.0), staging wins on key
# collision; cents over the merged table in exact BIGINT.
EXTRA_ORACLE_SQL["q125_generation_merge_verify"] = """
    WITH staging AS (
        SELECT o_orderkey, o_totalprice + 100000.0 AS p
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-03-01'
    ), final AS (
        SELECT o_orderkey, o_totalprice AS p
        FROM orders WHERE o_orderdate < TIMESTAMP '2001-06-01'
    ), merged AS (
        SELECT p FROM final
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staging)
        UNION ALL SELECT p FROM staging
    )
    SELECT metric, value FROM (
        SELECT 'cents_live' AS metric,
               (SELECT CAST(SUM(CAST(floor(p * 100 + 0.5) AS BIGINT))
                       AS BIGINT) FROM merged) AS value
        UNION ALL SELECT 'gens_after_merge', CAST(2 AS BIGINT)
        UNION ALL SELECT 'gens_after_replay', CAST(2 AS BIGINT)
        UNION ALL SELECT 'rows_backfill',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM final)
        UNION ALL SELECT 'rows_live',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM merged)
        UNION ALL SELECT 'rows_replay',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM merged)
        UNION ALL SELECT 'rows_timetravel_pre_merge',
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM final)
    ) ORDER BY metric
"""
