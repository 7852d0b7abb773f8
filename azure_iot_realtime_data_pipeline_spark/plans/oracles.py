"""DuckDB oracle SQL — the semantic ground truth for plans/queries.py.

One ANSI-SQL string per query name, runnable by DuckDB against the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings). Column names/ordering match the
Spark outputs exactly (the driver sorts columns by name and value-hashes).

Dialect parity notes baked into these strings:
- DuckDB CAST(double AS BIGINT) ROUNDS; Spark truncates -> oracles use
  trunc() before casting.
- DuckDB regexp_replace is first-match by default -> 'g' flag.
- DuckDB row_number() is BIGINT; Spark's is INT -> CAST AS INTEGER.
- DuckDB sum(INTEGER) is HUGEINT -> CAST AS BIGINT.
- list_zip yields unnamed structs -> numeric access p[1], p[2].
- float32 values upcast to DOUBLE before multiply/accumulate so dot
  products are bit-identical with Spark's sequential f64 folds.

Queries with engine-specific hashing (xxhash64 minhash/simhash) have no
oracle here on purpose: the driver records a rows-only check and their
exactness is covered by package tests PLUS the md5-based portable twins
(q_minhash_lsh_portable / q_simhash_portable, generated at the bottom of
this file) which ARE hash-checked. q_lsh_topk's hyperplane signatures
are pure float arithmetic over deterministic literals, so it is fully
oracled despite being "approximate".
"""

from azure_iot_realtime_data_pipeline_spark.functions.rounding import (
    sql_round_half_up,
)

STOP_IN = "('the','a','of','and','to','in','is')"

ORACLES: dict[str, str] = {
    "q_scan_events": "SELECT event_id, ts, user_id, event_type, value FROM events",
    "q_from_json": (
        "SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events"
    ),
    "q_incremental_tail": (
        "SELECT event_id, ts, user_id, event_type, value FROM events "
        "WHERE ts > TIMESTAMP '2024-01-25 00:00:00'"
    ),
    "q_offset_fetch": (
        "SELECT event_id, ts, user_id, value FROM events "
        "ORDER BY ts, event_id LIMIT 50 OFFSET 100"
    ),
    "q_cte": (
        """
        WITH enriched AS (
          SELECT user_id, event_type, value FROM events WHERE user_id IS NOT NULL
        ),
        flagged AS (
          SELECT user_id, event_type,
                 CASE WHEN value > 150 THEN 1 ELSE 0 END AS hot
          FROM enriched
        )
        SELECT user_id, event_type, COUNT(*) AS n, CAST(SUM(hot) AS BIGINT) AS n_hot
        FROM flagged GROUP BY user_id, event_type
        """
    ),
    "q_select_star": "SELECT * FROM events",
    "q_project": "SELECT event_id, user_id, event_type FROM events",
    "q_nested_access": (
        "SELECT event_id, value AS lat, value + 1.0 AS lon FROM events"
    ),
    "q_filter_notnull": (
        "SELECT event_id, 'dev-' || CAST(user_id AS VARCHAR) AS deviceId "
        "FROM events WHERE event_type <> 'click'"
    ),
    "q_cast": (
        "SELECT event_id, CAST(ts AS DATE) AS event_date, "
        "CAST(trunc(value) AS BIGINT) AS value_int, "
        "CAST(user_id AS VARCHAR) AS user_str FROM events"
    ),
    "q_magnitude": (
        "SELECT l_orderkey, l_linenumber, "
        "sqrt(l_quantity*l_quantity + l_discount*l_discount + l_tax*l_tax) AS magnitude "
        "FROM lineitem"
    ),
    "q_case_when": (
        "SELECT event_id, CASE WHEN event_type = 'error' THEN 'E' "
        "WHEN value > 150 THEN 'H' WHEN user_id < 5 THEN 'L' ELSE 'N' END AS bucket "
        "FROM events"
    ),
    "q_anomaly_flag": (
        "SELECT event_id, CASE WHEN value > 180 THEN 1 "
        "WHEN event_type = 'error' THEN 1 WHEN user_id = 0 THEN 1 ELSE 0 END AS anomaly "
        "FROM events"
    ),
    "q_normalize": (
        "SELECT 'default@v1' AS schema, CAST(event_id AS VARCHAR) AS message_id, "
        "'dev-' || CAST(user_id AS VARCHAR) AS deviceId, ts AS enqueuedTime, "
        "'telemetry' AS messageSource, event_type AS component, value FROM events"
    ),
    "q_wire_normalize": (
        # end state of the full wire chain (raw -> jq envelope -> ASA
        # Telemetry projection): battery = floor(value) pivoted through
        # the entries map then BIGINT->INT cast (integral, so DuckDB's
        # round-on-cast == Spark's truncate); barometer = value * 1.5
        # (binary-exact literal); vector sensors are null on the scalar
        # wire so lat/lon/alt and all three magnitudes are NULL doubles.
        """
        SELECT 'dev-' || CAST(user_id AS VARCHAR) AS deviceId,
               ts AS enqueuedTime,
               CAST(CAST(floor(value) AS BIGINT) AS INTEGER) AS battery,
               value * 1.5 AS barometer,
               CAST(NULL AS DOUBLE) AS latitude,
               CAST(NULL AS DOUBLE) AS longitude,
               CAST(NULL AS DOUBLE) AS altitude,
               CAST(NULL AS DOUBLE) AS AccelMagnitude,
               CAST(NULL AS DOUBLE) AS GyroMagnitude,
               CAST(NULL AS DOUBLE) AS MagMagnitude,
               CAST(0 AS INTEGER) AS Anomaly
        FROM events
        WHERE user_id IS NOT NULL
        """
    ),
    "q_wire_serve": (
        # end state of the serve chain (curated -> powerbi rows -> JSON
        # payload + batch watermark): every numeric coalesced to 0.0 as
        # DOUBLE, ISO-millis 'Z' text timestamps, to_json payload (both
        # engines format plain-decimal doubles identically — every
        # payload number here is 0.0 or in [0.01, ~900]), and the E2
        # MAX(enqueuedTime) watermark cross-joined onto every row.
        """
        WITH curated AS (
          SELECT 'dev-' || CAST(user_id AS VARCHAR) AS deviceId,
                 ts AS enqueuedTime,
                 CAST(CAST(floor(value) AS BIGINT) AS INTEGER) AS battery,
                 value * 1.5 AS barometer
          FROM events
          WHERE user_id IS NOT NULL
        ),
        r AS (
          SELECT coalesce(deviceId, '') AS deviceId,
                 strftime(enqueuedTime, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS enqueuedTime,
                 coalesce(CAST(battery AS DOUBLE), 0.0::DOUBLE) AS battery,
                 coalesce(barometer, 0.0::DOUBLE) AS barometer,
                 0.0::DOUBLE AS latitude,
                 0.0::DOUBLE AS longitude,
                 0.0::DOUBLE AS altitude,
                 0.0::DOUBLE AS AccelMagnitude,
                 0.0::DOUBLE AS GyroMagnitude,
                 0.0::DOUBLE AS MagMagnitude,
                 0.0::DOUBLE AS Anomaly
          FROM curated
        ),
        wm AS (
          SELECT strftime(max(enqueuedTime), '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS batch_watermark
          FROM curated
        )
        SELECT r.*,
               to_json(struct_pack(
                 deviceId := deviceId, enqueuedTime := enqueuedTime,
                 battery := battery, barometer := barometer,
                 latitude := latitude, longitude := longitude,
                 altitude := altitude, AccelMagnitude := AccelMagnitude,
                 GyroMagnitude := GyroMagnitude, MagMagnitude := MagMagnitude,
                 Anomaly := Anomaly)) AS payload,
               batch_watermark
        FROM r CROSS JOIN wm
        """
    ),
    "q_array_transform": (
        "SELECT doc_id, upper(tok) AS token FROM ("
        "  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok"
        "  FROM documents)"
    ),
    "q_map_from_entries": (
        "SELECT event_id, value AS v, value * 2 AS v2 FROM events"
    ),
    "q_count": "SELECT COUNT(*) AS n FROM events",
    "q_max_ts": "SELECT max(ts) AS max_ts FROM events",
    "q_orderby": (
        "SELECT event_id, ts, CAST(row_number() OVER (ORDER BY ts, event_id) AS INTEGER) AS rn "
        "FROM events"
    ),
    "q_latest_value": (
        "SELECT event_type, value AS latest_value, ts AS latest_ts FROM ("
        "  SELECT event_type, value, ts, row_number() OVER ("
        "    PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "WHERE rn = 1"
    ),
    "q_groupby_device": (
        "SELECT user_id, event_type, n, "
        "floor((s / n) * 10000 + 0.5) / 10000 AS avg_value, s AS sum_value FROM ("
        "  SELECT user_id, event_type, COUNT(*) AS n, "
        "  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s "
        "  FROM events GROUP BY user_id, event_type)"
    ),
    "q_trailing_window": (
        "SELECT event_id, user_id, "
        "floor((CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / (count(*) OVER w)) * 10000 + 0.5) / 10000 AS avg_1h, "
        "count(*) OVER w AS n_1h "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) "
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
    ),
    "q_trailing_window_global": (
        # reference-faithful: NO PARTITION BY (iot-stream-analytics-query.sql:33-44)
        "SELECT event_id, "
        "floor((CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / (count(*) OVER w)) * 10000 + 0.5) / 10000 AS avg_1h, "
        "count(*) OVER w AS n_1h "
        "FROM events "
        "WINDOW w AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) "
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
    ),
    "q_spike_dip": (
        """
        SELECT event_id, user_id, score,
               CASE WHEN abs(score) > 3.0 THEN 1 ELSE 0 END AS is_anomaly
        FROM (
          SELECT event_id, user_id,
                 floor((CASE WHEN n <= 1 OR sd <= abs(mean) * 1e-6 THEN 0.0
                            ELSE (value - mean) / sd END) * 10000 + 0.5) / 10000 AS score
          FROM (
            SELECT event_id, user_id, value, n, mean,
                   sqrt(greatest((s2 - s1 * mean) / (n - 1), 0.0)) AS sd
            FROM (
              SELECT event_id, user_id, value, n, s1, s2, s1 / n AS mean
              FROM (
                SELECT event_id, user_id, value,
                       count(value) OVER w AS n,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
                       CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
              )
            )
          )
        )
        """
    ),
    "q_dedup_devices": (
        "SELECT user_id, event_id AS first_event_id, ts AS first_ts, "
        "event_type AS first_event_type FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "  FROM events) WHERE rn = 1"
    ),
    "q_join_devices": (
        "SELECT user_id, c_name, c_mktsegment, COUNT(*) AS n, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value "
        "FROM events JOIN customer ON user_id = c_custkey "
        "GROUP BY user_id, c_name, c_mktsegment"
    ),
    "q_date_format": (
        "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS ts_str FROM events"
    ),
    "q_coalesce": (
        "SELECT event_id, "
        "coalesce(CASE WHEN event_type <> 'click' THEN value END, 0.0) AS value_c, "
        "coalesce(CASE WHEN user_id <> 0 THEN CAST(user_id AS VARCHAR) END, '') AS device_c "
        "FROM events"
    ),
    "q_to_json": (
        "SELECT event_id, to_json(struct_pack(event_id := event_id, "
        "event_type := event_type)) AS payload FROM events"
    ),
    "q_repeated_spans": (
        # mirror of dedup.repeated_spans (w=10, stride=1): sliding
        # windows via generate_series, md5 span key, distinct-doc count,
        # rank keeps (min doc, min start). t[i:i+9] is DuckDB's
        # inclusive slice = 10 tokens.
        """
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM documents
        ),
        spans AS (
          SELECT doc_id, CAST(i AS BIGINT) AS start_tok,
                 md5(array_to_string(t[i:i+9], ' ')) AS span_hash
          FROM toks, unnest(generate_series(1, len(t) - 9)) AS u(i)
          WHERE len(t) >= 10
        ),
        rep AS (
          SELECT span_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_occurrences
          FROM spans GROUP BY span_hash
          HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT doc_id, start_tok, span_hash, n_docs, n_occurrences,
               CAST(CASE WHEN row_number() OVER (
                 PARTITION BY span_hash ORDER BY doc_id, start_tok) = 1
               THEN 1 ELSE 0 END AS INTEGER) AS keep
        FROM spans JOIN rep USING (span_hash)
        """
    ),
    "q_repeat_regions": (
        # mirror of dedup.repeated_span_regions: repeated-span keep=0
        # occurrences interval-merged per doc via the running-max open
        # flag. Same span CTEs as q_repeated_spans.
        """
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM documents
        ),
        spans AS (
          SELECT doc_id, CAST(i AS BIGINT) AS start_tok,
                 md5(array_to_string(t[i:i+9], ' ')) AS span_hash
          FROM toks, unnest(generate_series(1, len(t) - 9)) AS u(i)
          WHERE len(t) >= 10
        ),
        rep AS (
          SELECT span_hash FROM spans GROUP BY span_hash
          HAVING count(DISTINCT doc_id) >= 2
        ),
        occ AS (
          SELECT doc_id, start_tok,
                 row_number() OVER (
                   PARTITION BY span_hash ORDER BY doc_id, start_tok) AS rn
          FROM spans JOIN rep USING (span_hash)
        ),
        ivals AS (
          SELECT doc_id, start_tok AS s, start_tok + 10 AS e
          FROM occ WHERE rn > 1
        ),
        flagged AS (
          SELECT doc_id, s, e,
                 CASE WHEN max(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) IS NULL
                      OR s > max(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS opens
          FROM ivals
        ),
        regions AS (
          SELECT doc_id, s, e,
                 sum(opens) OVER (
                   PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS region
          FROM flagged
        )
        SELECT doc_id, min(s) AS region_start, max(e) AS region_end,
               max(e) - min(s) AS n_tokens
        FROM regions GROUP BY doc_id, region
        """
    ),
    "q_compact_bursts": (
        # mirror of sessions.compact_bursts (gap 600 s): the sessionize
        # gap chain, then per-burst envelope + the first row via min on
        # a (ts, event_id, ...) row ordering.
        """
        WITH marked AS (
          SELECT user_id, event_id, event_type, value, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                      THEN 1 ELSE 0 END AS new_b
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        bursts AS (
          SELECT *,
                 CAST(SUM(new_b) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS burst_id
          FROM marked
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY user_id, burst_id ORDER BY epoch_us(ts), event_id) AS rn
          FROM bursts
        )
        SELECT b.user_id, b.burst_id,
               MIN(b.ts) AS burst_start, MAX(b.ts) AS burst_end,
               COUNT(*) AS n_events,
               MIN(CASE WHEN rn = 1 THEN event_id END) AS first_event_id,
               MIN(CASE WHEN rn = 1 THEN event_type END) AS first_event_type,
               MIN(CASE WHEN rn = 1 THEN value END) AS first_value
        FROM ranked b
        GROUP BY b.user_id, b.burst_id
        """
    ),
    "q_key_skew": (
        # mirror of skew.key_skew_profile(top_k=20): count per key,
        # top 20 by (n DESC, key ASC), share = n/total rounded 6 dp
        """
        WITH counts AS (
          SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM events)
        SELECT user_id, n,
               floor((CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS share
        FROM counts, tot
        ORDER BY n DESC, user_id ASC
        LIMIT 20
        """
    ),
    "q_sample_per_group": (
        # mirror of corpus.sample_per_group (k=5): k smallest
        # md5(source:id) draws per source, doc_id tiebreak.
        """
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        ) WHERE rn <= 5
        """
    ),
    "q_curate_corpus": (
        # end state of the J-family curation chain: normalize -> exact
        # dedup on the normalized text (first-doc-wins) -> token/quality
        # /language stats over the normalized form -> md5-prefix split.
        f"""
        WITH normed AS (
          SELECT doc_id, source,
                 trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')) AS norm_text
          FROM documents
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
          FROM normed
        ),
        toks AS (
          SELECT doc_id, source, norm_text,
                 list_filter(string_split(norm_text, ' '), t -> t <> '') AS t
          FROM ranked WHERE rn = 1
        )
        SELECT doc_id, source,
               CAST(len(t) AS BIGINT) AS n_tokens,
               floor((0.5 * (CASE WHEN length(norm_text) = 0 THEN 0.0
                      ELSE CAST(length(regexp_replace(norm_text, '[^a-z ]', '', 'g')) AS DOUBLE)
                           / length(norm_text) END)
                   + 0.5 * (1.0 - CASE WHEN len(t) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(t, x -> x IN {STOP_IN})) AS DOUBLE)
                           / len(t) END)) * 10000 + 0.5) / 10000 AS quality,
               CASE WHEN len(list_filter(t, x -> x IN {STOP_IN})) > 0
                    THEN 'en' ELSE 'und' END AS lang_pred,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM toks
        """
    ),
    "q_pricing_summary": (
        # M1 mirror: shipdate-filtered pricing summary, int64 micro-unit
        # money sums (float->DECIMAL casts round half-up in Spark but
        # half-even in DuckDB; floor(v*1e6+0.5) is bit-identical), avgs
        # rounded half-up on the same association as the Spark side.
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sq AS DOUBLE) / 1000000.0 AS sum_qty,
               CAST(sp AS DOUBLE) / 1000000.0 AS sum_base_price,
               CAST(sd AS DOUBLE) / 1000000.0 AS sum_disc_price,
               CAST(sc AS DOUBLE) / 1000000.0 AS sum_charge,
               floor(((CAST(sq AS DOUBLE) / 1000000.0) / n) * 10000 + 0.5) / 10000 AS avg_qty,
               floor(((CAST(sp AS DOUBLE) / 1000000.0) / n) * 10000 + 0.5) / 10000 AS avg_price,
               n
        FROM (
          SELECT l_returnflag, l_linestatus,
                 SUM(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)) AS sq,
                 SUM(CAST(floor(l_extendedprice * 1000000 + 0.5) AS BIGINT)) AS sp,
                 SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS sd,
                 SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000 + 0.5) AS BIGINT)) AS sc,
                 COUNT(*) AS n
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus
        )
        """
    ),
    "q_revenue_by_segment": (
        # M2 mirror: three-table star join, micro-unit revenue.
        """
        SELECT c_mktsegment,
               CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    ),
    "q_quantile_sketch": (
        # mirror of analytics.quantile_sketch (256 bins): per-group
        # range, fixed-width bucket counts, cumulative distribution,
        # first bucket reaching ceil(q*n), upper-edge estimate rounded
        # half-up. Literals cast ::DOUBLE (DuckDB decimal-literal trap).
        """
        WITH v AS (
          SELECT event_type, CAST(value AS DOUBLE) AS val
          FROM events WHERE value IS NOT NULL
        ),
        rng AS (
          SELECT event_type, min(val) AS lo, max(val) AS hi
          FROM v GROUP BY event_type
        ),
        counts AS (
          SELECT v.event_type,
                 CASE WHEN hi > lo
                      THEN least(CAST(255 AS BIGINT),
                                 CAST(floor((val - lo) / ((hi - lo) / CAST(256.0 AS DOUBLE))) AS BIGINT))
                      ELSE CAST(0 AS BIGINT) END AS b,
                 lo, hi, count(*) AS c
          FROM v JOIN rng USING (event_type)
          GROUP BY 1, 2, 3, 4
        ),
        cum AS (
          SELECT event_type, b, lo, hi,
                 sum(c) OVER (PARTITION BY event_type ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM counts
        ),
        hits AS (
          SELECT event_type, q, b, lo, hi
          FROM cum, unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS u(q)
          WHERE cumc >= CAST(ceil(q * n) AS BIGINT)
        ),
        fst AS (
          SELECT event_type, q, min(b) AS b, min(lo) AS lo, min(hi) AS hi
          FROM hits GROUP BY 1, 2
        )
        SELECT event_type, q,
               floor((CASE WHEN hi > lo
                           THEN lo + (b + 1) * ((hi - lo) / CAST(256.0 AS DOUBLE))
                           ELSE lo END) * 10000 + 0.5) / 10000 AS p_est
        FROM fst
        """
    ),
    "q_domain_mixture": (
        # mirror of corpus.domain_mixture_sample (budget_frac=0.5):
        # per-source token totals, equal-share budget, rate rounded
        # half-up to 6 dp BEFORE the md5-prefix draw comparison. The
        # ((0.5 * t) / s) / src_tokens association matches the Spark
        # side's python-scalar-then-column division exactly.
        """
        WITH staged AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        per_source AS (
          SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM staged GROUP BY source
        ),
        tot AS (
          SELECT CAST(sum(src_tokens) AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS s
          FROM per_source
        ),
        rates AS (
          SELECT source,
                 least(1.0::DOUBLE,
                       floor((((0.5 * CAST(t AS DOUBLE)) / CAST(s AS DOUBLE))
                              / CAST(src_tokens AS DOUBLE)) * 1000000 + 0.5)
                       / 1000000) AS rate
          FROM per_source, tot
        )
        SELECT st.doc_id, st.source, st.n_tokens, r.rate
        FROM staged st JOIN rates r USING (source)
        WHERE CAST('0x' || substr(md5(st.source || ':' || CAST(st.doc_id AS VARCHAR)), 1, 4) AS BIGINT) / 65536.0 < r.rate
        """
    ),
    "q_dedup_exact": (
        "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY md5(text)"
    ),
    "q_token_count": (
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens, "
        "CAST(length(text) AS BIGINT) AS text_len FROM documents"
    ),
    "q_quality_score": (
        f"""
        SELECT doc_id,
          floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                      / length(text) END)
              + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                      / len(toks) END)) * 10000 + 0.5) / 10000 AS quality
        FROM (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        )
        """
    ),
    "q_lang_id": (
        f"""
        SELECT doc_id,
          CASE WHEN len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
                                    t -> t IN {STOP_IN})) > 0
               THEN 'en' ELSE 'und' END AS lang_pred
        FROM documents
        """
    ),
    "q_fingerprint": (
        """
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                             t -> CAST(length(t) * 7 + ascii(substr(t, 1, 1)) AS BIGINT))),
            (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
        FROM documents
        """
    ),
    "q_ngram_jaccard": (
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents WHERE doc_id < 50
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)) * 10000 + 0.5) / 10000 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        """
    ),
    "q_top_ngrams": (
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        )
        SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
        ORDER BY df DESC, shingle ASC LIMIT 20
        """
    ),
    "q_topk_cosine": (
        """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        pairs AS (
          SELECT query_id, cand_id,
            floor((
              list_sum(list_transform(list_zip(qv, cv),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              ) * 10000 + 0.5) / 10000 AS cosine
          FROM q, c WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
          FROM pairs
        ) WHERE rn <= 10
        """
    ),
    # q_minhash_lsh, q_simhash: intentionally no oracle (xxhash64 is
    # engine-specific); their md5-based portable twins below are
    # hash-checked, and q_lsh_topk's oracle is generated at file bottom.
    "q_adjust_clamp": (
        """
        SELECT event_id, user_id, ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS adjusted_ts
        FROM events
        """
    ),
    "q_drop_late": (
        """
        SELECT event_id, user_id, ts FROM (
          SELECT event_id, user_id, ts,
                 max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
          FROM events
        ) WHERE CAST(floor(epoch(ts)) AS BIGINT) >= hwm - 60
        """
    ),
    "q_eventtime_policy": (
        """
        SELECT event_id, user_id, ts, adjusted_ts FROM (
          SELECT event_id, user_id, ts,
                 max(ts) OVER w AS adjusted_ts,
                 max(epoch_us(ts)) OVER w AS hwm_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) WHERE epoch_us(ts) >= hwm_us - 60000000
        """
    ),
    "q_identity": (
        "SELECT CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS telemetryId, "
        "event_id, user_id, ts FROM events"
    ),
    "q_multimodal_meta": (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "sha256(text) AS sha256, lower(hex(encode(substr(text, 1, 4)))) AS magic "
        "FROM documents"
    ),
    "q_image_meta": (
        """
        SELECT doc_id,
               CAST(64 + ('0x' || substr(h, 1, 2))::INTEGER % 192 AS INTEGER) AS width,
               CAST(64 + ('0x' || substr(h, 3, 2))::INTEGER % 192 AS INTEGER) AS height,
               CAST(1 + ('0x' || substr(h, 5, 2))::INTEGER % 4 AS INTEGER) AS channels
        FROM (SELECT doc_id, sha256(text) AS h FROM documents)
        """
    ),
    "q_frame_sample": (
        # frames = payload split into 256-byte windows, every 4th kept;
        # n_frames = max(len // 256, 1); the tail frame may be short.
        # The harness column is md5 hex of the frame bytes (raw BINARY
        # breaks the driver's pandas canonicalizer). DuckDB's md5 only
        # takes VARCHAR, so the slice+hash run in the char domain —
        # byte-exact because the synthetic corpus is pure ASCII at every
        # SF (verified: octet_length == length for all docs); a
        # non-ASCII corpus would need a blob-domain oracle.
        """
        WITH p AS (
          SELECT doc_id, text, octet_length(encode(text)) AS len
          FROM documents
        ),
        f AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, greatest(len // 256, 1) - 1, 4)) AS i
          FROM p
        )
        SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
               md5(substring(text, CAST(i * 256 + 1 AS BIGINT), 256)) AS frame_md5
        FROM f
        """
    ),
    "q_embed_dedup": (
        """
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            floor((
              list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              ) * 10000 + 0.5) / 10000 AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.3
        """
    ),
    "q_bpe_token_count": (
        r"""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        FROM documents
        """
    ),
    # salted operators: the oracle is the UNSALTED form on purpose —
    # the operator's contract is result-identity under shuffle reshaping
    "q_salted_agg": (
        "SELECT user_id, COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY user_id"
    ),
    "q_salted_join": (
        """
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment
        """
    ),
    "q_salted_join_selective": (
        """
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment
        """
    ),
    # q_ivf_topk: assigned at file bottom from _ivf_oracle_sql() — ONE
    # source of truth shared with q_hard_negatives_ann (review r7 pass 2)
    "q_sessionize": (
        """
        WITH marked AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sess AS (
          SELECT user_id, ts,
                 CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM marked
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sess GROUP BY user_id, session_id
        """
    ),
    "q_tumbling_agg": (
        """
        SELECT event_type,
               make_timestamp(CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS window_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type, window_start
        """
    ),
    "q_hopping_agg": (
        """
        SELECT event_type,
               make_timestamp((CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT)
                               * 21600 - hops.k * 21600) * 1000000) AS window_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events CROSS JOIN generate_series(0, 3) AS hops(k)
        GROUP BY event_type, window_start
        """
    ),
    "q_asof_join": (
        """
        WITH build AS (
          SELECT user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
          QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) = 1
        ),
        probe AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts,
               b.purchase_value AS asof_purchase_value
        FROM probe p
        ASOF LEFT JOIN build b ON p.user_id = b.user_id AND p.ts >= b.ts
        """
    ),
    "q_topn_per_group": (
        """
        SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id DESC) AS INTEGER) AS rank,
               event_id, value
        FROM events
        QUALIFY rank <= 5
        """
    ),
    "q_median_value": (
        """
        SELECT event_type, value AS median_value FROM (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ) WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
        """
    ),
    # --- §2.J corpus management (J19-J23) ---
    "q_hash_split": (
        # thresholds = split_bounds(0.8, 0.1): 0xcccc / 0xe666 of the
        # 16-bit md5-prefix space; DuckDB md5 emits the same lowercase hex
        """
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        """
    ),
    "q_decontaminate": (
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        contaminated AS (
          SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
        )
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        """
    ),
    "q_normalize_text": (
        """
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')) AS norm_text
        FROM documents
        """
    ),
    "q_repetition_score": (
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        ),
        agg AS (
          SELECT doc_id, COUNT(*) AS total, COUNT(DISTINCT shingle) AS dis
          FROM sh GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(floor((1.0 - CAST(dis AS DOUBLE) / total) * 10000 + 0.5) / 10000, 0.0) AS rep_score
        FROM documents d LEFT JOIN agg USING (doc_id)
        """
    ),
    "q_mask_pii": (
        # identical enrichment string to the Spark side, then the same
        # two-pass masking (emails first, then 7+-digit runs)
        """
        WITH enriched AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com ref '
                      || CAST(doc_id * 9999991 + 1234567 AS VARCHAR) AS t
          FROM documents
        ),
        masked AS (
          SELECT doc_id,
                 regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS m
          FROM enriched
        )
        SELECT e.doc_id,
               regexp_replace(m.m, '[0-9]{7,}', '<NUM>', 'g') AS masked_text,
               CAST(len(regexp_extract_all(e.t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(m.m, '[0-9]{7,}')) AS BIGINT) AS n_digit_runs
        FROM enriched e JOIN masked m USING (doc_id)
        """
    ),
    "q_tf_idf": (
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        terms AS (SELECT doc_id, unnest(toks) AS term FROM docs),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf,
               floor((tf.tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)) * 10000 + 0.5) / 10000 AS tf_idf
        FROM tf JOIN dft USING (term) CROSS JOIN n
        """
    ),
    "q_bm25": (
        # same literal structure as operators/relevance.py:bm25 —
        # k1=1.2, b=0.75, norm denominator (tf + 1.2*((1-0.75) + (0.75*dl)/avgdl))
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        terms AS (SELECT doc_id, unnest(toks) AS term FROM docs),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        s AS (
          SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n_docs,
                 CAST((SELECT SUM(tf) FROM tf) AS DOUBLE)
                   / (SELECT COUNT(*) FROM documents) AS avgdl
        )
        SELECT tf.doc_id, tf.term, tf.tf,
               floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * ((tf.tf * 2.2)
                         / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / avgdl))))
                     * 10000 + 0.5) / 10000 AS bm25
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN s
        """
    ),
    "q_stratified_sample": (
        """
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4)
              < CASE lang WHEN 'en' THEN '4000' WHEN 'zh' THEN 'c000' ELSE '8000' END
        """
    ),
    # --- §2.L general analytics ---
    "q_pivot_counts": (
        """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events GROUP BY user_id
        """
    ),
    "q_rollup_agg": (
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY ROLLUP(event_type)
        """
    ),
    "q_event_gaps": (
        """
        SELECT event_id, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events
        """
    ),
    "q_percentiles": (
        """
        WITH ranked AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type, q, value AS p_value
        FROM ranked CROSS JOIN
             (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS q) qs
        WHERE rn = CAST(ceil(q * n) AS BIGINT)
        """
    ),
    "q_importance_sample": (
        # uniform draw mirrors corpus.uniform_hash exactly: reduce the id
        # mod 2^31-1 BEFORE multiplying (int64-overflow-safe for any id),
        # fold negatives with +mod %mod; keep when draw < quality score
        f"""
        SELECT doc_id FROM (
          SELECT doc_id,
            CAST((((doc_id % 2147483647) * 2654435761 + 12345) % 2147483647
                  + 2147483647) % 2147483647 AS DOUBLE)
              / 2147483647.0 AS u,
            floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                        / length(text) END)
                + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                        / len(toks) END)) * 10000 + 0.5) / 10000 AS quality
          FROM (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
          )
        ) WHERE u < least(greatest(quality, 0.0), 1.0)
        """
    ),
    "q_pack_sequences": (
        """
        SELECT doc_id, doc_id % 8 AS shard, n_tokens,
               CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin
        FROM (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
                 SUM(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT))
                   OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents
        )
        """
    ),
    "q_dup_clusters": (
        # transitive closure via recursive CTE: reach(node, r) = node can
        # reach r; cluster_id = MIN reachable id (includes self)
        """
        WITH RECURSIVE docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents WHERE doc_id < 50
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(node, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
        )
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
        """
    ),
    "q_interval_join": (
        """
        SELECT c.user_id, c.event_id, c.ts,
               p.event_id AS event_id_b, p.ts AS ts_b, p.value AS value_b
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND epoch_us(p.ts) >= epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        """
    ),
    "q_asof_forward": (
        # forward as-of has no DuckDB ASOF form (ASOF JOIN is backward
        # only) — LATERAL picks the earliest at-or-after build per probe,
        # an implementation genuinely independent of the Spark union scan
        """
        WITH build AS (
          SELECT user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
          QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) = 1
        ),
        probe AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts, nb.purchase_value AS next_purchase_value
        FROM probe p LEFT JOIN LATERAL (
          SELECT b.purchase_value
          FROM build b
          WHERE b.user_id = p.user_id AND b.ts >= p.ts
          ORDER BY b.ts LIMIT 1
        ) nb ON TRUE
        """
    ),
    "q_interval_join_left": (
        """
        SELECT c.user_id, c.event_id, c.ts,
               p.event_id AS event_id_b, p.ts AS ts_b, p.value AS value_b
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND epoch_us(p.ts) >= epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        """
    ),
    "q_histogram": (
        """
        SELECT event_type,
               CAST(least(greatest(floor((value - 0.0) / 32.0), 0), 15) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               0.0::DOUBLE + CAST(least(greatest(floor((value - 0.0) / 32.0), 0), 15) AS BIGINT) * 32.0::DOUBLE AS bucket_lo
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        """
    ),
    "q_line_dedup": (
        # J46: 8-token non-overlapping segments; a segment is boilerplate
        # when its exact text occurs in >= 3 distinct docs. string_agg
        # skips NULL (dropped) segments without emitting a separator,
        # matching Spark's filter-then-concat_ws; COALESCE('') covers
        # docs whose every segment was dropped (concat_ws of empty = '').
        """
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents
        ),
        starts AS (
          SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1, 8)) AS s
          FROM toks WHERE len(tk) > 0
        ),
        segs AS (
          SELECT doc_id, CAST(s // 8 AS INTEGER) AS pos,
                 array_to_string(list_slice(tk, s + 1, s + 8), ' ') AS seg
          FROM starts
        ),
        freq AS (
          SELECT seg FROM (
            SELECT seg, COUNT(DISTINCT doc_id) AS docs FROM segs GROUP BY seg
          ) WHERE docs >= 3
        ),
        marked AS (
          SELECT s.doc_id, s.pos, s.seg,
                 CASE WHEN f.seg IS NULL THEN 0 ELSE 1 END AS d
          FROM segs s LEFT JOIN freq f USING (seg)
        )
        SELECT doc_id,
               CAST(SUM(1 - d) AS BIGINT) AS kept_segments,
               CAST(SUM(d) AS BIGINT) AS removed_segments,
               COALESCE(string_agg(CASE WHEN d = 0 THEN seg END, ' ' ORDER BY pos), '')
                 AS clean_text
        FROM marked GROUP BY doc_id
        """
    ),
    "q_chunk_documents": (
        # chunk k covers tokens [k*96, k*96 + 128): stride 96 = 128 - 32
        # overlap; list_slice is 1-based inclusive and clamps like
        # Spark's F.slice; `//` for the chunk index (plain `/` on ints
        # is DOUBLE in DuckDB). Empty docs yield no chunks.
        """
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents
        ),
        starts AS (
          SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 1, 96)) AS s
          FROM toks WHERE len(tk) > 0
        )
        SELECT doc_id,
               CAST(s // 96 AS INTEGER) AS chunk_idx,
               CAST(least(128, len(tk) - s) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(tk, s + 1, s + 128), ' ') AS chunk_text
        FROM starts
        """
    ),
    "q_embedding_centroid": (
        # int64 micro-unit sums: float->DECIMAL casts round differently
        # across engines (shortest-repr vs exact binary); floor(v*1e6+0.5)
        # over the exact float->double value is bit-identical everywhere
        """
        SELECT label, i AS dim,
               floor((CAST(s AS DOUBLE) / 1000000.0 / n) * 10000 + 0.5) / 10000 AS centroid
        FROM (
          SELECT label, i,
                 SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS s,
                 COUNT(embedding[i]) AS n
          FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
          GROUP BY label, i
        )
        """
    ),
    # --- §2.K/L late-r5 time-series analytics (K9/K10/L9) ---
    "q_time_weighted_avg": (
        # weighted sum accumulates in DECIMAL (order-free); only the
        # final scalar division runs in double, rounded half-up
        """
        WITH d AS (
          SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
                 COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id)
                          - epoch_us(ts), 0) AS dt
          FROM events
        )
        SELECT user_id, COUNT(*) AS n_obs,
               CAST(SUM(dt) AS BIGINT) AS span_us,
               CASE WHEN SUM(dt) > 0 THEN
                 floor(CAST(SUM(v * CAST(dt AS DECIMAL(20,0))) AS DOUBLE)
                       / CAST(SUM(dt) AS DOUBLE) * 10000 + 0.5) / 10000
               END AS twa_value
        FROM d GROUP BY user_id
        """
    ),
    "q_gap_fill": (
        # obs sorts BEFORE its coincident tick ((ep, is_obs DESC)), so
        # LOCF sees an exact-hit observation while the forward frame
        # (current row ->) sees only strictly-later ones — interp
        # collapses to the observed value at exact hits with no special
        # case; ticks lie inside [first, last] so prev always exists
        """
        WITH obs AS (
          SELECT user_id, epoch_us(ts) AS ep, value AS v
          FROM events
          WHERE value IS NOT NULL
          QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) = 1
        ),
        bounds AS (
          SELECT user_id,
                 CAST(ceil(min(ep) / 21600000000.0) AS BIGINT) * 21600000000 AS t0,
                 CAST(floor(max(ep) / 21600000000.0) AS BIGINT) * 21600000000 AS t1
          FROM obs GROUP BY user_id
        ),
        grid AS (
          SELECT user_id, unnest(generate_series(t0, t1, 21600000000)) AS ep
          FROM bounds WHERE t1 >= t0
        ),
        u AS (
          SELECT user_id, ep, v, 1 AS is_obs FROM obs
          UNION ALL
          SELECT user_id, ep, NULL, 0 FROM grid
        ),
        c AS (
          SELECT user_id, ep, is_obs,
            last_value(v IGNORE NULLS) OVER wback AS locf,
            last_value(CASE WHEN is_obs = 1 THEN ep END IGNORE NULLS)
              OVER wback AS prev_ep,
            first_value(v IGNORE NULLS) OVER wfwd AS next_v,
            first_value(CASE WHEN is_obs = 1 THEN ep END IGNORE NULLS)
              OVER wfwd AS next_ep
          FROM u
          WINDOW
            wback AS (PARTITION BY user_id ORDER BY ep, is_obs DESC
                      ROWS UNBOUNDED PRECEDING),
            wfwd AS (PARTITION BY user_id ORDER BY ep, is_obs DESC
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, make_timestamp(ep) AS tick, locf AS locf_value,
               floor((CASE WHEN next_ep IS NULL THEN locf
                      ELSE locf + (next_v - locf)
                           * (CAST(ep - prev_ep AS DOUBLE)
                              / CAST(next_ep - prev_ep AS DOUBLE)) END)
                     * 10000 + 0.5) / 10000 AS interp_value
        FROM c WHERE is_obs = 0
        """
    ),
    "q_ohlc": (
        """
        WITH e AS (
          SELECT event_type,
                 make_timestamp(CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                                * 86400000000) AS bucket_start,
                 epoch_us(ts) AS ep, event_id, value
          FROM events WHERE value IS NOT NULL
        ),
        r AS (
          SELECT event_type, bucket_start, value,
                 row_number() OVER (PARTITION BY event_type, bucket_start
                                    ORDER BY ep, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bucket_start
                                    ORDER BY ep DESC, event_id DESC) AS rn_d
          FROM e
        )
        SELECT event_type, bucket_start,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n
        FROM r GROUP BY event_type, bucket_start
        """
    ),
    # --- §2.M scale validation (M3) ---
    "q_small_qty_revenue": (
        # M5 / Q17 shape, decorrelated exactly like the Spark plan:
        # per-part avg over the brand-filtered subset in int64
        # micro-units (order-free), threshold compare in double with the
        # identical division order, money in int64 cents.
        """
        WITH fl AS (
          SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#1'
        ),
        st AS (
          SELECT l_partkey,
                 SUM(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)) AS s,
                 COUNT(l_quantity) AS n
          FROM fl GROUP BY l_partkey
        )
        SELECT floor((CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 100.0 / 7.0) * 10000 + 0.5) / 10000 AS avg_yearly
        FROM fl JOIN st USING (l_partkey)
        WHERE l_quantity < 0.2 * (CAST(s AS DOUBLE) / 1000000.0 / n)
        """
    ),
    "q_big_orders": (
        """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        """
    ),
    # --- §2.J contamination score (J37) ---
    "q_contamination_score": (
        # same tokenizer/shingle/benchmark construction as
        # q_decontaminate; DISTINCT within doc mirrors token_shingles'
        # array_distinct
        """
        WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
        ),
        idx AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs WHERE len(toks) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM idx
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0)
        SELECT s.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination
        FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
        GROUP BY s.doc_id
        """
    ),
}


# ---------------------------------------------------------------------------
# Generated oracles — portable-hash dedup/similarity family. Built with
# Python loops because they enumerate hash lanes / bit positions /
# hyperplane literals; each call still yields ONE static ANSI-SQL string,
# assigned into ORACLES below like any hand-written entry.

_M31 = 2_147_483_647
_HEX = "0123456789abcdef"


def _minhash_portable_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    source: str = "documents",
) -> str:
    """Mirror of dedup.minhash_lsh_candidates_portable: md5-derived
    31-bit shingle hash, affine permutations, banded self-join on the
    comma-joined lane strings, estimated Jaccard >= threshold.
    `source` lets a wrapping oracle (q_lsh_eval) point the construction
    at a sampled CTE instead of the full table."""
    rows = num_hashes // bands
    shingle = " || ' ' || ".join(
        "tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(k)
    )
    mins = ",\n                 ".join(
        f"min((h * {2 * i + 1} + {7919 * i + 1}) % {_M31}) AS m{i}"
        for i in range(num_hashes)
    )
    lanes = ",\n                 ".join(
        f"coalesce(m{i}, {_M31}) AS m{i}" for i in range(num_hashes)
    )
    banded = "\n          UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bkey FROM sig".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    eq = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM {source}
        ),
        idx AS (
          SELECT doc_id, tk, unnest(generate_series(1, len(tk) - {k - 1})) AS i
          FROM toks WHERE len(tk) >= {k}
        ),
        sh AS (SELECT DISTINCT doc_id, {shingle} AS s FROM idx),
        h AS (
          SELECT doc_id, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) & {_M31} AS h
          FROM sh
        ),
        m AS (
          SELECT doc_id, {mins}
          FROM h GROUP BY doc_id
        ),
        sig AS (
          SELECT d.doc_id,
                 {lanes}
          FROM {source} d LEFT JOIN m ON d.doc_id = m.doc_id
        ),
        banded AS (
          {banded}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, est_jaccard FROM (
          SELECT doc_a, doc_b,
                 floor((({eq}) / {float(num_hashes)}) * 10000 + 0.5) / 10000 AS est_jaccard
          FROM cand
          JOIN sig sa ON doc_a = sa.doc_id
          JOIN sig sb ON doc_b = sb.doc_id
        ) WHERE est_jaccard >= {threshold}
        """


def _minhash_incremental_oracle(
    num_hashes: int = 16, bands: int = 4, k: int = 3, threshold: float = 0.5
) -> str:
    """Mirror of dedup.minhash_dedup_incremental over the odd/even
    doc_id split: same portable signature construction as
    _minhash_portable_oracle, banded NEW x CORPUS join (never
    corpus x corpus), survivors = odd ids with no corpus collision at
    est Jaccard >= threshold."""
    rows = num_hashes // bands
    shingle = " || ' ' || ".join(
        "tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(k)
    )
    mins = ",\n                 ".join(
        f"min((h * {2 * i + 1} + {7919 * i + 1}) % {_M31}) AS m{i}"
        for i in range(num_hashes)
    )
    lanes = ",\n                 ".join(
        f"coalesce(m{i}, {_M31}) AS m{i}" for i in range(num_hashes)
    )
    banded = "\n          UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bkey FROM sig".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    eq = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents
        ),
        idx AS (
          SELECT doc_id, tk, unnest(generate_series(1, len(tk) - {k - 1})) AS i
          FROM toks WHERE len(tk) >= {k}
        ),
        sh AS (SELECT DISTINCT doc_id, {shingle} AS s FROM idx),
        h AS (
          SELECT doc_id, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) & {_M31} AS h
          FROM sh
        ),
        m AS (
          SELECT doc_id, {mins}
          FROM h GROUP BY doc_id
        ),
        sig AS (
          SELECT d.doc_id,
                 {lanes}
          FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        ),
        banded AS (
          {banded}
        ),
        dup AS (
          SELECT DISTINCT n.doc_id FROM (
            SELECT DISTINCT a.doc_id, b.doc_id AS cid
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bkey = b.bkey
            WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          ) n
          JOIN sig sa ON n.doc_id = sa.doc_id
          JOIN sig sb ON n.cid = sb.doc_id
          WHERE floor((({eq}) / {float(num_hashes)}) * 10000 + 0.5) / 10000
                >= {threshold}
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 2 = 1
          AND doc_id NOT IN (SELECT doc_id FROM dup)
        """


def _image_ahash_oracle() -> str:
    """Mirror of multimodal.image_ahash over the fake decode: 64 4-bit
    pixels from sha256 hex, bit set iff pixel > grid mean (mean = s/64
    is exact in binary — 64 is a power of two), MSB-first hex string."""
    pix = ", ".join(
        f"strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1 AS p{i}" for i in range(64)
    )
    mean = "(" + " + ".join(f"p{i}" for i in range(64)) + ") / 64.0"
    chars = ",\n               ".join(
        f"substr('{_HEX}', ("
        + " + ".join(
            f"(CASE WHEN p{4 * c + j} > m THEN {8 >> j} ELSE 0 END)" for j in range(4)
        )
        + ") + 1, 1)"
        for c in range(16)
    )
    return f"""
        WITH h AS (SELECT doc_id, sha256(text) AS h FROM documents),
        p AS (SELECT doc_id, {pix} FROM h),
        pm AS (SELECT *, {mean} AS m FROM p)
        SELECT doc_id, concat({chars}) AS ahash_hex FROM pm
        """


def _simhash_portable_oracle() -> str:
    """Mirror of dedup.simhash_hex_portable: token md5 digits -> 64 bit
    votes -> majority bits -> 16-char hex string. Empty docs (no token
    rows) get all -1 votes via LEFT JOIN + coalesce."""
    digit_cols = ",\n                 ".join(
        f"strpos('{_HEX}', substr(h, {p + 1}, 1)) - 1 AS d{p}" for p in range(16)
    )
    vote_cols = ",\n                 ".join(
        f"sum(CASE WHEN (d{p} & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS v{p}_{b}"
        for p in range(16)
        for b in range(4)
    )
    chars = ",\n               ".join(
        f"substr('{_HEX}', ("
        + " + ".join(
            f"(CASE WHEN coalesce(v{p}_{b}, -1) > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(4)
        )
        + ") + 1, 1)"
        for p in range(16)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
          FROM documents
        ),
        d AS (
          SELECT doc_id, {digit_cols}
          FROM (SELECT doc_id, md5(t) AS h FROM toks)
        ),
        v AS (
          SELECT doc_id, {vote_cols}
          FROM d GROUP BY doc_id
        )
        SELECT doc.doc_id, concat({chars}) AS simhash_hex
        FROM documents doc LEFT JOIN v ON doc.doc_id = v.doc_id
        """


def _planes_sql(dim: int, num_planes: int) -> str:
    """The hyperplane literal arrays as a one-row CTE body — the SAME
    splitmix64-derived planes as similarity.lsh_signature (imported so
    they can never drift)."""
    from azure_iot_realtime_data_pipeline_spark.operators.similarity import _hyperplane

    return ",\n             ".join(
        "[" + ", ".join(repr(v) for v in _hyperplane(dim, p)) + f"]::DOUBLE[] AS p{p}"
        for p in range(num_planes)
    )


def _sig_sql(vec: str, num_planes: int, offset: int = 0) -> str:
    """Packed hyperplane signature of `vec` — mirror of
    similarity.lsh_signature's sequential-f64 projections. `offset`
    selects the plane family (table t of an OR-amplified index uses
    offset t*num_planes), mirroring lsh_signature's plane_offset."""
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip({vec}, p{offset + p}), "
        f"x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    )


def _cosine_sql(a: str, b: str) -> str:
    """Rounded cosine — mirror of similarity.cosine + round_half_up."""
    return (
        "floor(("
        f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
        ") * 10000 + 0.5) / 10000"
    )


def _lsh_topk_oracle(dim: int = 64, num_planes: int = 4, k: int = 10) -> str:
    """Mirror of similarity.lsh_topk: the hyperplane signatures are pure
    float arithmetic over deterministic literals, so the bucket join and
    exact in-bucket cosine are fully oracle-able."""
    plane_arrays = _planes_sql(dim, num_planes)

    def sig(vec: str) -> str:
        return _sig_sql(vec, num_planes)

    cosine = _cosine_sql("qv", "cv")
    return f"""
        WITH planes AS (
          SELECT {plane_arrays}
        ),
        qsig AS (
          SELECT vec_id AS query_id, embedding AS qv, {sig("embedding")} AS sig
          FROM embeddings, planes WHERE vec_id < 5
        ),
        csig AS (
          SELECT vec_id AS cand_id, embedding AS cv, {sig("embedding")} AS sig
          FROM embeddings, planes
        ),
        pairs AS (
          SELECT query_id, cand_id, {cosine} AS cosine
          FROM qsig JOIN csig USING (sig)
          WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
          FROM pairs
        ) WHERE rn <= {k}
        """


def _embed_dedup_lsh_oracle(
    dim: int = 64, num_planes: int = 4, threshold: float = 0.3
) -> str:
    """Mirror of dedup.embedding_near_dup(num_planes>0) — the J5 scale
    path: hyperplane-bucket equi-join, exact rounded cosine only within
    colliding buckets, threshold filter."""
    plane_arrays = _planes_sql(dim, num_planes)
    return f"""
        WITH planes AS (
          SELECT {plane_arrays}
        ),
        s AS (
          SELECT vec_id, embedding, {_sig_sql("embedding", num_planes)} AS sig
          FROM embeddings, planes
        )
        SELECT id_a, id_b, cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 {_cosine_sql("a.embedding", "b.embedding")} AS cosine
          FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
        ) WHERE cosine >= {threshold}
        """


def _kmv_distinct_oracle(k: int = 64) -> str:
    """Mirror of sketches.kmv_distinct: md5-derived 32-bit hash,
    per-group hash-dedup, rank window keeps the k smallest, exact count
    under k else (k-1)*2^32/kth — integer-exact until one f64 division
    rounded half-up, so the estimate hash-matches bit-for-bit."""
    est = sql_round_half_up(f"{float(k - 1)} * {float(2**32)} / kth")
    return f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS hv
          FROM events WHERE user_id IS NOT NULL
        ),
        kept AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          FROM h
        ),
        agg AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept, max(hv) AS kth
          FROM kept WHERE rn <= {k} GROUP BY event_type
        )
        SELECT event_type, n_kept,
               CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                    ELSE {est} END AS distinct_est
        FROM agg
        """


def _lsh_topk_multiprobe_oracle(
    dim: int = 64,
    num_planes: int = 4,
    n_tables: int = 2,
    hamming: int = 1,
    k: int = 10,
) -> str:
    """Mirror of similarity.lsh_topk_multiprobe: n_tables independent
    plane families (table t uses planes t*num_planes..), each query
    probing every bucket within `hamming` bit flips per table, pairs
    deduplicated before the exact cosine — identical plan in SQL."""
    from azure_iot_realtime_data_pipeline_spark.operators.similarity import (
        _probe_offsets,
    )

    plane_arrays = _planes_sql(dim, n_tables * num_planes)
    masks = _probe_offsets(num_planes, hamming)
    qsig_cols = ", ".join(
        f"{_sig_sql('embedding', num_planes, offset=t * num_planes)} AS sig{t}"
        for t in range(n_tables)
    )
    qprobe_arms = "\n          UNION ALL\n          ".join(
        f"SELECT query_id, qv, {t} AS t, "
        f"unnest([{', '.join(f'xor(sig{t}, {m})' for m in masks)}]) AS sig FROM qsig"
        for t in range(n_tables)
    )
    csig_arms = "\n          UNION ALL\n          ".join(
        f"SELECT vec_id AS cand_id, embedding AS cv, {t} AS t, "
        f"{_sig_sql('embedding', num_planes, offset=t * num_planes)} AS sig "
        f"FROM embeddings, planes"
        for t in range(n_tables)
    )
    cosine = _cosine_sql("qv", "cv")
    return f"""
        WITH planes AS (
          SELECT {plane_arrays}
        ),
        qsig AS (
          SELECT vec_id AS query_id, embedding AS qv, {qsig_cols}
          FROM embeddings, planes WHERE vec_id < 5
        ),
        qprobe AS (
          {qprobe_arms}
        ),
        csig AS (
          {csig_arms}
        ),
        pairs AS (
          SELECT DISTINCT ON (query_id, cand_id) query_id, cand_id, qv, cv
          FROM qprobe JOIN csig USING (t, sig)
          WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
          SELECT query_id, cand_id, {cosine} AS cosine,
                 row_number() OVER (PARTITION BY query_id ORDER BY {cosine} DESC, cand_id) AS rn
          FROM pairs
        ) WHERE rn <= {k}
        """


ORACLES["q_canonical_docs"] = f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 50
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM docs WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM idx
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM prs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ),
    scored AS (
      SELECT doc_id,
        floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                    / length(text) END)
            + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                    / len(toks) END)) * 10000 + 0.5) / 10000 AS quality
      FROM docs
    )
    SELECT doc_id, cluster_id, quality, rn = 1 AS keep FROM (
      SELECT c.doc_id, c.cluster_id, s.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY s.quality DESC, c.doc_id) AS rn
      FROM clusters c JOIN scored s USING (doc_id)
    )
    """
ORACLES["q_cube_agg"] = """
    SELECT lang, source,
           CAST(GROUPING(lang, source) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY CUBE (lang, source)
    """
def _semantic_dedup_oracle(n_cells: int = 16, tau: float = 0.3) -> str:
    """Mirror of dedup.semantic_dedup with deterministic lowest-id
    centroids: the `assigned` CTE is the same argmin-cell construction
    as the q_ivf_topk oracle; survivors are vectors with no smaller-id
    in-cell neighbor at rounded cosine >= tau."""
    assign_cos = _cosine_sql("cv", "cent_vec")
    pair_cos = _cosine_sql("a.cv", "b.cv")
    return f"""
        WITH cands AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
        cents AS (
          SELECT vec_id AS cent_id, embedding AS cent_vec
          FROM embeddings ORDER BY vec_id LIMIT {n_cells}
        ),
        assigned AS (
          SELECT cand_id, cv, cent_id AS cell_id FROM (
            SELECT cands.cand_id, cands.cv, cents.cent_id,
              row_number() OVER (PARTITION BY cands.cand_id
                                 ORDER BY {assign_cos} DESC, cent_id) AS rn
            FROM cands, cents
          ) WHERE rn = 1
        ),
        dropped AS (
          SELECT DISTINCT b.cand_id
          FROM assigned a JOIN assigned b
            ON a.cell_id = b.cell_id AND a.cand_id < b.cand_id
          WHERE {pair_cos} >= {tau}
        )
        SELECT cand_id AS vec_id, cell_id FROM assigned
        WHERE cand_id NOT IN (SELECT cand_id FROM dropped)
        """


ORACLES["q_semantic_dedup"] = _semantic_dedup_oracle()
ORACLES["q_image_ahash"] = _image_ahash_oracle()

# L11 ordered funnel: stage k's first event strictly after stage k-1's
ORACLES["q_funnel"] = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t
      GROUP BY e.user_id
    )
    SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM s3
    """

# J45 SymSpell fuzzy pairs: same variant construction (index 0 = the
# original string, index i deletes char i), levenshtein verify
ORACLES["q_fuzzy_pairs"] = """
    WITH v AS (
      SELECT c_custkey AS id, c_name AS s,
             unnest(list_transform(generate_series(0, length(c_name)),
               i -> CASE WHEN i = 0 THEN c_name
                    ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END)) AS var
      FROM customer
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS INTEGER) AS distance
    FROM cand WHERE levenshtein(sa, sb) <= 1
    """

# K12 staleness-bounded as-of: DuckDB ASOF JOIN + age gate
ORACLES["q_asof_tolerance"] = """
    WITH build AS (
      SELECT user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) = 1
    ),
    probe AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.event_id, p.user_id, p.ts,
             b.purchase_value,
             epoch_us(p.ts) - epoch_us(b.ts) AS age_us
      FROM probe p
      ASOF LEFT JOIN build b ON p.user_id = b.user_id AND p.ts >= b.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN age_us <= 86400000000 THEN purchase_value
           END AS asof_purchase_value,
           age_us AS asof_age_us
    FROM m
    """

# L14 z-score: decimal-exact moments, population stddev, scalar double
# math in the operator's exact expression order
ORACLES["q_zscore"] = """
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS s,
             SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS ss
      FROM events GROUP BY event_type
    ),
    cuts AS (
      SELECT event_type,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CASE WHEN CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                  THEN sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             END AS sd
      FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           floor((e.value - c.m) / c.sd * 10000 + 0.5) / 10000 AS zscore
    FROM events e JOIN cuts c USING (event_type)
    """

# L13 rolling 7-day distinct actives (windows past the last observed
# day dropped — no partial-future rows)
ORACLES["q_rolling_active"] = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d
      FROM events
    ),
    fan AS (
      SELECT DISTINCT user_id, d + k AS day
      FROM ud CROSS JOIN generate_series(0, 6) AS g(k)
      WHERE d + k <= (SELECT max(d) FROM ud)
    )
    SELECT day, COUNT(*) AS n_active FROM fan GROUP BY day
    """

# L12 cohort retention over epoch-week indices
ORACLES["q_retention"] = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS w
      FROM events
    ),
    cohort AS (SELECT user_id, min(w) AS c FROM uw GROUP BY user_id)
    SELECT c AS cohort_week, w - c AS week_offset, COUNT(*) AS n_users
    FROM uw JOIN cohort USING (user_id)
    GROUP BY cohort_week, week_offset
    """

# M4 EXISTS shape (Q4 analog): one order counted once regardless of how
# many lines qualify
ORACLES["q_priority_semi"] = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    """
ORACLES["q_dedup_incremental"] = _minhash_incremental_oracle()

# K11 rate of change: counter-reset convention (decrease -> delta is
# the raw new value); NULL pv falls through CASE to the raw value but
# the dt>0 gate nulls the first row anyway — identical in the operator
ORACLES["q_rate_of_change"] = """
    SELECT event_id, user_id, ts,
           CASE WHEN dt > 0 THEN
             floor((CASE WHEN value >= pv THEN value - pv ELSE value END)
                   / (CAST(dt AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000
           END AS rate_per_sec
    FROM (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER w AS pv,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    """

# L10 winsorize: exact rank-selection thresholds (same ceil(q*n) rank
# arithmetic as exact_percentiles — the q*n double product is computed
# identically in both engines) pivoted per group, then a map-side clamp
ORACLES["q_winsorize"] = """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    cuts AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                 THEN value END) AS lo,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                 THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           least(greatest(e.value, c.lo), c.hi) AS clipped
    FROM events e JOIN cuts c USING (event_type)
    """

# J43 unigram-LM scoring: ln rounded to 6dp micro-units BEFORE the
# per-doc sum (order-free), vocabulary truncation tie-broken on the
# token string — both exactly as the operator
ORACLES["q_lm_score"] = """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
      FROM documents
    ),
    counts AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
    vocab AS (
      SELECT t,
             CAST(floor(ln(CAST(c AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT) AS lp
      FROM counts, tot
      ORDER BY c DESC, t ASC LIMIT 1000
    ),
    scored AS (
      SELECT doc_id,
             coalesce(v.lp,
               (SELECT CAST(floor(ln(1.0 / n) * 1000000 + 0.5) AS BIGINT) FROM tot)
             ) AS lp
      FROM tok LEFT JOIN vocab v ON tok.t = v.t
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(lp) AS BIGINT) AS s
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           floor(CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1000000.0
                 * 10000 + 0.5) / 10000 AS logprob_mean
    FROM agg
    """

# end-to-end telemetry chain: F3 combined policy -> L9 daily candles on
# the adjusted event time (clamp ties arbitrated by event_id, same as
# the operator's struct ordering)
ORACLES["q_device_daily"] = """
    WITH adj AS (
      SELECT event_id, user_id, value, adjusted_ts FROM (
        SELECT event_id, user_id, value, ts,
               max(ts) OVER w AS adjusted_ts,
               max(epoch_us(ts)) OVER w AS hwm_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ) WHERE epoch_us(ts) >= hwm_us - 60000000
    ),
    e AS (
      SELECT user_id,
             make_timestamp(CAST(floor(epoch_us(adjusted_ts) / 86400000000)
                                 AS BIGINT) * 86400000000) AS bucket_start,
             epoch_us(adjusted_ts) AS ep, event_id, value
      FROM adj WHERE value IS NOT NULL
    ),
    r AS (
      SELECT user_id, bucket_start, value,
             row_number() OVER (PARTITION BY user_id, bucket_start
                                ORDER BY ep, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bucket_start
                                ORDER BY ep DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT user_id, bucket_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM r GROUP BY user_id, bucket_start
    """

# J40 per-group quality-quantile filter: the cut is the exact
# 0.25-quantile quality VALUE per source (rank selection); ties at the
# cut all survive
ORACLES["q_quality_filter"] = f"""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, source,
        floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                    / length(text) END)
            + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                    / len(toks) END)) * 10000 + 0.5) / 10000 AS quality
      FROM t
    ),
    r AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM q
    ),
    cuts AS (
      SELECT source, quality AS cut FROM r
      WHERE rn = greatest(CAST(ceil(n * 0.25) AS BIGINT), 1)
    )
    SELECT q.doc_id, q.source, q.quality
    FROM q JOIN cuts USING (source)
    WHERE q.quality >= cuts.cut
    """

# J41 greedy token-budget selection: prefix of the (quality DESC, id)
# order while the running token sum stays within budget
ORACLES["q_token_budget"] = f"""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
        floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                    / length(text) END)
            + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                    / len(toks) END)) * 10000 + 0.5) / 10000 AS _q
      FROM t
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY _q DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q
    )
    SELECT source, doc_id, n_tokens, cum_tokens FROM c
    WHERE cum_tokens <= 1000
    """

# J39 weighted fixed-size sample: quality weight (the q_quality_score
# expression verbatim — already rounded to 4dp, so w is bit-identical
# across engines), ES key ln(u)/w from the uniform_hash integer draw
# shifted to (0,1], rank (key DESC, id DESC) exactly as top_n_per_group
ORACLES["q_weighted_sample"] = f"""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, source,
        floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                    / length(text) END)
            + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN})) AS DOUBLE)
                    / len(toks) END)) * 10000 + 0.5) / 10000 AS w
      FROM t
    ),
    keyed AS (
      SELECT doc_id, source,
        floor(ln((CAST(((((doc_id % 2147483647) * 2654435761 + 12345)
                         % 2147483647) + 2147483647) % 2147483647 AS DOUBLE)
                  + 1) / 2147483648.0)
              / w * 10000 + 0.5) / 10000 AS es_key
      FROM q WHERE w > 0
    )
    SELECT source,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY es_key DESC, doc_id DESC) AS INTEGER) AS rank,
           doc_id, es_key
    FROM keyed
    QUALIFY rank <= 20
    """
ORACLES["q_kmv_distinct"] = _kmv_distinct_oracle()
ORACLES["q_lsh_topk_multiprobe"] = _lsh_topk_multiprobe_oracle()
def _dedup_pipeline_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    est_threshold: float = 0.3,
    verify_threshold: float = 0.5,
) -> str:
    """Mirror of dedup.dedup_verified_pairs (J52 chain #6): the portable
    candidate construction wrapped as a CTE, then exact shingle-Jaccard
    verification joined over the candidate pairs only."""
    inner = _minhash_portable_oracle(num_hashes, bands, k, est_threshold)
    return f"""
        WITH cand2 AS ({inner}),
        toks2 AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents
        ),
        idx2 AS (
          SELECT doc_id, tk,
                 unnest(generate_series(1, len(tk) - {k - 1})) AS i
          FROM toks2 WHERE len(tk) >= {k}
        ),
        sh2 AS (
          SELECT DISTINCT doc_id,
                 {" || ' ' || ".join("tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(k))} AS s
          FROM idx2
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, c.est_jaccard, COUNT(*) AS n_common
          FROM cand2 c
          JOIN sh2 a ON a.doc_id = c.doc_a
          JOIN sh2 b ON b.doc_id = c.doc_b AND a.s = b.s
          GROUP BY c.doc_a, c.doc_b, c.est_jaccard
        )
        SELECT i.doc_a, i.doc_b, i.est_jaccard,
               floor(CAST(i.n_common AS DOUBLE)
                     / CAST(sa.n + sb.n - i.n_common AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE floor(CAST(i.n_common AS DOUBLE)
                    / CAST(sa.n + sb.n - i.n_common AS DOUBLE)
                    * 10000 + 0.5) / 10000 >= {verify_threshold}
        """


ORACLES["q_minhash_lsh_portable"] = _minhash_portable_oracle()
ORACLES["q_dedup_pipeline"] = _dedup_pipeline_oracle()
ORACLES["q_simhash_portable"] = _simhash_portable_oracle()
ORACLES["q_lsh_topk"] = _lsh_topk_oracle()
ORACLES["q_embed_dedup_lsh"] = _embed_dedup_lsh_oracle()

# K13 EWMA: list_reduce seeds the accumulator with the FIRST ordered
# element, exactly matching the operator's NULL-init fold; both engines
# run the identical 0.3*x + 0.7*acc double ops in the same order, so
# only the final level needs the portable 4dp rounding.
ORACLES["q_ewma"] = """
    SELECT user_id,
           COUNT(*) AS n_events,
           floor(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.3*x + 0.7*acc) * 10000 + 0.5)
             / 10000 AS ewma
    FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY user_id
    """

# K18 Holt: the accumulator is a DOUBLE[] pair [level, trend] — NOT a
# struct, because DuckDB 1.0 evaluates struct-fold fields sequentially
# against a mutated accumulator (measured: {'s': acc.s+x.s, 'p':
# acc.p+acc.s} folded over [1,2,3] returns p=7, not 4). The lambda
# repeats the l_new subtree textually, exactly like the Spark fold, so
# both engines run identical IEEE double ops in identical order.
ORACLES["q_holt"] = """
    WITH folded AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             list_reduce(
               list_transform(list(value ORDER BY ts, event_id),
                              v -> [CAST(v AS DOUBLE), 0.0::DOUBLE]),
               (acc, x) -> [0.3::DOUBLE*x[1] + 0.7::DOUBLE*(acc[1]+acc[2]),
                            0.2::DOUBLE*((0.3::DOUBLE*x[1]
                                          + 0.7::DOUBLE*(acc[1]+acc[2]))
                                         - acc[1])
                              + 0.8::DOUBLE*acc[2]]
             ) AS st
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY user_id
    )
    SELECT user_id, n_events,
           floor(st[1] * 10000 + 0.5) / 10000 AS level,
           floor(st[2] * 10000 + 0.5) / 10000 AS trend,
           floor((st[1] + st[2]) * 10000 + 0.5) / 10000 AS forecast
    FROM folded
    """

# L31 seasonal baseline: the stratum mean is a window aggregate over
# DECIMAL(18,2) sums (order-independent), divided in double only at the
# end — same recipe as L14 z-score.
ORACLES["q_seasonal_baseline"] = """
    WITH v AS (
      SELECT event_id, user_id, CAST(hour(ts) AS INTEGER) AS hr, value
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    s AS (
      SELECT *,
             SUM(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY user_id, hr) AS sm,
             COUNT(*) OVER (PARTITION BY user_id, hr) AS n
      FROM v
    )
    SELECT event_id, user_id, hr, value,
           floor((CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) * 10000 + 0.5)
             / 10000 AS baseline,
           floor((value - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS deviation
    FROM s
    """

# J54 bigram LM: pairs built by zipping each token list with its own
# tail (list_zip pads with NULL -> the final sentinel pair drops); the
# denominator is fixed over ALL continuations before min_count prunes.
ORACLES["q_bigram_lm"] = """
    WITH toks AS (
      SELECT list_filter(str_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    z AS (
      SELECT unnest(list_zip(tk, tk[2:])) AS p FROM toks
    ),
    pairs AS (
      SELECT p[1] AS w1, p[2] AS w2 FROM z WHERE p[2] IS NOT NULL
    ),
    counts AS (
      SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, n,
           floor(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS prob
    FROM counts
    QUALIFY n >= 5
    """

# J50 vocab coverage: rank over the aggregated vocab table, coverage
# mass at each cutoff over the one-row corpus total; SUMs cast BIGINT
# (DuckDB widens to HUGEINT).
ORACLES["q_vocab_coverage"] = """
    WITH toks AS (
      SELECT unnest(list_filter(str_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
      FROM counts
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT CAST(c.cutoff AS BIGINT) AS cutoff,
           COUNT(*) AS vocab_size,
           CAST(SUM(r.n) AS BIGINT) AS covered,
           floor(CAST(SUM(r.n) AS DOUBLE) / CAST(ANY_VALUE(t.total) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS coverage
    FROM (VALUES (100), (1000), (10000)) c(cutoff), ranked r, tot t
    WHERE r.rank <= c.cutoff
    GROUP BY c.cutoff
    """

# M8 Q15 shape: per-supplier revenue in int64 micro-units (order-free),
# argmax by join against the one-row max.
ORACLES["q_top_supplier"] = """
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(p.rev AS DOUBLE) / 1000000 AS total_revenue
    FROM per_supp p
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    WHERE p.rev = (SELECT MAX(rev) FROM per_supp)
    """

# L32 orphans: six FK edges, NULL FKs are not orphans; counts as BIGINT.
ORACLES["q_orphans"] = """
    SELECT 'lineitem.l_orderkey->orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
              ON l.l_partkey = p.p_partkey
            WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
              ON l.l_suppkey = s.s_suppkey
            WHERE l.l_suppkey IS NOT NULL AND s.s_suppkey IS NULL)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
              ON c.c_nationkey = n.n_nationkey
            WHERE c.c_nationkey IS NOT NULL AND n.n_nationkey IS NULL)
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
              ON s.s_nationkey = n.n_nationkey
            WHERE s.s_nationkey IS NOT NULL AND n.n_nationkey IS NULL)
    """

# L23 chi-square cells: totals aggregate the tiny cell table; expected
# and contribution use the identical double expression tree as Spark.
ORACLES["q_chi_square"] = """
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS observed
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY source, lang
    ),
    rt AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS r
           FROM cells GROUP BY source),
    ct AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS c
           FROM cells GROUP BY lang),
    g AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
    SELECT cells.source, cells.lang, observed,
           floor(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS expected,
           floor((CAST(observed AS DOUBLE)
                  - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(observed AS DOUBLE)
                    - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS contribution
    FROM cells
    JOIN rt ON cells.source = rt.source
    JOIN ct ON cells.lang = ct.lang
    CROSS JOIN g
    """

# L24 last-touch attribution: rows-frame carry with tiebreak order;
# the lookback compares the carried antecedent epoch afterwards.
ORACLES["q_attribution"] = """
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN struct_pack(t := epoch_us(ts),
                                              ty := event_type)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev
      FROM events
    )
    SELECT CASE WHEN prev IS NOT NULL
                 AND prev.t >= t - 86400000000
                THEN prev.ty ELSE '(none)' END AS attributed_type,
           COUNT(*) AS n_conversions
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """

# L25 metric correlation: daily means frozen into half-up micro-units,
# five DECIMAL(38,0) integer moments, the L17 closed form in double.
ORACLES["q_metric_corr"] = """
    WITH daily AS (
      SELECT event_type AS ty, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5)
                  AS DECIMAL(19,0)) AS m
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY event_type, day
    ),
    moments AS (
      SELECT a.ty AS type_a, b.ty AS type_b,
             COUNT(*) AS n_days,
             SUM(a.m) AS sa, SUM(b.m) AS sb,
             SUM(a.m * b.m) AS sab,
             SUM(a.m * a.m) AS saa,
             SUM(b.m * b.m) AS sbb
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.ty < b.ty
      GROUP BY a.ty, b.ty
    )
    SELECT type_a, type_b, n_days,
           CASE WHEN CAST(CAST(n_days AS DECIMAL(38,0)) * saa - sa * sa
                          AS DOUBLE) <> 0.0
                 AND CAST(CAST(n_days AS DECIMAL(38,0)) * sbb - sb * sb
                          AS DOUBLE) <> 0.0
                THEN floor(CAST(CAST(n_days AS DECIMAL(38,0)) * sab - sa * sb
                                AS DOUBLE)
                           / sqrt(CAST(CAST(n_days AS DECIMAL(38,0)) * saa
                                       - sa * sa AS DOUBLE)
                                  * CAST(CAST(n_days AS DECIMAL(38,0)) * sbb
                                         - sb * sb AS DOUBLE))
                           * 10000 + 0.5) / 10000
           END AS corr
    FROM moments
    """

# L26 lag-1 autocorrelation: consecutive non-NULL pairs, the same
# DECIMAL(38,0) micro-unit moments and closed form as L17/L25.
ORACLES["q_autocorr"] = """
    WITH clean AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                  AS DECIMAL(19,0)) AS x
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    pairs AS (
      SELECT user_id, x,
             lead(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM clean
    ),
    m AS (
      SELECT user_id, COUNT(*) AS n_pairs,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM pairs WHERE y IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_pairs,
           CASE WHEN CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE) <> 0.0
                 AND CAST(CAST(n_pairs AS DECIMAL(38,0)) * syy - sy * sy
                          AS DOUBLE) <> 0.0
                THEN floor(CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxy - sx * sy
                                AS DOUBLE)
                           / sqrt(CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxx
                                       - sx * sx AS DOUBLE)
                                  * CAST(CAST(n_pairs AS DECIMAL(38,0)) * syy
                                         - sy * sy AS DOUBLE))
                           * 10000 + 0.5) / 10000
           END AS acf1
    FROM m
    """

# K20 SCD2: change rows via null-safe lag compare, intervals closed by
# lead over the change rows only; DuckDB's IS NOT DISTINCT FROM is the
# null-safe equality.
ORACLES["q_scd2"] = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type AS attr,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT * FROM tagged
      WHERE rn = 1 OR attr IS DISTINCT FROM prev
    )
    SELECT user_id, attr,
           CAST(row_number() OVER wc AS INTEGER) AS version,
           ts AS valid_from,
           lead(ts) OVER wc AS valid_to,
           lead(ts) OVER wc IS NULL AS is_current
    FROM changes
    WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id)
    """

# L27 top journeys: the K1 session CTE, DuckDB's ordered string_agg
# standing in for the array_sort(collect_list) trick.
ORACLES["q_top_journeys"] = """
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    paths AS (
      SELECT string_agg(event_type, '>'
                        ORDER BY epoch_us(ts), event_id) AS journey
      FROM sess GROUP BY user_id, session_id
    )
    SELECT journey, COUNT(*) AS n_sessions
    FROM paths GROUP BY journey
    ORDER BY n_sessions DESC, journey ASC
    LIMIT 20
    """

# L28 impute: the L15 lower-median rank selection over PRESENT rows
# only, left-joined back so all-missing groups stay NULL.
ORACLES["q_impute"] = """
    WITH miss AS (
      SELECT event_id, event_type, value,
             (value IS NULL OR isnan(value)) AS was_imputed
      FROM events
    ),
    r1 AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM miss WHERE NOT was_imputed
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                 THEN value END) AS m
      FROM r1 GROUP BY event_type
    )
    SELECT miss.event_id, miss.event_type, miss.value,
           CASE WHEN miss.was_imputed THEN med.m
                ELSE miss.value END AS imputed_value,
           miss.was_imputed
    FROM miss LEFT JOIN med USING (event_type)
    """

# K21 availability: whole gaps above the threshold count as downtime;
# integer-microsecond sums, doubles only at the final division.
ORACLES["q_availability"] = """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS gap
      FROM events WHERE ts IS NOT NULL
    ),
    per AS (
      SELECT user_id, COUNT(*) AS n_events,
             MAX(t) - MIN(t) AS span,
             CAST(COALESCE(SUM(CASE WHEN gap > 21600000000
                                    THEN gap ELSE 0 END), 0) AS BIGINT)
               AS down
      FROM g GROUP BY user_id
    )
    SELECT user_id, n_events,
           floor(CAST(span AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000
             AS span_seconds,
           floor(CAST(down AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000
             AS downtime_seconds,
           CASE WHEN span > 0
                THEN floor((1.0 - CAST(down AS DOUBLE) / CAST(span AS DOUBLE))
                           * 1000000 + 0.5) / 1000000
           END AS availability
    FROM per
    """

# L29 incremental rollup: the oracle aggregates the FULL table in one
# pass — equality with the Spark side's merged half-states proves the
# associative merge law.
ORACLES["q_rollup_incremental"] = """
    SELECT user_id,
           epoch_us(ts) // 86400000000 AS day,
           COUNT(*) AS n,
           floor(CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000
             AS sum_value,
           floor(CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1000000 / COUNT(*) * 10000 + 0.5) / 10000
             AS avg_value,
           floor(MIN(value) * 10000 + 0.5) / 10000 AS min_value,
           floor(MAX(value) * 10000 + 0.5) / 10000 AS max_value
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY user_id, day
    """

# L30 trending: integer bucket arithmetic, lag over the aggregated
# (type, bucket) table; growth NULL on each type's first bucket.
ORACLES["q_trending"] = """
    WITH counts AS (
      SELECT event_type AS type,
             (epoch_us(ts) // 3600000000) * 3600000000 AS b,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT type, make_timestamp(b) AS bucket_start, n,
           lag(n) OVER w AS prev_n,
           floor(CAST(n AS DOUBLE) / CAST(lag(n) OVER w AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS growth
    FROM counts
    WINDOW w AS (PARTITION BY type ORDER BY b)
    """

# J53 corpus prep chain: dedup carries min(text) (identical within an
# md5 group), then lang/quality/tokens run on the deduped rows only.
ORACLES["q_corpus_prep"] = f"""
    WITH dd AS (
      SELECT min(doc_id) AS doc_id, min(text) AS text
      FROM documents GROUP BY md5(text)
    ),
    t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM dd
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g'))
                              AS DOUBLE) / length(text) END)
                 + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN}))
                              AS DOUBLE) / len(toks) END))
                   * 10000 + 0.5) / 10000 AS quality,
             CASE WHEN len(list_filter(toks, t -> t IN {STOP_IN})) > 0
                  THEN 'en' ELSE 'und' END AS lang
      FROM t
    )
    SELECT doc_id, n_tokens, quality
    FROM scored WHERE lang = 'en' AND quality >= 0.5
    """

# M9 Q2 shape: struct-min argmin with suppkey tie-break; unit cost in
# exact micro-units.
ORACLES["q_cheapest_supplier"] = """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(floor(l_extendedprice / l_quantity * 1000000 + 0.5)
                      AS BIGINT)) AS cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, cost, l_suppkey,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY cost, l_suppkey) AS rn
      FROM offers
    )
    SELECT b.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
           CAST(b.cost AS DOUBLE) / 1000000 AS unit_cost
    FROM best b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    WHERE b.rn = 1
    """

# M10 Q11 shape: per-part revenue vs one-row grand total.
ORACLES["q_important_parts"] = """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS t FROM per_part)
    SELECT l_partkey AS p_partkey,
           CAST(rev AS DOUBLE) / 1000000 AS revenue,
           floor(CAST(rev AS DOUBLE) / CAST(t AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS share
    FROM per_part, tot
    WHERE CAST(rev AS DOUBLE) > 0.001 * CAST(t AS DOUBLE)
    """

# M11 Q22 shape: scalar-avg broadcast filter + NOT EXISTS as anti join;
# balances in exact cents.
ORACLES["q_idle_rich_customers"] = """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_balance
    FROM customer c, avg_bal
    WHERE CAST(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS DOUBLE)
            > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """

# L33 Kaplan-Meier: the [cum_deaths, product] DOUBLE[] fold with the
# seed prepended (list_reduce seeds from the first element — the J11
# fingerprint trick), identical op order to the Spark explicit-init
# fold; struct accumulators are off-limits (the K18 DuckDB bug).
ORACLES["q_survival"] = """
    WITH spans AS (
      SELECT user_id,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    deaths AS (SELECT t, COUNT(*) AS d FROM spans GROUP BY t),
    one AS (
      SELECT list({'t': t, 'd': d} ORDER BY t) AS arr,
             CAST(SUM(d) AS BIGINT) AS n
      FROM deaths
    ),
    idx AS (
      SELECT arr, n, unnest(generate_series(1, len(arr))) AS i FROM one
    ),
    folded AS (
      SELECT arr[i]['t'] AS t_days,
             arr[i]['d'] AS deaths,
             n,
             list_reduce(
               list_prepend([0.0::DOUBLE, 1.0::DOUBLE],
                 list_transform(arr[1:i],
                                x -> [CAST(x.d AS DOUBLE), 0.0::DOUBLE])),
               (acc, x) -> [acc[1] + x[1],
                            acc[2] * (1.0::DOUBLE
                                      - x[1] / (CAST(n AS DOUBLE) - acc[1]))]
             ) AS st
      FROM idx
    )
    SELECT t_days, deaths,
           n - CAST(st[1] AS BIGINT) + deaths AS at_risk,
           floor(st[2] * 1000000 + 0.5) / 1000000 AS survival
    FROM folded
    """

# L34 A/B mean test: per-arm DECIMAL-exact moments, Welch z in the
# identical double op order; population variance.
ORACLES["q_ab_test"] = """
    WITH tagged AS (
      SELECT (user_id % 2 = 1) AS b, CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    row1 AS (
      SELECT COUNT(*) FILTER (NOT b) AS n_a,
             SUM(v) FILTER (NOT b) AS s_a,
             SUM(v*v) FILTER (NOT b) AS ss_a,
             COUNT(*) FILTER (b) AS n_b,
             SUM(v) FILTER (b) AS s_b,
             SUM(v*v) FILTER (b) AS ss_b
      FROM tagged
    ),
    stats AS (
      SELECT n_a, n_b,
             CASE WHEN n_a > 0
                  THEN CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS ma,
             CASE WHEN n_b > 0
                  THEN CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mb,
             greatest(CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)),
                      0.0::DOUBLE) AS va,
             greatest(CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                      - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)),
                      0.0::DOUBLE) AS vb
      FROM row1
    )
    SELECT n_a, n_b,
           floor(ma * 10000 + 0.5) / 10000 AS mean_a,
           floor(mb * 10000 + 0.5) / 10000 AS mean_b,
           floor((mb - ma) * 10000 + 0.5) / 10000 AS diff,
           CASE WHEN sqrt(va / CAST(n_a AS DOUBLE)
                          + vb / CAST(n_b AS DOUBLE)) > 0
                THEN floor((mb - ma)
                           / sqrt(va / CAST(n_a AS DOUBLE)
                                  + vb / CAST(n_b AS DOUBLE))
                           * 10000 + 0.5) / 10000
           END AS z
    FROM stats
    """

# L36 Lorenz: rank + running int64 cents total in (spend, custkey)
# order; shares over the one-row grand totals.
ORACLES["q_lorenz"] = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS spend_cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, spend_cents,
             CAST(row_number() OVER w AS BIGINT) AS rank,
             CAST(SUM(spend_cents) OVER (w ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM spend
      WINDOW w AS (ORDER BY spend_cents, o_custkey)
    ),
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(spend_cents) AS BIGINT) AS t
      FROM spend
    )
    SELECT o_custkey, spend_cents AS value, rank,
           floor(CAST(rank AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS pop_share,
           floor(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS value_share
    FROM ranked, tot
    """

# M12 Q14 shape: numerator and denominator from ONE conditional
# aggregate over the broadcast join; int64 micro-units.
ORACLES["q_promo_share"] = """
    WITH j AS (
      SELECT p.p_type,
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                        * 1000000 + 0.5) AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                  AS BIGINT) AS promo,
             CAST(SUM(rev) AS BIGINT) AS total
      FROM j
    )
    SELECT CAST(promo AS DOUBLE) / 1000000 AS promo_revenue,
           CAST(total AS DOUBLE) / 1000000 AS total_revenue,
           floor(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS promo_share_pct
    FROM agg
    """

# M13 Q19 shape: the OR-of-ANDs disjunction evaluated after the join.
ORACLES["q_brand_size_revenue"] = """
    SELECT COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1000000 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """

# L37 basket lift: distinct items per (user, day) basket, pair counts,
# lift = n_both * n_baskets / (n_a * n_b) — no logs (libm trap).
ORACLES["q_event_lift"] = """
    WITH b AS (
      SELECT DISTINCT user_id,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                  AS BIGINT) AS day,
             event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ),
    pairs AS (
      SELECT x.event_type AS item_a, y.event_type AS item_b,
             COUNT(*) AS n_both
      FROM b x JOIN b y
        ON x.user_id = y.user_id AND x.day = y.day
       AND x.event_type < y.event_type
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type AS t, COUNT(*) AS n FROM b GROUP BY event_type
    ),
    nb AS (
      SELECT COUNT(*) AS n_baskets
      FROM (SELECT DISTINCT user_id, day FROM b)
    )
    SELECT p.item_a, p.item_b, p.n_both,
           ta.n AS n_a, tb.n AS n_b, nb.n_baskets,
           floor(CAST(p.n_both AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
                 / (CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS lift
    FROM pairs p
    JOIN totals ta ON p.item_a = ta.t
    JOIN totals tb ON p.item_b = tb.t
    CROSS JOIN nb
    """

# K22 SCD2 enrich: the K20 history CTE joined back on the validity
# interval; open versions match everything from valid_from on.
ORACLES["q_scd2_enrich"] = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type AS attr,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT * FROM tagged
      WHERE rn = 1 OR attr IS DISTINCT FROM prev
    ),
    dim AS (
      SELECT user_id, attr,
             CAST(row_number() OVER wc AS INTEGER) AS version,
             ts AS valid_from,
             lead(ts) OVER wc AS valid_to
      FROM changes
      WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e.event_id, e.user_id,
           d.attr AS active_type,
           d.version AS active_version
    FROM events e
    LEFT JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """

# L38 snapshot diff: full outer join + null-safe per-column compare
# (IS DISTINCT FROM); unchanged keys drop.
ORACLES["q_snapshot_diff"] = """
    WITH old AS (
      SELECT event_id, event_type, value FROM events
    ),
    new AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 5 = 0 THEN value + 1.0
                  ELSE value END AS value
      FROM events WHERE event_id % 11 <> 0
    ),
    j AS (
      SELECT o.event_id AS ko, n.event_id AS kn,
             o.event_type AS o_ty, o.value AS o_v,
             n.event_type AS n_ty, n.value AS n_v,
             o.present IS NULL AS old_missing,
             n.present IS NULL AS new_missing
      FROM (SELECT *, TRUE AS present FROM old) o
      FULL OUTER JOIN (SELECT *, TRUE AS present FROM new) n
        ON o.event_id = n.event_id
    )
    SELECT CASE WHEN old_missing THEN 'insert'
                WHEN new_missing THEN 'delete'
                WHEN (o_ty IS DISTINCT FROM n_ty)
                  OR (o_v IS DISTINCT FROM n_v) THEN 'update'
           END AS op,
           COALESCE(ko, kn) AS event_id,
           o_ty AS old_event_type, n_ty AS new_event_type,
           o_v AS old_value, n_v AS new_value
    FROM j
    WHERE old_missing OR new_missing
       OR (o_ty IS DISTINCT FROM n_ty) OR (o_v IS DISTINCT FROM n_v)
    """

# L39 reconciliation: EXISTS within the tolerance, both directions,
# per-type rollups full-outer merged.
ORACLES["q_reconcile"] = """
    WITH a AS (SELECT * FROM events WHERE event_id % 2 = 0),
    b AS (SELECT * FROM events WHERE event_id % 2 = 1),
    ma AS (
      SELECT event_type, COUNT(*) AS matched_a
      FROM a WHERE EXISTS (
        SELECT 1 FROM b
        WHERE b.user_id = a.user_id AND b.event_type = a.event_type
          AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000
      )
      GROUP BY event_type
    ),
    mb AS (
      SELECT event_type, COUNT(*) AS matched_b
      FROM b WHERE EXISTS (
        SELECT 1 FROM a
        WHERE a.user_id = b.user_id AND a.event_type = b.event_type
          AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
      )
      GROUP BY event_type
    ),
    ta AS (SELECT event_type, COUNT(*) AS n_a FROM a GROUP BY event_type),
    tb AS (SELECT event_type, COUNT(*) AS n_b FROM b GROUP BY event_type)
    SELECT COALESCE(ta.event_type, tb.event_type) AS group,
           COALESCE(n_a, 0) AS n_a,
           COALESCE(matched_a, 0) AS matched_a,
           COALESCE(n_a, 0) - COALESCE(matched_a, 0) AS unmatched_a,
           COALESCE(n_b, 0) AS n_b,
           COALESCE(matched_b, 0) AS matched_b,
           COALESCE(n_b, 0) - COALESCE(matched_b, 0) AS unmatched_b
    FROM ta
    FULL OUTER JOIN tb ON ta.event_type = tb.event_type
    LEFT JOIN ma ON COALESCE(ta.event_type, tb.event_type) = ma.event_type
    LEFT JOIN mb ON COALESCE(ta.event_type, tb.event_type) = mb.event_type
    """

# M14 Q7 shape: five-table star, cross-nation pairs by year, int64
# micro-unit revenue; year cast INTEGER to match Spark.
ORACLES["q_nation_trade"] = """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1000000 AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, ship_year
    """

# M15 region share: int64 micro-unit revenue per customer nation with
# ratio-to-region (window over the 25-row table) and ratio-to-world.
ORACLES["q_region_share"] = """
    WITH per_nation AS (
      SELECT c.c_nationkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    named AS (
      SELECT r.r_name AS region, n.n_name AS nation, p.rev
      FROM per_nation p
      JOIN nation n ON p.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS world FROM named)
    SELECT region, nation,
           CAST(rev AS DOUBLE) / 1000000 AS revenue,
           floor(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS region_share,
           floor(CAST(rev AS DOUBLE) / CAST(world AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS world_share
    FROM named, tot
    """

# L40 session conversion: the K1 session CTE, entry type via the
# ordered-struct min, conversion as a MAX flag.
ORACLES["q_session_conversion"] = """
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    per AS (
      SELECT user_id, session_id,
             (MIN(struct_pack(t := epoch_us(ts), i := event_id,
                              ty := event_type)))['ty'] AS entry_type,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM sess GROUP BY user_id, session_id
    )
    SELECT entry_type,
           COUNT(*) AS n_sessions,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           floor(CAST(SUM(conv) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
             / 10000 AS conversion_rate
    FROM per GROUP BY entry_type
    """

# L15 MAD: two exact lower-median rank selections (same ceil(0.5*n)
# arithmetic as exact_percentiles); deviations are |x - med| on the
# identical doubles, so the selected values match bit-for-bit.
ORACLES["q_mad"] = """
    WITH v AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    r1 AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                 THEN value END) AS median_value
      FROM r1 GROUP BY event_type
    ),
    r2 AS (
      SELECT v.event_type, abs(v.value - m.median_value) AS adev,
             row_number() OVER (PARTITION BY v.event_type
                                ORDER BY abs(v.value - m.median_value),
                                         v.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY v.event_type) AS n
      FROM v JOIN med m USING (event_type)
    )
    SELECT r2.event_type,
           MAX(m.median_value) AS median_value,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN adev END) AS mad
    FROM r2 JOIN med m ON r2.event_type = m.event_type
    GROUP BY r2.event_type
    """

# J47 inverted index: list_distinct dedups within-doc terms exactly as
# array_distinct; the posting prefix is the 16 smallest doc ids per
# term, comma-joined ascending (BIGINT->VARCHAR casts agree).
ORACLES["q_inverted_index"] = """
    WITH pairs AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(text, ' '),
                                              t -> t <> ''))) AS term
      FROM documents
    ),
    counts AS (
      SELECT term, COUNT(*) AS doc_count FROM pairs GROUP BY term
    ),
    ranked AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM pairs
    ),
    postings AS (
      SELECT term, string_agg(doc_id, ',' ORDER BY doc_id) AS postings
      FROM ranked WHERE rn <= 16 GROUP BY term
    )
    SELECT term, doc_count, postings FROM counts JOIN postings USING (term)
    """

# L16 period-over-period: identical integer bucket + micro-unit sums;
# lag runs over the compacted (type, day) table in both engines, so the
# previous-period row is the previous OBSERVED day.
ORACLES["q_day_over_day"] = """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS b,
             COUNT(*) AS n,
             SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type,
           make_timestamp(b * 86400000000) AS period_start,
           n,
           floor((CAST(s AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000 AS total,
           floor((CAST(lag(s) OVER w AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000
             AS prev_total,
           floor((CAST(s - lag(s) OVER w AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000
             AS delta_total,
           CASE WHEN lag(s) OVER w IS NOT NULL AND lag(s) OVER w <> 0 THEN
             floor((CAST(s - lag(s) OVER w AS DOUBLE)
                    / abs(CAST(lag(s) OVER w AS DOUBLE))) * 10000 + 0.5) / 10000
           END AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY b)
    """

# M6 / Q21 shape: both correlated EXISTS subqueries decorrelated into
# the same two-level aggregation the Spark plan runs.
ORACLES["q_sole_late_supplier"] = """
    WITH ps AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > TIMESTAMP '1998-06-30'
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem GROUP BY 1, 2
    ),
    po AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM ps GROUP BY 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM po JOIN supplier s ON s.s_suppkey = po.late_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s.s_name
    """

# L17 trend: the five moments are exact integers (HUGEINT here,
# DECIMAL(38,0) in Spark) over the identical centered-x/micro-y values;
# one double cast at the closed form, same division/sqrt order, 4dp.
ORACLES["q_trend"] = """
    WITH v AS (
      SELECT event_type, epoch_us(ts) AS t,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    m AS (SELECT event_type, MIN(t) AS t0 FROM v GROUP BY 1),
    c AS (
      SELECT v.event_type,
             CAST(v.t - m.t0 AS HUGEINT) AS x,
             CAST(v.y AS HUGEINT) AS y
      FROM v JOIN m USING (event_type)
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      FROM c GROUP BY 1
    )
    SELECT event_type, n,
           CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) <> 0 THEN
             floor(CAST(n*sxy - sx*sy AS DOUBLE)
                   / CAST(n*sxx - sx*sx AS DOUBLE) * 86400.0 * 10000 + 0.5)
               / 10000
           END AS slope_per_day,
           CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) <> 0
                 AND CAST(n*syy - sy*sy AS DOUBLE) <> 0 THEN
             floor(CAST(n*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                          * CAST(n*syy - sy*sy AS DOUBLE)) * 10000 + 0.5)
               / 10000
           END AS corr
    FROM s
    """

# L18 rank profile: identical ANSI definitions in both engines;
# integer-ratio divisions are bit-exact, no rounding.
ORACLES["q_rank_profile"] = """
    SELECT event_id, event_type, value,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume_dist,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """

# End-to-end device health chain: the q_device_daily policy CTE feeding
# the L17 trend moments, L15 MAD rank selections, and K13 EWMA fold —
# all on the ADJUSTED event time, stitched per device.
ORACLES["q_sensor_health"] = """
    WITH adj AS (
      SELECT event_id, user_id, value, adjusted_ts FROM (
        SELECT event_id, user_id, value, ts,
               max(ts) OVER w AS adjusted_ts,
               max(epoch_us(ts)) OVER w AS hwm_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ) WHERE epoch_us(ts) >= hwm_us - 60000000
    ),
    v AS (
      SELECT user_id, event_id, epoch_us(adjusted_ts) AS t, value,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
      FROM adj WHERE value IS NOT NULL
    ),
    m AS (SELECT user_id, MIN(t) AS t0 FROM v GROUP BY 1),
    c AS (
      SELECT v.user_id, CAST(v.t - m.t0 AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
      FROM v JOIN m USING (user_id)
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      FROM c GROUP BY 1
    ),
    tr AS (
      SELECT user_id, n,
             CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) <> 0 THEN
               floor(CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE) * 86400.0 * 10000 + 0.5)
                 / 10000
             END AS slope_per_day,
             CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) <> 0
                   AND CAST(n*syy - sy*sy AS DOUBLE) <> 0 THEN
               floor(CAST(n*sxy - sx*sy AS DOUBLE)
                     / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)) * 10000 + 0.5)
                 / 10000
             END AS corr
      FROM s
    ),
    r1 AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS nn
      FROM v
    ),
    med AS (
      SELECT user_id,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * nn) AS BIGINT)
                 THEN value END) AS median_value
      FROM r1 GROUP BY 1
    ),
    r2 AS (
      SELECT v.user_id, abs(v.value - med.median_value) AS adev,
             row_number() OVER (PARTITION BY v.user_id
                                ORDER BY abs(v.value - med.median_value),
                                         v.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY v.user_id) AS nn
      FROM v JOIN med USING (user_id)
    ),
    madt AS (
      SELECT r2.user_id,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * nn) AS BIGINT)
                 THEN adev END) AS mad
      FROM r2 GROUP BY r2.user_id
    ),
    ew AS (
      SELECT user_id,
             floor(list_reduce(list(value ORDER BY t, event_id),
                               (acc, xx) -> 0.3*xx + 0.7*acc) * 10000 + 0.5)
               / 10000 AS ewma
      FROM v GROUP BY user_id
    )
    SELECT tr.user_id, tr.n, tr.slope_per_day, tr.corr,
           med.median_value, madt.mad, ew.ewma
    FROM tr JOIN med USING (user_id)
            JOIN madt USING (user_id)
            JOIN ew USING (user_id)
    """

# L19 RFM: identical compact aggregate + segment-partitioned ntile
# (both engines use the balanced-remainder SQL ntile); recency vs the
# fixed as-of literal, money in int64 cents.
ORACLES["q_rfm"] = """
    WITH base AS (
      SELECT c.c_mktsegment, o.o_custkey,
             CAST(floor((epoch_us(TIMESTAMP '1998-12-31')
                         - MAX(epoch_us(o.o_orderdate)))
                        / 86400000000.0) AS BIGINT) AS recency_days,
             COUNT(*) AS frequency,
             floor((CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                         AS DOUBLE) / 100.0) * 10000 + 0.5) / 10000 AS monetary
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT *,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY recency_days, o_custkey) AS r,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY frequency DESC, o_custkey) AS f,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY monetary DESC, o_custkey) AS m
      FROM base
    )
    SELECT c_mktsegment, o_custkey, recency_days, frequency, monetary,
           CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
           CAST(m AS INTEGER) AS m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS rfm_code
    FROM scored
    """

# L20 transitions: lead over (ts, id) per user; terminal events drop;
# share normalized over the pair table.
ORACLES["q_transitions"] = """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           floor(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS share
    FROM pairs
    """

# J48 profile: the same metrics one UNION ALL at a time; doubles
# everywhere (exact integers in double form for counts), 4dp numeric
# min/max, epoch-second timestamps.
ORACLES["q_data_profile"] = """
    SELECT 'rows' AS col_name, 'rows' AS metric,
           CAST(COUNT(*) AS DOUBLE) AS value FROM events
    UNION ALL SELECT 'event_id', 'nulls',
      CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'ts', 'nulls',
      CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'user_id', 'nulls',
      CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'event_type', 'nulls',
      CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'value', 'nulls',
      CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'props', 'nulls',
      CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM events
    UNION ALL SELECT 'event_type', 'distinct',
      CAST(COUNT(DISTINCT event_type) AS DOUBLE) FROM events
    UNION ALL SELECT 'user_id', 'distinct',
      CAST(COUNT(DISTINCT user_id) AS DOUBLE) FROM events
    UNION ALL SELECT 'value', 'min',
      floor(MIN(value) * 10000 + 0.5) / 10000 FROM events
    UNION ALL SELECT 'value', 'max',
      floor(MAX(value) * 10000 + 0.5) / 10000 FROM events
    UNION ALL SELECT 'ts', 'min',
      CAST(epoch_us(MIN(ts)) AS DOUBLE) / 1000000.0 FROM events
    UNION ALL SELECT 'ts', 'max',
      CAST(epoch_us(MAX(ts)) AS DOUBLE) / 1000000.0 FROM events
    """

# M7 / Q13 shape: aggregate-then-left-join; zero-order customers
# coalesce in.
ORACLES["q_order_count_distribution"] = """
    WITH pc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
    SELECT COALESCE(pc.n, 0) AS c_count, COUNT(*) AS custdist
    FROM customer c LEFT JOIN pc ON pc.o_custkey = c.c_custkey
    GROUP BY 1
    """

# K14 lag features: row frames on (epoch, id); the trailing-hour RANGE
# frame orders by epoch only and excludes the current instant (bound
# -1us); micro-unit frame sums keep the mean order-free.
ORACLES["q_lag_features"] = """
    SELECT event_id, user_id, ts, value,
           lag(value, 1) OVER w1 AS lag1,
           lag(value, 2) OVER w1 AS lag2,
           COUNT(value) OVER wr AS trail_1h_n,
           CASE WHEN COUNT(value) OVER wr > 0 THEN
             floor((CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                         OVER wr AS DOUBLE) / 1000000.0
                    / (COUNT(value) OVER wr)) * 10000 + 0.5) / 10000
           END AS trail_1h_mean
    FROM events
    WINDOW w1 AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
           wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
    """

# K15 CUSUM via the prefix-sum identity: s_n = S_n - min(0, min S_j)
# over exact integer micro-unit deviations — bit-identical prefix sums,
# doubles only at the /1e6 presentation.
ORACLES["q_cusum"] = """
    WITH clean AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) - 55000000 AS d
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    pre AS (
      SELECT user_id, t, event_id,
             SUM(d) OVER w AS S
      FROM clean
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cu AS (
      SELECT user_id, t, event_id,
             S - least(MIN(S) OVER w, 0) AS c
      FROM pre
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    last AS (
      SELECT user_id, c AS final_c FROM (
        SELECT user_id, c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM cu
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT user_id, COUNT(*) AS n, MAX(c) AS mx,
             CAST(SUM(CASE WHEN c > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarms
      FROM cu GROUP BY user_id
    )
    SELECT agg.user_id, agg.n,
           floor(CAST(last.final_c AS DOUBLE) / 1000000.0 * 10000 + 0.5)
             / 10000 AS final_cusum,
           floor(CAST(agg.mx AS DOUBLE) / 1000000.0 * 10000 + 0.5) / 10000
             AS max_cusum,
           agg.n_alarms
    FROM agg JOIN last USING (user_id)
    """

# L21 audience overlap: the oracle states the SEMANTICS with a plain
# distinct-pair self-join (results-equivalent; the Spark plan fans out
# per-user type sets instead of self-joining).
ORACLES["q_audience_overlap"] = """
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IS NOT NULL
    ),
    tot AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
    pr AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, ta.n AS n_a, tb.n AS n_b,
           floor(CAST(n_both AS DOUBLE)
                 / (ta.n + tb.n - n_both) * 10000 + 0.5) / 10000 AS jaccard
    FROM pr JOIN tot ta ON ta.event_type = pr.type_a
            JOIN tot tb ON tb.event_type = pr.type_b
    """

# J49 Benford: identical string-length digit extraction (the log10
# floor trap avoided in BOTH engines); expectations are log10 of exact
# small rationals, rounded 4dp (1-ulp libm differences cannot survive
# the rounding).
ORACLES["q_benford"] = """
    WITH clean AS (
      SELECT event_type, value,
             CAST(floor(value / power(10.0,
               length(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)) - 1))
               AS INTEGER) AS digit
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value) AND value >= 1.0
    ),
    counts AS (
      SELECT event_type, digit, COUNT(*) AS n FROM clean GROUP BY 1, 2
    )
    SELECT event_type, digit, n,
           floor(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS share,
           floor(log10(1.0 + 1.0 / digit) * 10000 + 0.5) / 10000
             AS benford_share,
           floor((CAST(n AS DOUBLE)
                  / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                  - log10(1.0 + 1.0 / digit)) * 10000 + 0.5) / 10000
             AS deviation
    FROM counts
    """

# K16 time-in-state: LOCF intervals from lead; final (open) events drop.
ORACLES["q_state_durations"] = """
    WITH iv AS (
      SELECT user_id, event_type AS state,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS dur
      FROM events
    )
    SELECT user_id, state, COUNT(*) AS n_intervals,
           floor(CAST(SUM(dur) AS DOUBLE) / 1000000.0 * 10000 + 0.5) / 10000
             AS total_seconds
    FROM iv WHERE dur IS NOT NULL GROUP BY 1, 2
    """

# K17 debounced alarms: gaps-and-islands run grouping is
# results-equivalent to the operator's lag-change cumsum run ids.
ORACLES["q_sustained_alarms"] = """
    WITH f AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value IS NOT NULL AND NOT isnan(value)
                   AND value > 60.0 THEN 1 ELSE 0 END AS ab,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
             - row_number() OVER (PARTITION BY user_id,
                 (CASE WHEN value IS NOT NULL AND NOT isnan(value)
                       AND value > 60.0 THEN 1 ELSE 0 END)
                 ORDER BY epoch_us(ts), event_id) AS grp
      FROM events
    )
    SELECT user_id, MIN(ts) AS alarm_start, MAX(ts) AS alarm_end,
           COUNT(*) AS n_events, MAX(value) AS peak_value
    FROM f WHERE ab = 1
    GROUP BY user_id, grp HAVING COUNT(*) >= 3
    """

# L22 Gini: rank-weighted micro-unit sums in exact integers; one double
# cast at the closed form, same op order.
ORACLES["q_gini"] = """
    WITH v AS (
      SELECT event_type, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    r AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, event_id) AS i
      FROM v
    ),
    a AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS six
      FROM r GROUP BY 1
    )
    SELECT event_type, n,
           CASE WHEN sx <> 0 THEN
             floor((2.0 * CAST(six AS DOUBLE) / (n * CAST(sx AS DOUBLE))
                    - (n + 1.0) / n) * 10000 + 0.5) / 10000
           END AS gini
    FROM a
    """

# J55 CCNet buckets: the q_lm_score model + per-language rank terciles.
# Rank bucketing is floor(3*(rn-1)/n) — pure integer-lattice double
# arithmetic, identical in both engines (no percentile interpolation).
ORACLES["q_ccnet_buckets"] = """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
      FROM documents
    ),
    counts AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
    vocab AS (
      SELECT t,
             CAST(floor(ln(CAST(c AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT) AS lp
      FROM counts, tot
      ORDER BY c DESC, t ASC LIMIT 1000
    ),
    scored AS (
      SELECT doc_id,
             coalesce(v.lp,
               (SELECT CAST(floor(ln(1.0 / n) * 1000000 + 0.5) AS BIGINT) FROM tot)
             ) AS lp
      FROM tok LEFT JOIN vocab v ON tok.t = v.t
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(lp) AS BIGINT) AS s
      FROM scored GROUP BY doc_id
    ),
    lm AS (
      SELECT doc_id,
             floor(CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1000000.0
                   * 10000 + 0.5) / 10000 AS logprob_mean
      FROM agg
    ),
    j AS (
      SELECT lm.doc_id, d.lang, lm.logprob_mean
      FROM lm JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT doc_id, lang, logprob_mean,
             row_number() OVER (PARTITION BY lang
                                ORDER BY logprob_mean DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM j
    )
    SELECT doc_id, lang, logprob_mean,
           CAST(floor(3.0 * (rn - 1) / n) AS INTEGER) AS bucket_idx,
           CASE WHEN floor(3.0 * (rn - 1) / n) = 0 THEN 'head'
                WHEN floor(3.0 * (rn - 1) / n) = 2 THEN 'tail'
                ELSE 'middle' END AS bucket
    FROM r
    """

# J56 temperature mixture: p^0.7 pinned to integer NANO-units before the
# order-free normalizing sum (same knife-edge class as every rounded
# cosine); p/weight/epochs derive from exact integers.
ORACLES["q_temperature_mix"] = """
    WITH staged AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    per_source AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      FROM staged GROUP BY source
    ),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS t FROM per_source),
    sc AS (
      SELECT source, n_docs, src_tokens, t,
             CAST(floor(pow(CAST(src_tokens AS DOUBLE) / CAST(t AS DOUBLE), 0.7)
                        * 1000000000 + 0.5) AS BIGINT) AS si
      FROM per_source, tot
    ),
    st AS (SELECT CAST(sum(si) AS BIGINT) AS s_tot FROM sc)
    SELECT source, n_docs, src_tokens AS n_tokens,
           floor(CAST(src_tokens AS DOUBLE) / CAST(t AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS p,
           floor(CAST(si AS DOUBLE) / CAST(s_tot AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS weight,
           CASE WHEN src_tokens > 0 THEN
             floor((CAST(si AS DOUBLE) * CAST(t AS DOUBLE))
                   / (CAST(s_tot AS DOUBLE) * CAST(src_tokens AS DOUBLE))
                   * 10000 + 0.5) / 10000
           END AS epochs
    FROM sc, st
    """

# J57 hard negatives: the q_topk_cosine pair scoring with the near-dup
# exclusion applied BEFORE the rank.
ORACLES["q_hard_negatives"] = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
    pairs AS (
      SELECT query_id, cand_id,
        floor((
          list_sum(list_transform(list_zip(qv, cv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          ) * 10000 + 0.5) / 10000 AS cosine
      FROM q, c WHERE query_id <> cand_id
    ),
    kept AS (SELECT * FROM pairs WHERE cosine < 0.35)
    SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
      FROM kept
    ) WHERE rn <= 10
    """

# M16 (Q6): pure-pushdown revenue scalar, micro-unit sum.
ORACLES["q_discount_revenue"] = """
    SELECT CAST(r AS DOUBLE) / 1000000.0 AS revenue, n_items FROM (
      SELECT SUM(CAST(floor(l_extendedprice * l_discount * 1000000 + 0.5) AS BIGINT)) AS r,
             COUNT(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24.0
    )
    """

# M17 (Q10): returned-item revenue per customer, top 20 by
# (revenue DESC, custkey ASC) — the Spark side's TakeOrderedAndProject
# ordering exactly.
ORACLES["q_returned_customers"] = """
    WITH o AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    ),
    agg AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1000000 + 0.5) AS BIGINT)) AS r
      FROM lineitem l
      JOIN o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, c_name, CAST(r AS DOUBLE) / 1000000.0 AS revenue,
           c_acctbal, n_name
    FROM agg
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """

# M18 (Q8): NATION_7's ASIA-market share for ECONOMY parts by order
# year — conditional micro-unit sum over total, 6-dp half-up share.
ORACLES["q_market_share"] = """
    WITH cust_r AS (
      SELECT c_custkey FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    j AS (
      SELECT year(o.o_orderdate) AS o_year,
             sn.n_name AS supp_nation,
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1000000 + 0.5) AS BIGINT) AS rev
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN cust_r cr ON o.o_custkey = cr.c_custkey
    ),
    agg AS (
      SELECT o_year,
             CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END) AS BIGINT) AS nr,
             CAST(SUM(rev) AS BIGINT) AS tr
      FROM j GROUP BY o_year
    )
    SELECT CAST(o_year AS INTEGER) AS o_year,
           CAST(nr AS DOUBLE) / 1000000.0 AS nation_rev,
           CAST(tr AS DOUBLE) / 1000000.0 AS total_rev,
           floor(CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS mkt_share
    FROM agg
    """

# M19 Q9 shape: profit by supplier nation and order year for the
# 'widget' part family; int64 micro-units, year AS INTEGER (Spark int32).
ORACLES["q_product_profit"] = """
    SELECT sn.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY sn.n_name, year(o.o_orderdate)
    """

# M20 Q12 shape: priority mix per lateness class. date_diff('day') on
# midnight-aligned timestamps equals Spark's datediff(date-cast) exactly.
ORACLES["q_late_shipments"] = """
    WITH j AS (
      SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 365
                  THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
             o.o_orderpriority AS pri
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT ship_class,
           CAST(SUM(CASE WHEN pri IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN pri IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                AS BIGINT) AS low_line_count
    FROM j GROUP BY ship_class
    """

# M21 Q16 shape: distinct suppliers per (brand, type, size) with the
# NOT-IN exclusion; lineitem pairs stand in for partsupp.
ORACLES["q_part_supplier_counts"] = """
    WITH offers AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    good AS (
      SELECT * FROM offers
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT g.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM good g
    JOIN part p ON g.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND p.p_size BETWEEN 1 AND 25
    GROUP BY p.p_brand, p.p_type, p.p_size
    """

# J65 Bloom-prefiltered semi join: the Bloom is plan-side only (no
# false negatives + exact verify), so the oracle is the PLAIN semi join.
ORACLES["q_bloom_semi"] = """
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY l.l_returnflag
    """

# J66 JL-projected top-k: the oracle inlines the SAME deterministic
# +-1 matrix as the Spark side (jl_signs — md5-derived literal rows;
# NEITHER engine recomputes the formula at query time, so only Python
# determinism matters); each projected component
# is micro-pinned so the cosine runs on exact integer-valued doubles
# (see operators/similarity.py:jl_project). Skeleton = q_topk_cosine.
def _jl_oracle() -> str:
    from azure_iot_realtime_data_pipeline_spark.operators.similarity import (
        jl_signs,
    )

    comps = []
    for row in jl_signs(64, 32):
        lits = ", ".join(str(v) for v in row)
        comps.append(
            "CAST(CAST(floor(list_sum(list_transform(list_zip(embedding, "
            f"[{lits}]), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
            " * 1000000 + 0.5) AS BIGINT) AS DOUBLE)"
        )
    pv = ",\n        ".join(comps)
    return f"""
    WITH proj AS (
      SELECT vec_id, [
        {pv}
      ] AS pv FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, pv AS qv FROM proj WHERE vec_id < 5),
    c AS (SELECT vec_id AS cand_id, pv AS cv FROM proj),
    pairs AS (
      SELECT query_id, cand_id,
        floor((
          list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
          / (sqrt(list_sum(list_transform(qv, x -> x * x)))
           * sqrt(list_sum(list_transform(cv, x -> x * x))))
          ) * 10000 + 0.5) / 10000 AS cosine
      FROM q, c WHERE query_id <> cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 10
    """


ORACLES["q_jl_topk"] = _jl_oracle()

# J67 char entropy: the oracle regenerates the same 37-symbol count
# expressions (one replace per symbol) and the identical integer-
# lattice pinned-log2 accumulation (see text.py:char_entropy_bits).
def _char_entropy_oracle() -> str:
    from azure_iot_realtime_data_pipeline_spark.operators.text import (
        ENTROPY_ALPHABET,
    )

    cnts = ",\n        ".join(
        f"n - CAST(length(replace(t, '{ch}', '')) AS BIGINT)"
        for ch in ENTROPY_ALPHABET
    )
    mlog2 = (
        "CAST(floor(log2(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    )
    return f"""
    WITH s AS (
      SELECT doc_id, lower(text) AS t,
             CAST(length(lower(text)) AS BIGINT) AS n
      FROM documents
    ),
    k AS (
      SELECT doc_id, n, [
        {cnts}
      ] AS cnts FROM s
    ),
    a AS (
      SELECT doc_id, n,
             CAST(list_sum(list_transform(
               list_append(cnts, n - CAST(list_sum(cnts) AS BIGINT)),
               c -> CASE WHEN c > 0 THEN c * {mlog2} ELSE 0 END
             )) AS BIGINT) AS acc
      FROM k
    )
    SELECT doc_id,
           CASE WHEN n > 0 THEN
             floor((CAST(n * CAST(floor(log2(CAST(n AS DOUBLE)) * 1000000
                                        + 0.5) AS BIGINT) - acc AS DOUBLE)
                    / CAST(n AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000
           ELSE NULL END AS entropy_bits
    FROM a
    """


ORACLES["q_char_entropy"] = _char_entropy_oracle()

# K19 trapezoidal integral: lag + running sum over one key sort; the
# per-step increment pins to micro-units of value*seconds (which is
# exactly value*microseconds), so the cumulative is int64 until the
# final divide.
ORACLES["q_trapezoid_integral"] = """
    WITH s AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ep,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    l AS (
      SELECT user_id, event_id, ts, ep, v,
             lag(v) OVER w AS pv, lag(ep) OVER w AS pe
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    ),
    i AS (
      SELECT user_id, event_id, ts, ep,
             CASE WHEN pe IS NOT NULL THEN
               CAST(floor((v + pv) / 2.0 * CAST(ep - pe AS DOUBLE) + 0.5)
                    AS BIGINT)
             ELSE 0 END AS inc
      FROM l
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(inc) OVER (PARTITION BY user_id ORDER BY ep, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE)
             / 1000000.0 AS energy
    FROM i
    """

# J68 containment: the J2 shingle skeleton, one undirected pair
# aggregate, both directions via UNION ALL; 4 dp rounding BEFORE the
# threshold so the cut is engine-portable.
ORACLES["q_containment"] = """
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM docs WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM idx
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT doc_a, doc_b, n_common, sa.n AS na, sb.n AS nb
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    ),
    directed AS (
      SELECT doc_a AS contained, doc_b AS container,
             floor(CAST(n_common AS DOUBLE) / CAST(na AS DOUBLE)
                   * 10000 + 0.5) / 10000 AS containment
      FROM j
      UNION ALL
      SELECT doc_b AS contained, doc_a AS container,
             floor(CAST(n_common AS DOUBLE) / CAST(nb AS DOUBLE)
                   * 10000 + 0.5) / 10000 AS containment
      FROM j
    )
    SELECT contained, container, containment
    FROM directed WHERE containment >= 0.1
    """

# K23 fixed-anchor LTTB: bucket by floor((rn-1)*20/n) (explicit floor —
# DuckDB CAST(double AS BIGINT) rounds where Spark truncates), DECIMAL/
# int64-micro centroid sums divided ONCE to double, fixed-order area
# cross-product pinned to whole units (the x axis is epoch-us; micro
# would overflow), argmax by (area DESC, event_id).
ORACLES["q_lttb"] = """
    WITH pts AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ep,
             CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        AND abs(value) < 9.2233720368547e12
    ),
    rn_t AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id ORDER BY ep, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM pts
    ),
    bk AS (
      SELECT *, CAST(floor(CAST((rn - 1) * 20 AS DOUBLE) / n) AS BIGINT) AS bkt
      FROM rn_t
    ),
    cent AS (
      SELECT user_id, bkt, COUNT(*) AS bn,
             SUM(CAST(ep AS DECIMAL(38,0))) AS sx,
             CAST(SUM(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sy
      FROM bk GROUP BY user_id, bkt
    ),
    c2 AS (
      SELECT user_id, bkt,
             CAST(sx AS DOUBLE) / CAST(bn AS DOUBLE) AS cx,
             CAST(sy AS DOUBLE) / CAST(bn AS DOUBLE) / 1000000.0 AS cy
      FROM cent
    ),
    fst AS (
      SELECT user_id, CAST(ep AS DOUBLE) AS fx, v AS fy FROM bk WHERE rn = 1
    ),
    lst AS (
      SELECT user_id, CAST(ep AS DOUBLE) AS lx, v AS ly FROM bk WHERE rn = n
    ),
    anch AS (
      SELECT c2.user_id, c2.bkt,
             coalesce(lag(cx) OVER wb, f.fx) AS ax,
             coalesce(lag(cy) OVER wb, f.fy) AS ay,
             coalesce(lead(cx) OVER wb, l.lx) AS zx,
             coalesce(lead(cy) OVER wb, l.ly) AS zy
      FROM c2
      JOIN fst f ON c2.user_id = f.user_id
      JOIN lst l ON c2.user_id = l.user_id
      WINDOW wb AS (PARTITION BY c2.user_id ORDER BY c2.bkt)
    ),
    scored AS (
      SELECT b.user_id, b.bkt, b.event_id, b.ts, b.v,
             CAST(floor(abs(
               (a.ax - a.zx) * (b.v - a.ay)
               - (a.ax - CAST(b.ep AS DOUBLE)) * (a.zy - a.ay)
             ) + 0.5) AS BIGINT) AS area
      FROM bk b JOIN anch a ON b.user_id = a.user_id AND b.bkt = a.bkt
    )
    SELECT user_id, bkt AS bucket, event_id, ts, v AS value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, bkt
                                   ORDER BY area DESC, event_id) AS r
      FROM scored
    ) WHERE r = 1
    """

# J69 corpus data card: per-doc metrics pinned to int ten-thousandths
# before the group means; one-row total for the share.
ORACLES["q_corpus_report"] = f"""
    WITH per AS (
      SELECT source, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS BIGINT) AS t,
             CAST(floor((0.5 * (CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[^a-z ]', '', 'g'))
                         AS DOUBLE) / length(text) END)
                 + 0.5 * (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(toks, t -> t IN {STOP_IN}))
                         AS DOUBLE) / len(toks) END)) * 10000 + 0.5)
                  AS BIGINT) AS q4
      FROM (
        SELECT source, lang, text,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
      )
    ),
    agg AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t) AS BIGINT) AS total_tokens,
             CAST(SUM(q4) AS BIGINT) AS sq
      FROM per GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS alln FROM agg)
    SELECT source, lang, n_docs, total_tokens,
           floor(CAST(sq AS DOUBLE) / CAST(n_docs AS DOUBLE) / 10000.0
                 * 10000 + 0.5) / 10000 AS mean_quality,
           floor(CAST(n_docs AS DOUBLE) / alln * 1000000 + 0.5) / 1000000
             AS doc_share
    FROM agg, tot
    """

# A2b quarantine: the oracle re-judges the IDENTICAL payload text with
# json_valid — equivalent on this feed's domain (objects or garbage;
# from_json's struct-shape quarantine of 'null'/'[]' never arises).
ORACLES["q_json_quarantine"] = """
    WITH feed AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0
                  THEN '{' || CAST(json_object('event_id', event_id,
                                               'event_type', event_type)
                              AS VARCHAR)
                  ELSE CAST(json_object('event_id', event_id,
                                        'event_type', event_type)
                       AS VARCHAR)
             END AS payload
      FROM events
    )
    SELECT event_id, NOT json_valid(payload) AS quarantined FROM feed
    """

# J70 stratified split: md5-ordered rank per stratum, identical double
# boundary expressions (floor(cum_w * n)) on both engines.
ORACLES["q_stratified_split"] = """
    WITH r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang, source) AS n
      FROM documents
    )
    SELECT doc_id, lang, source,
           CASE WHEN rn <= floor(CAST(n * 800000 AS DOUBLE) / 1000000.0)
                  THEN 'train'
                WHEN rn <= floor(CAST(n * 900000 AS DOUBLE) / 1000000.0)
                  THEN 'val'
                ELSE 'test' END AS split
    FROM r
    """

# K24 throttle: first 2 per (user, aligned day) — params that make the
# cap bite on this feed (~31% dropped).
ORACLES["q_throttle"] = """
    SELECT event_id, user_id, ts FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (
               PARTITION BY user_id,
                            CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
               ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE ts IS NOT NULL
    ) WHERE rn <= 2
    """

# L41 percentile bands: the L4 rank selection grouped by aligned hour.
ORACLES["q_percentile_bands"] = """
    WITH ranked AS (
      SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                            * 3600000000) AS hour,
             value, event_id,
             row_number() OVER (
               PARTITION BY CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
               ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (
               PARTITION BY CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
             ) AS n
      FROM events
    )
    SELECT hour, q, value AS p_value
    FROM ranked CROSS JOIN
         (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q) qs
    WHERE rn = CAST(ceil(q * n) AS BIGINT)
    """

# J71 ngram KL: the J59 bucket featurization on both halves, full
# 1024-bucket spine (unseen-on-both-sides buckets still contribute
# their smoothed term), pinned-ln micro-nat lattice.
ORACLES["q_ngram_kl"] = """
    WITH staged AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
      FROM documents
    ),
    feats AS (
      SELECT doc_id, unnest(l) AS f FROM staged
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS f
      FROM staged WHERE len(l) >= 2
    ),
    fb AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT) % 1024 AS b
      FROM feats
    ),
    ac AS (SELECT b, COUNT(*) AS ca FROM fb WHERE doc_id % 2 = 0 GROUP BY b),
    bc AS (SELECT b, COUNT(*) AS cb FROM fb WHERE doc_id % 2 = 1 GROUP BY b),
    at AS (SELECT coalesce(CAST(SUM(ca) AS BIGINT), 0) AS a_tot FROM ac),
    bt AS (SELECT coalesce(CAST(SUM(cb) AS BIGINT), 0) AS b_tot FROM bc),
    spine AS (SELECT unnest(range(0, 1024)) AS b),
    j AS (
      SELECT s.b, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb, a_tot, b_tot
      FROM spine s LEFT JOIN ac ON s.b = ac.b LEFT JOIN bc ON s.b = bc.b,
           at, bt
    ),
    terms AS (
      SELECT (ca > 0 OR cb > 0) AS obs,
             CAST(floor(
               ((ca + 1.0) / (a_tot + 1024))
               * CAST(CAST(floor(ln((ca + 1.0) / (a_tot + 1024))
                                 * 1000000.0 + 0.5) AS BIGINT)
                      - CAST(floor(ln((cb + 1.0) / (b_tot + 1024))
                                   * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
               + 0.5) AS BIGINT) AS c
      FROM j
    )
    SELECT floor(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / 1000000.0
                 * 1000000 + 0.5) / 1000000 AS kl_nats,
           CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_obs,
           (SELECT a_tot FROM at) AS a_feats,
           (SELECT b_tot FROM bt) AS b_feats
    FROM terms
    """

# L42 grid neighbor join: integer tenths coordinates, floor-divided
# cells (DuckDB // truncates toward zero — floor() is the portable
# spelling for negatives), 3x3 probe explode, exact integer d2.
ORACLES["q_spatial_join"] = """
    WITH pts AS (
      SELECT event_id AS id,
             CAST(user_id % 1800 - 900 AS BIGINT) AS lat,
             CAST(event_id % 3600 - 1800 AS BIGINT) AS lon
      FROM events
    ),
    cells AS (
      SELECT id, lat, lon,
             CAST(floor(CAST(lat AS DOUBLE) / 3.0) AS BIGINT) AS cx,
             CAST(floor(CAST(lon AS DOUBLE) / 3.0) AS BIGINT) AS cy
      FROM pts
    ),
    probe AS (
      SELECT id AS ida, lat AS lata, lon AS lona,
             cx + o.dx AS pcx, cy + o.dy AS pcy
      FROM cells, (
        SELECT unnest([-1, 0, 1]) AS dx
      ) ox, (
        SELECT unnest([-1, 0, 1]) AS dy
      ) oy,
      LATERAL (SELECT ox.dx AS dx, oy.dy AS dy) o
    )
    SELECT p.ida AS id_a, c.id AS id_b,
           (p.lata - c.lat) * (p.lata - c.lat)
           + (p.lona - c.lon) * (p.lona - c.lon) AS d2_tenths
    FROM probe p
    JOIN cells c ON p.pcx = c.cx AND p.pcy = c.cy AND p.ida < c.id
    WHERE (p.lata - c.lat) * (p.lata - c.lat)
          + (p.lona - c.lon) * (p.lona - c.lon) <= 1
    """

# J72 embedding covariance: the unnest-pair form (every element pair
# through a join) that the partial-Gram operator avoids at scale; the
# identical pinned lattice (floor(xi*xj*1e6+0.5) per pair, int64 sums,
# fixed-order final double expression).
ORACLES["q_embedding_cov"] = """
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
    el AS (
      SELECT vec_id, unnest(generate_series(1, 64)) AS idx, embedding
      FROM e
    ),
    ex AS (
      SELECT vec_id, CAST(idx - 1 AS INTEGER) AS i,
             CAST(embedding[idx] AS DOUBLE) AS x
      FROM el
    ),
    s2 AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(floor(a.x * b.x * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ),
    fm AS (
      SELECT i,
             CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS fsum
      FROM ex GROUP BY i
    )
    SELECT s2.i, s2.j,
           floor((CAST(s AS DOUBLE) / n / 1000000.0
                  - (CAST(fi.fsum AS DOUBLE) / n / 1000000.0)
                    * (CAST(fj.fsum AS DOUBLE) / n / 1000000.0))
                 * 1000000 + 0.5) / 1000000 AS cov
    FROM s2
    JOIN fm fi ON s2.i = fi.i
    JOIN fm fj ON s2.j = fj.i, cnt
    """

# L43 CDC apply: the oracle IS the direct "new" snapshot — matching it
# hash-checks the apply(old, diff(old, new)) == new round trip.
ORACLES["q_cdc_apply"] = """
    SELECT event_id, event_type,
           CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END AS value
    FROM events WHERE event_id % 11 <> 0
    """

# L44 association rules: the L37 oracle's pair/marginal core, both
# directions via UNION ALL, 4 dp confidence cut after rounding.
ORACLES["q_association_rules"] = """
    WITH b AS (
      SELECT DISTINCT user_id,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                  AS BIGINT) AS day,
             event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ),
    pairs AS (
      SELECT x.event_type AS item_a, y.event_type AS item_b,
             COUNT(*) AS n_both
      FROM b x JOIN b y
        ON x.user_id = y.user_id AND x.day = y.day
       AND x.event_type < y.event_type
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type AS t, COUNT(*) AS n FROM b GROUP BY event_type
    ),
    nb AS (
      SELECT COUNT(*) AS n_baskets
      FROM (SELECT DISTINCT user_id, day FROM b)
    ),
    base AS (
      SELECT p.item_a, p.item_b, CAST(p.n_both AS BIGINT) AS n_both,
             CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
             CAST(nb.n_baskets AS BIGINT) AS n_baskets,
             floor(CAST(p.n_both AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
                   / (CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE))
                   * 10000 + 0.5) / 10000 AS lift
      FROM pairs p
      JOIN totals ta ON p.item_a = ta.t
      JOIN totals tb ON p.item_b = tb.t
      CROSS JOIN nb
    ),
    directed AS (
      SELECT item_a AS antecedent, item_b AS consequent, n_both,
             n_a AS n_antecedent, n_baskets, lift FROM base
      UNION ALL
      SELECT item_b AS antecedent, item_a AS consequent, n_both,
             n_b AS n_antecedent, n_baskets, lift FROM base
    )
    SELECT antecedent, consequent, n_both,
           floor(CAST(n_both AS DOUBLE) / CAST(n_baskets AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS support,
           floor(CAST(n_both AS DOUBLE) / CAST(n_antecedent AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS confidence,
           lift
    FROM directed
    WHERE floor(CAST(n_both AS DOUBLE) / CAST(n_antecedent AS DOUBLE)
                * 10000 + 0.5) / 10000 >= 0.1
    """

# J73 split leakage: the J2 jaccard core + the J70 split assignment,
# least/greatest pair normalization.
ORACLES["q_split_leakage"] = """
    WITH docs AS (
      SELECT doc_id, lang, source,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM docs WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM idx
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common))
                  * 10000 + 0.5) / 10000 >= 0.05
    ),
    r AS (
      SELECT doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang, source) AS n
      FROM docs
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN rn <= floor(CAST(n * 800000 AS DOUBLE) / 1000000.0)
                    THEN 'train'
                  WHEN rn <= floor(CAST(n * 900000 AS DOUBLE) / 1000000.0)
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM r
    )
    SELECT least(x.split, y.split) AS split_a,
           greatest(x.split, y.split) AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN sp x ON p.doc_a = x.doc_id
    JOIN sp y ON p.doc_b = y.doc_id
    GROUP BY 1, 2
    """

# L45 freshness: per-device last-seen lag behind the fleet watermark;
# integer microsecond arithmetic, truncating minute division both
# sides (CAST AS BIGINT after a nonneg double division == Spark's
# cast-truncate; values are nonnegative so floor == trunc).
ORACLES["q_freshness"] = """
    WITH per AS (
      SELECT user_id, MAX(ts) AS last_seen,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id
    ),
    wm AS (SELECT MAX(epoch_us(ts)) AS w FROM events)
    SELECT user_id, last_seen, n_events,
           CAST(floor(CAST(w - last_us AS DOUBLE) / 60000000.0) AS BIGINT)
             AS lag_minutes,
           (w - last_us) > 3600000000 AS stale
    FROM per, wm
    """

# L46 volume anomaly: daily counts through the L14 z lattice.
ORACLES["q_volume_anomaly"] = """
    WITH daily AS (
      SELECT user_id,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                  AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(CAST(n_events AS DECIMAL(18,2))) AS s,
             SUM(CAST(n_events AS DECIMAL(18,2))
                 * CAST(n_events AS DECIMAL(18,2))) AS ss
      FROM daily GROUP BY user_id
    ),
    cuts AS (
      SELECT user_id,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CASE WHEN CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                  THEN sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             END AS sd
      FROM stats
    )
    SELECT d.day AS _day, d.user_id, d.n_events,
           floor((d.n_events - c.m) / c.sd * 10000 + 0.5) / 10000 AS zscore
    FROM daily d JOIN cuts c USING (user_id)
    """

# M22 Q20 shape: suppliers moving >20% of any red part's 1996 volume,
# ASIA only; quantities sum as int64 (integral by generation).
ORACLES["q_dominant_suppliers"] = """
    WITH qty AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'red%'
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    w AS (
      SELECT l_suppkey, q,
             SUM(q) OVER (PARTITION BY l_partkey) AS part_total
      FROM qty
    ),
    dom AS (
      SELECT DISTINCT l_suppkey FROM w
      WHERE CAST(q AS DOUBLE) > 0.2 * CAST(part_total AS DOUBLE)
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation
    FROM dom d
    JOIN supplier s ON d.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """


# --- IVF oracle: ONE source of truth for q_ivf_topk and its
# hard-negative variant (review r7 pass 2: the two ~50-line SQL bodies
# had drifted into verbatim duplication; a one-sided edit to the
# rounding/tie-break/probe constants could silently diverge the gates).
_IVF_ORACLE_CORE = """
    WITH cands AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cent_vec
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    assigned AS (
      SELECT cand_id, cv, cent_id AS cell_id FROM (
        SELECT cands.cand_id, cands.cv, cents.cent_id,
          row_number() OVER (PARTITION BY cands.cand_id ORDER BY
            floor((
              list_sum(list_transform(list_zip(cv, cent_vec),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(cent_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              ) * 10000 + 0.5) / 10000 DESC, cent_id) AS rn
        FROM cands, cents
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cent_id AS cell_id FROM (
        SELECT q.query_id, q.qv, cents.cent_id,
          row_number() OVER (PARTITION BY q.query_id ORDER BY
            floor((
              list_sum(list_transform(list_zip(qv, cent_vec),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(cent_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              ) * 10000 + 0.5) / 10000 DESC, cent_id) AS rn
        FROM q, cents
      ) WHERE rn <= 4
    ),
    pairs AS (
      SELECT query_id, cand_id,
        floor((
          list_sum(list_transform(list_zip(qv, cv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          ) * 10000 + 0.5) / 10000 AS cosine
      FROM probes JOIN assigned USING (cell_id)
      WHERE query_id <> cand_id
    ){extra}
    SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
      FROM {rank_src}
    ) WHERE rn <= 10
    """


def _ivf_oracle_sql(dup_threshold: float | None = None) -> str:
    extra = (
        ",\n    kept AS (SELECT * FROM pairs WHERE cosine < {t})".format(
            t=dup_threshold
        )
        if dup_threshold is not None
        else ""
    )
    return _IVF_ORACLE_CORE.format(
        extra=extra,
        rank_src="kept" if dup_threshold is not None else "pairs",
    )


ORACLES["q_ivf_topk"] = _ivf_oracle_sql()
ORACLES["q_hard_negatives_ann"] = _ivf_oracle_sql(dup_threshold=0.35)

# J59 DSIR: per-bucket log ratio pinned to integer micro-units BEFORE
# the per-doc sum (order-free int64); same ln + add-one-smoothing
# formula TEXT as the Spark side so libm agreement is exercised at one
# rounded site only. Bigrams guard len < 2 exactly like the Spark
# sequence() guard.
ORACLES["q_dsir_weights"] = """
    WITH staged AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
      FROM documents
    ),
    feats AS (
      SELECT doc_id, unnest(l) AS f FROM staged
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS f
      FROM staged WHERE len(l) >= 2
    ),
    fb AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT) % 1024 AS b
      FROM feats
    ),
    rawc AS (SELECT b, COUNT(*) AS cr FROM fb GROUP BY b),
    tgtc AS (
      SELECT b, COUNT(*) AS ct FROM fb WHERE doc_id % 20 = 0 GROUP BY b
    ),
    rt AS (SELECT CAST(SUM(cr) AS BIGINT) AS r_tot FROM rawc),
    tt AS (SELECT coalesce(CAST(SUM(ct) AS BIGINT), 0) AS t_tot FROM tgtc),
    lam AS (
      SELECT rawc.b,
             CAST(floor((
               ln((coalesce(ct, 0) + 1.0) / (t_tot + 1024))
               - ln((cr + 1.0) / (r_tot + 1024))
             ) * 1000000.0 + 0.5) AS BIGINT) AS lam_micro
      FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b, rt, tt
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n, CAST(SUM(lam_micro) AS BIGINT) AS w
      FROM fb JOIN lam ON fb.b = lam.b GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(n, 0) AS n_feats,
           CAST(coalesce(w, 0) AS DOUBLE) / 1000000.0 AS dsir_weight
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

# J60 triangles: the ordered a<b<c enumeration — same triangle set as
# the Spark side's degree-oriented form (orientation changes the join
# shape, never the set). Pair generation mirrors q_pagerank's graph
# (q_ngram_jaccard CTE at doc_id < 200, rounded jaccard >= 0.2).
ORACLES["q_triangles"] = """
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM docs WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM idx
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    e AS (
      SELECT doc_a AS u, doc_b AS v
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common))
                  * 10000 + 0.5) / 10000 >= 0.2
    ),
    sym AS (SELECT u AS node, v AS peer FROM e
            UNION ALL SELECT v AS node, u AS peer FROM e),
    deg AS (SELECT node, COUNT(*) AS degree FROM sym GROUP BY node),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tn AS (SELECT a AS node FROM tri
           UNION ALL SELECT b FROM tri
           UNION ALL SELECT c FROM tri),
    tc AS (SELECT node, COUNT(*) AS t FROM tn GROUP BY node)
    SELECT deg.node AS doc_id,
           CAST(degree AS BIGINT) AS degree,
           CAST(coalesce(t, 0) AS BIGINT) AS triangles,
           CASE WHEN degree >= 2 THEN
             floor(2.0 * coalesce(t, 0)
                   / (CAST(degree AS DOUBLE) * (degree - 1.0))
                   * 10000 + 0.5) / 10000
           END AS clustering
    FROM deg LEFT JOIN tc ON deg.node = tc.node
    """

# J61 CMS heavy hitters: the sketch arithmetic verbatim — portable
# row-hash into 4x16 counters, min over rows, literal threshold.
ORACLES["q_cms_heavy_hitters"] = """
    WITH t AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS item
      FROM documents
    ),
    r AS (SELECT unnest([0, 1, 2, 3]) AS r),
    h AS (
      SELECT item, r,
             CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), ':', item)), 1, 8))
                  AS BIGINT) % 16 AS bucket
      FROM t, r
    ),
    sk AS (SELECT r, bucket, COUNT(*) AS c FROM h GROUP BY r, bucket),
    cand AS (SELECT DISTINCT item FROM t),
    ch AS (
      SELECT item, r.r AS r,
             CAST(concat('0x', substr(md5(concat(CAST(r.r AS VARCHAR), ':', item)), 1, 8))
                  AS BIGINT) % 16 AS bucket
      FROM cand, r
    ),
    est AS (
      SELECT item, CAST(MIN(c) AS BIGINT) AS est
      FROM ch JOIN sk ON ch.r = sk.r AND ch.bucket = sk.bucket
      GROUP BY item
    )
    SELECT item, est FROM est WHERE est >= 900
    """

# J62 Gopher rules: all five word-level flags on the integer lattice —
# the only float is the REPORTING mean (micro-rounded). Stopword hits
# count which members of the fixed list appear (list iterated, corpus
# list probed) — order-free, duplicate-safe on both engines.
ORACLES["q_gopher_rules"] = """
    WITH staged AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n,
             CAST(coalesce(list_sum(list_transform(l, t -> len(t))), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(l, t ->
               contains(t, '#') OR contains(t, '...') OR contains(t, '…')
             )) AS BIGINT) AS symbols,
             CAST(len(list_filter(l, t -> regexp_matches(t, '[A-Za-z]')))
                  AS BIGINT) AS alpha,
             CAST(len(list_filter(
               ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
               s -> list_contains(l, s)
             )) AS BIGINT) AS stop_hits
      FROM staged
    )
    SELECT doc_id,
           n AS n_words,
           CASE WHEN n > 0 THEN
             floor(CAST(sum_len AS DOUBLE) / n * 10000 + 0.5) / 10000
           END AS mean_word_len,
           (n >= 50 AND n <= 100000) AS ok_word_count,
           (sum_len >= 3 * n AND sum_len <= 10 * n AND n > 0) AS ok_mean_word_len,
           (10 * symbols <= n) AS ok_symbol_ratio,
           (5 * alpha >= 4 * n) AS ok_alpha_words,
           stop_hits,
           ((n >= 50 AND n <= 100000)
            AND (sum_len >= 3 * n AND sum_len <= 10 * n AND n > 0)
            AND (10 * symbols <= n)
            AND (5 * alpha >= 4 * n)
            AND stop_hits >= 2) AS passes
    FROM m
    """

# J64 SQ8 quantized top-k: quantize -> dequantize -> the q_topk_cosine
# scoring verbatim. Formula TEXT matches the Spark side operation-for-
# operation (code*(span)/255 association, micro+0.5 floor) so the only
# cross-engine surface is IEEE arithmetic on identical doubles.
ORACLES["q_quantized_topk"] = """
    WITH q0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 5
    ),
    c0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id,
             list_transform(v, x ->
               lo + (CASE WHEN hi > lo
                          THEN floor((x - lo) / (hi - lo) * 255 + 0.5)
                          ELSE 0 END) * (hi - lo) / 255) AS qv
      FROM (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM q0)
    ),
    c AS (
      SELECT vec_id AS cand_id,
             list_transform(v, x ->
               lo + (CASE WHEN hi > lo
                          THEN floor((x - lo) / (hi - lo) * 255 + 0.5)
                          ELSE 0 END) * (hi - lo) / 255) AS cv
      FROM (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM c0)
    ),
    pairs AS (
      SELECT query_id, cand_id,
        floor((
          list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
          / (sqrt(list_sum(list_transform(qv, x -> x * x)))
           * sqrt(list_sum(list_transform(cv, x -> x * x))))
          ) * 10000 + 0.5) / 10000 AS cosine
      FROM q, c WHERE query_id <> cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 10
    """


def _hll_distinct_oracle(p: int = 8) -> str:
    """Mirror of sketches.hll_distinct at p=8: md5-derived 32-bit hash,
    register index = top p bits, rho = 1 + leading zeros of the
    (32-p)-bit suffix via DECIMAL bit-length (DuckDB bin(); Spark
    conv(.,10,2) — integer-exact, no float log2), per-register MAX,
    then the Flajolet estimator with the harmonic denominator on the
    2^(33-p)-scaled int64 lattice so the raw branch is ONE f64 division
    of an exactly-representable numerator. Constants (alpha numerator,
    2.5m threshold) render from the SAME Python floats the Spark side
    uses — drift is structurally impossible."""
    from azure_iot_realtime_data_pipeline_spark.operators.sketches import (
        _hll_alpha,
    )

    m = 1 << p
    sb = 32 - p
    numerator = repr(_hll_alpha(m) * float(m * m * (1 << (sb + 1))))
    mask = (1 << sb) - 1
    empty_term = 1 << (sb + 1)
    raw = f"{numerator} / d"
    linear = f"{float(m)} * ln({float(m)} / zeros)"
    return f"""
        WITH h AS (
          SELECT event_type,
                 CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                      AS BIGINT) AS hv
          FROM events WHERE event_id IS NOT NULL
        ),
        r AS (
          SELECT event_type, hv // {mask + 1} AS j,
                 CASE WHEN hv % {mask + 1} = 0 THEN {sb + 1}
                      ELSE {sb + 1} - length(bin(hv % {mask + 1})) END AS rho
          FROM h
        ),
        regs AS (
          SELECT event_type, j, MAX(rho) AS mj FROM r GROUP BY 1, 2
        ),
        agg AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_regs,
                 SUM(CAST(1 AS BIGINT) << ({sb + 1} - mj)) AS d_obs
          FROM regs GROUP BY 1
        ),
        e AS (
          SELECT event_type, n_regs,
                 {m} - n_regs AS zeros,
                 CAST(d_obs + ({m} - n_regs) * {empty_term} AS DOUBLE) AS d
          FROM agg
        )
        SELECT event_type, n_regs,
               CASE WHEN ({raw}) <= {2.5 * m} AND zeros > 0
                    THEN {sql_round_half_up(linear)}
                    ELSE {sql_round_half_up(raw)} END AS distinct_est
        FROM e
        """


ORACLES["q_hll_distinct"] = _hll_distinct_oracle()


def _kmv_overlap_oracle(k: int = 64) -> str:
    """Mirror of sketches.kmv_overlap: per-type kept sets (the
    kmv_distinct synopsis), per-pair union top-k V via a rank window,
    rho = |V ∩ A ∩ B| / |V| with the intersection realized as two
    equi-joins back onto the kept table (kept rows are distinct per
    (type, hv), so the joins cannot duplicate), and the same
    CASE-on-|V|<k exact/estimator split with both f64 divisions rounded
    half-up — relational where Spark uses array ops, identical values."""
    union_raw = f"{float(k - 1)} * {float(2**32)} / tau"
    # zero-intersection pairs miss from `inter` (LEFT JOIN) — coalesce
    # to 0 so rho is 0.0 like Spark's empty array_intersect, not NULL
    rho_raw = "CAST(COALESCE(n_inter, 0) AS DOUBLE) / nv"
    u_expr = f"CASE WHEN nv < {k} THEN CAST(nv AS DOUBLE) ELSE {union_raw} END"
    return f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                      AS BIGINT) AS hv
          FROM events WHERE user_id IS NOT NULL
        ),
        kept AS (
          SELECT event_type, hv FROM (
            SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv)
                     AS rn
            FROM h
          ) WHERE rn <= {k}
        ),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM (SELECT DISTINCT event_type FROM kept) a
          JOIN (SELECT DISTINCT event_type FROM kept) b
            ON a.event_type < b.event_type
        ),
        u AS (
          SELECT type_a, type_b, hv,
                 row_number() OVER (PARTITION BY type_a, type_b
                                    ORDER BY hv) AS rn
          FROM (
            SELECT DISTINCT p.type_a, p.type_b, kk.hv
            FROM pairs p
            JOIN kept kk
              ON kk.event_type = p.type_a OR kk.event_type = p.type_b
          )
        ),
        v AS (SELECT * FROM u WHERE rn <= {k}),
        stats AS (
          SELECT type_a, type_b,
                 CAST(COUNT(*) AS BIGINT) AS nv,
                 MAX(hv) AS tau
          FROM v GROUP BY 1, 2
        ),
        inter AS (
          SELECT v.type_a, v.type_b, CAST(COUNT(*) AS BIGINT) AS n_inter
          FROM v
          JOIN kept ka ON ka.event_type = v.type_a AND ka.hv = v.hv
          JOIN kept kb ON kb.event_type = v.type_b AND kb.hv = v.hv
          GROUP BY 1, 2
        )
        SELECT s.type_a, s.type_b, s.nv AS n_union_kept,
               {sql_round_half_up(rho_raw)} AS jaccard_est,
               CASE WHEN nv < {k} THEN CAST(nv AS DOUBLE)
                    ELSE {sql_round_half_up(union_raw)} END AS union_est,
               {sql_round_half_up(f"({rho_raw}) * ({u_expr})")}
                 AS intersect_est
        FROM stats s
        LEFT JOIN inter i ON i.type_a = s.type_a AND i.type_b = s.type_b
        """


ORACLES["q_kmv_overlap"] = _kmv_overlap_oracle()


# J76 deterministic shard layout: salted 'shard:'/'ord:' md5 hashes
# (membership and order independent), row_number + running token sum in
# ONE window — mirror of corpus.shard_assign
ORACLES["q_shard_assign"] = """
    WITH t AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8 AS INTEGER) AS shard,
             CAST('0x' || substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS ord_h,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER w AS INTEGER) AS pos,
           n_tokens,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens
    FROM t
    WINDOW w AS (PARTITION BY shard ORDER BY ord_h, doc_id
                 ROWS UNBOUNDED PRECEDING)
    """


def _lsh_eval_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    truth_threshold: float = 0.5,
    sample_mod: int = 4,
) -> str:
    """Mirror of dedup.lsh_candidate_eval: the portable banded candidate
    set at est_threshold=0.0 (every banded collision), the exact
    shared-shingle Jaccard ground truth at `truth_threshold`, combined
    by FULL OUTER JOIN (both pair sets are distinct a<b) into the
    one-row precision/recall summary, all over the deterministic
    1/sample_mod 'eval:'-salted hash-sample. Spark realizes the same
    labeling as a tagged union + per-pair max; the counted sets are
    identical."""
    inner = _minhash_portable_oracle(num_hashes, bands, k, 0.0, "eval_docs")
    shingle = " || ' ' || ".join(
        "tk3[i]" if j == 0 else f"tk3[i+{j}]" for j in range(k)
    )
    return f"""
        WITH eval_docs AS (
          SELECT * FROM documents
          WHERE CAST('0x' || substr(md5('eval:' || CAST(doc_id AS VARCHAR)),
                     1, 8) AS BIGINT) % {sample_mod} = 0
        ),
        candidates AS (
          SELECT DISTINCT doc_a, doc_b FROM ({inner})
        ),
        toks3 AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk3
          FROM eval_docs
        ),
        idx3 AS (
          SELECT doc_id, tk3,
                 unnest(generate_series(1, len(tk3) - {k - 1})) AS i
          FROM toks3 WHERE len(tk3) >= {k}
        ),
        sh3 AS (SELECT DISTINCT doc_id, {shingle} AS s FROM idx3),
        sizes3 AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id),
        inter3 AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b
          FROM inter3
          JOIN sizes3 sa ON sa.doc_id = doc_a
          JOIN sizes3 sb ON sb.doc_id = doc_b
          WHERE floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common))
                      * 10000 + 0.5) / 10000 >= {truth_threshold}
        ),
        lab AS (
          SELECT CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS c,
                 CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS t
          FROM candidates c
          FULL OUTER JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
        ),
        agg AS (
          SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_truth,
                 CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_candidates,
                 CAST(COALESCE(SUM(c * t), 0) AS BIGINT) AS n_hits
          FROM lab
        )
        SELECT n_truth, n_candidates, n_hits,
               CASE WHEN n_candidates > 0 THEN
                 {sql_round_half_up("CAST(n_hits AS DOUBLE) / n_candidates")}
               END AS precision,
               CASE WHEN n_truth > 0 THEN
                 {sql_round_half_up("CAST(n_hits AS DOUBLE) / n_truth")}
               END AS recall
        FROM agg
        """


ORACLES["q_lsh_eval"] = _lsh_eval_oracle()


# J78 shares J26's oracle verbatim: both compute the same fixpoint
# (component minimum per node over the doc_id<50 candidate graph) by
# different iteration schemes — min-label (O(diameter) rounds) vs
# large-star/small-star (O(log n) rounds).
ORACLES["q_dup_clusters_bigstar"] = ORACLES["q_dup_clusters"]


# J79 per-source lexical diversity: token TTR + distinct-trigram ratio,
# zero-token/zero-trigram sources report NULL ratios and 0 counts —
# mirror of corpus.ngram_diversity
ORACLES["q_ngram_diversity"] = """
    WITH t AS (
      SELECT source, doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    base AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
      FROM t GROUP BY source
    ),
    tok AS (
      SELECT source, CAST(COUNT(DISTINCT tk) AS BIGINT) AS n_distinct_tokens
      FROM (SELECT source, unnest(toks) AS tk FROM t)
      GROUP BY source
    ),
    idx AS (
      SELECT source, doc_id, toks,
             unnest(generate_series(1, len(toks) - 2)) AS i
      FROM t WHERE len(toks) >= 3
    ),
    tri AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_trigrams,
             CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_trigrams
      FROM (SELECT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
            FROM idx)
      GROUP BY source
    )
    SELECT b.source, b.n_docs, b.n_tokens,
           CAST(COALESCE(tok.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
           CASE WHEN b.n_tokens > 0 THEN
             floor((CAST(tok.n_distinct_tokens AS DOUBLE) / b.n_tokens)
                   * 10000 + 0.5) / 10000
           END AS ttr,
           CAST(COALESCE(tri.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(tri.n_distinct_trigrams, 0) AS BIGINT)
             AS n_distinct_trigrams,
           CASE WHEN tri.n_trigrams > 0 THEN
             floor((CAST(tri.n_distinct_trigrams AS DOUBLE) / tri.n_trigrams)
                   * 10000 + 0.5) / 10000
           END AS trigram_ttr
    FROM base b
    LEFT JOIN tok ON tok.source IS NOT DISTINCT FROM b.source
    LEFT JOIN tri ON tri.source IS NOT DISTINCT FROM b.source
    """


def _window_funnel_oracle(
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window_seconds: int = 48 * 3600,
) -> str:
    """Mirror of analytics.window_funnel: every first-stage event is an
    anchor, each later stage takes the earliest event of its type
    strictly after the previous stage and within the anchor window
    (integer epoch-micro comparisons on both engines), a user counts at
    a level if any anchor chain reaches it."""
    w_us = int(window_seconds) * 1_000_000
    ctes = [
        "ev AS (SELECT user_id, epoch_us(ts) AS ep, event_type"
        " FROM events WHERE ts IS NOT NULL)",
        f"s1 AS (SELECT user_id, ep AS a0, ep AS t FROM ev"
        f" WHERE event_type = '{stages[0]}')",
    ]
    for i, s in enumerate(stages[1:], start=2):
        ctes.append(
            f"s{i} AS ("
            f" SELECT p.user_id, p.a0, MIN(e.ep) AS t"
            f" FROM s{i - 1} p JOIN ev e ON e.user_id = p.user_id"
            f" AND e.event_type = '{s}' AND e.ep > p.t"
            f" AND e.ep <= p.a0 + {w_us}"
            f" GROUP BY p.user_id, p.a0)"
        )
    selects = [
        f"SELECT {i + 1} AS stage_idx, '{s}' AS stage,"
        f" CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, s in enumerate(stages)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


ORACLES["q_window_funnel"] = _window_funnel_oracle()


# J80 PMI collocations: in-text adjacent bigrams, min_count-pruned,
# pmi = ln(n_ab * N_uni^2 / (N_bi * n_a * n_b)) with products
# left-associated exactly as the Spark expression — mirror of
# corpus.collocations
ORACLES["q_collocations"] = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM t WHERE len(toks) >= 2
    ),
    bi AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM idx GROUP BY 1, 2
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(n_w) AS DOUBLE) FROM uni) AS n_uni,
             (SELECT CAST(SUM(n_ab) AS DOUBLE) FROM bi) AS n_bi
    )
    SELECT b.w1, b.w2, b.n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
           floor(ln(CAST(b.n_ab AS DOUBLE) * t.n_uni * t.n_uni
                    / (t.n_bi * CAST(ua.n_w AS DOUBLE)
                       * CAST(ub.n_w AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS pmi
    FROM bi b
    CROSS JOIN tot t
    JOIN uni ua ON ua.w = b.w1
    JOIN uni ub ON ub.w = b.w2
    WHERE b.n_ab >= 5
    """


# L48 mutual information source x lang: the J71 pinned micro-nat lattice
# (cell ln-ratio pinned, p-weighted contribution pinned again, order-free
# int64 sums), NMI = mi/sqrt(ha*hb) over the exact micro sums — mirror of
# analytics.mutual_information
ORACLES["q_mutual_info"] = """
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS observed
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    rt AS (SELECT source, SUM(observed) AS r FROM cells GROUP BY source),
    ct AS (SELECT lang, SUM(observed) AS c FROM cells GROUP BY lang),
    g AS (SELECT SUM(observed) AS n FROM cells),
    mi AS (
      SELECT
        CAST(SUM(CAST(floor(
          (CAST(observed AS DOUBLE) / CAST(n AS DOUBLE))
          * CAST(CAST(floor(ln(CAST(observed AS DOUBLE) * CAST(n AS DOUBLE)
                / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) + 0.5) AS BIGINT))
          AS BIGINT) AS mi_micro,
        CAST(COUNT(*) AS BIGINT) AS n_cells,
        CAST(MAX(n) AS BIGINT) AS n
      FROM cells
      JOIN rt USING (source)
      JOIN ct USING (lang)
      CROSS JOIN g
    ),
    ha AS (
      SELECT CAST(-SUM(CAST(floor(
        (CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        * CAST(CAST(floor(ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) + 0.5) AS BIGINT))
        AS BIGINT) AS ha_micro
      FROM rt CROSS JOIN g
    ),
    hb AS (
      SELECT CAST(-SUM(CAST(floor(
        (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        * CAST(CAST(floor(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) + 0.5) AS BIGINT))
        AS BIGINT) AS hb_micro
      FROM ct CROSS JOIN g
    )
    SELECT mi.n, mi.n_cells,
           floor((CAST(mi_micro AS DOUBLE) / 1000000.0) * 1000000 + 0.5)
             / 1000000 AS mi_nats,
           floor((CAST(ha_micro AS DOUBLE) / 1000000.0) * 1000000 + 0.5)
             / 1000000 AS h_a,
           floor((CAST(hb_micro AS DOUBLE) / 1000000.0) * 1000000 + 0.5)
             / 1000000 AS h_b,
           CASE WHEN ha_micro > 0 AND hb_micro > 0 THEN
             floor((CAST(mi_micro AS DOUBLE) / 1000000.0)
                   / sqrt((CAST(ha_micro AS DOUBLE) / 1000000.0)
                          * (CAST(hb_micro AS DOUBLE) / 1000000.0))
                   * 10000 + 0.5) / 10000
           END AS nmi
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """


# L49 quality expectations: the J48 profile as a CTE + the literal check
# suite joined on (col_name, metric), derived null_fraction/uniqueness
# ratios 6dp, fail-closed on uncomputed metrics — mirror of
# analytics.quality_checks
ORACLES["q_quality_checks"] = f"""
    WITH prof AS ({ORACLES["q_data_profile"]}),
    rows_row AS (
      SELECT value AS n_rows FROM prof
      WHERE col_name = 'rows' AND metric = 'rows'
    ),
    ext AS (
      SELECT col_name, metric, value FROM prof
      UNION ALL
      SELECT col_name, 'null_fraction',
             CASE WHEN n_rows > 0
                  THEN floor(value / n_rows * 1000000 + 0.5) / 1000000 END
      FROM prof CROSS JOIN rows_row WHERE metric = 'nulls'
      UNION ALL
      SELECT col_name, 'uniqueness',
             CASE WHEN n_rows > 0
                  THEN floor(value / n_rows * 1000000 + 0.5) / 1000000 END
      FROM prof CROSS JOIN rows_row WHERE metric = 'distinct'
    ),
    checks(col_name, metric, op, threshold) AS (VALUES
      ('event_id', 'nulls', '==', 0.0),
      ('ts', 'null_fraction', '<=', 0.001),
      ('event_type', 'distinct', '<=', 10.0),
      ('user_id', 'uniqueness', '<', 0.5),
      ('value', 'min', '>=', -1000000.0),
      ('rows', 'rows', '>=', 100.0),
      ('user_id', 'distinct', '>=', 1000000.0),
      ('props', 'distinct', '>', 0.0)
    )
    SELECT c.col_name, c.metric, c.op,
           CAST(c.threshold AS DOUBLE) AS threshold, e.value,
           COALESCE(CASE c.op
                      WHEN '<=' THEN e.value <= c.threshold
                      WHEN '>=' THEN e.value >= c.threshold
                      WHEN '==' THEN e.value = c.threshold
                      WHEN '<'  THEN e.value < c.threshold
                      ELSE e.value > c.threshold
                    END, FALSE) AS passed
    FROM checks c
    LEFT JOIN ext e ON e.col_name = c.col_name AND e.metric = c.metric
    """

# J51b: round-1 BPE pair statistics — the trainer's per-iteration
# aggregate. Round-1 symbols are single characters, so the twin is
# substr arithmetic over the identical word-frequency table.
ORACLES["q_bpe_pair_counts"] = """
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    pos AS (
      SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
      FROM words WHERE length(w) >= 2
    )
    SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r,
           CAST(SUM(n) AS BIGINT) AS cnt
    FROM pos GROUP BY 1, 2
    """

# J58b: one pinned power-iteration step over the DIRECTED near-dup
# pair graph (doc_id < 200, jaccard >= 0.2 — the q_triangles CTE).
# Integer semantics mirror graph.pagerank_step_pinned verbatim:
# r0 = scale // N, per-edge send r0 // deg, dangling share
# (r0 * n_dangling) // N, rank = 15*scale // (100*N)
# + 85*(recv + share) // 100 — all BIGINT, zero float drift.
ORACLES["q_pagerank_step"] = """
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ),
    idx AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM docs WHERE len(toks) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM idx
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    e AS (
      SELECT DISTINCT doc_a AS s, doc_b AS d
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common))
                  * 10000 + 0.5) / 10000 >= 0.2
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    -- n > 0 guard: the Spark side returns an empty frame for an empty
    -- graph; the division must not run (r0 empty => share/recv empty
    -- => the final cross join yields the same empty result)
    r0 AS (SELECT CAST(1000000000000 // n AS BIGINT) AS r FROM nn WHERE n > 0),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY s),
    dang AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM nodes
      WHERE node NOT IN (SELECT s FROM deg)
    ),
    share AS (
      SELECT CAST((r0.r * dang.nd) // nn.n AS BIGINT) AS sh
      FROM r0, dang, nn
    ),
    recv AS (
      SELECT e.d AS node, CAST(SUM(r0.r // deg.dg) AS BIGINT) AS rc
      FROM e JOIN deg ON e.s = deg.s, r0
      GROUP BY e.d
    )
    SELECT nodes.node,
           CAST((15 * 1000000000000) // (100 * nn.n)
                + (85 * (COALESCE(recv.rc, 0) + share.sh)) // 100
                AS BIGINT) AS rank_pinned
    FROM nodes LEFT JOIN recv ON nodes.node = recv.node, nn, share
    """

# J14b: the audio encode->decode->feature chain, mirrored from the
# characters directly — one sample per codepoint (mod 256, centered at
# 128). rms = floor-sqrt of the integer mean square (exact for this
# value range), zero crossings count sign flips of the nonzero samples
# in character order.
ORACLES["q_audio_features"] = """
    WITH chars AS (
      SELECT doc_id,
             unnest(generate_series(1, length(text))) AS i
      FROM documents
    ),
    v AS (
      SELECT doc_id, i,
             (ascii(substr(d.text, i, 1)) % 256) - 128 AS s
      FROM chars JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS ssq,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(abs(s)) AS INT) AS peak
      FROM v GROUP BY doc_id
    ),
    nz AS (
      SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE -1 END AS sgn
      FROM v WHERE s <> 0
    ),
    zc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS zero_crossings
      FROM (
        SELECT doc_id, sgn,
               lag(sgn) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM nz
      ) WHERE prev IS NOT NULL AND sgn <> prev
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(floor(sqrt(CAST(agg.ssq // agg.n AS DOUBLE))), 0)
                AS BIGINT) AS rms,
           CAST(COALESCE(agg.peak, 0) AS INT) AS peak,
           CAST(COALESCE(zc.zero_crossings, 0) AS BIGINT) AS zero_crossings
    FROM documents d
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    LEFT JOIN zc ON d.doc_id = zc.doc_id
    """

# J14: the image encode->decode->measure chain, mirrored from the
# characters — 16-wide grayscale rows, zero padding contributes 0 to
# the sum and never raises the max (codepoints % 256 >= 0).
ORACLES["q_image_decode_stats"] = """
    WITH v AS (
      SELECT doc_id,
             ascii(substr(d.text, i, 1)) % 256 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(s) AS BIGINT) AS pix_sum,
             CAST(MAX(s) AS INT) AS pix_max
      FROM v GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(16 AS INT) AS width,
           CAST(greatest(1, (length(d.text) + 15) // 16) AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(COALESCE(agg.pix_sum, 0) AS BIGINT) AS pix_sum,
           CAST(COALESCE(agg.pix_max, 0) AS INT) AS pix_max
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

# J81: WARC response-record extraction — the container round-trip is
# lossless, so the fields mirror the text directly (content_len is
# UTF-8 BYTES, hence octet_length over the encoded blob).
ORACLES["q_warc_extract"] = """
    SELECT doc_id,
           'response' AS record_type,
           'urn:doc:' || CAST(doc_id AS VARCHAR) AS uri,
           CAST(octet_length(encode(text)) AS BIGINT) AS content_len,
           substr(text, 1, 16) AS body_prefix
    FROM documents
    """

# J14c: PNG round-trip — the encode->DEFLATE->decode->measure chain is
# lossless, so the oracle is the SAME character-level arithmetic as the
# PGM chain (16-wide grayscale rows, zero padding): any defect in the
# filter/unfilter or inflate path breaks the hash.
ORACLES["q_png_roundtrip_stats"] = """
    WITH v AS (
      SELECT doc_id,
             ascii(substr(d.text, i, 1)) % 256 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(s) AS BIGINT) AS pix_sum,
             CAST(MAX(s) AS INT) AS pix_max
      FROM v GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(16 AS INT) AS width,
           CAST(greatest(1, (length(d.text) + 15) // 16) AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(COALESCE(agg.pix_sum, 0) AS BIGINT) AS pix_sum,
           CAST(COALESCE(agg.pix_max, 0) AS INT) AS pix_max
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

# J14f: the LOSSY codec's exactness anchor — each codepoint is one
# constant 8x8 block (64 identical pixels), 8 blocks per 64-px-wide
# row, zero blocks padding the last row; quant step 8 makes the DC
# path bit-exact, so the oracle is pure character arithmetic.
ORACLES["q_jpeg_roundtrip_stats"] = """
    WITH docs4 AS (
      SELECT * FROM documents WHERE doc_id % 4 = 0
    ),
    v AS (
      SELECT doc_id,
             ascii(substr(d.text, i, 1)) % 256 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM docs4
      ) JOIN docs4 d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(64 * SUM(s) AS BIGINT) AS pix_sum,
             CAST(MAX(s) AS INT) AS pix_max
      FROM v GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(64 AS INT) AS width,
           CAST(8 * greatest(1, (length(d.text) + 7) // 8) AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(COALESCE(agg.pix_sum, 0) AS BIGINT) AS pix_sum,
           CAST(COALESCE(agg.pix_max, 0) AS INT) AS pix_max
    FROM docs4 d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

# J14h: the progressive chain shares the baseline JPEG oracle — the
# successive-approximation split is lossless for constant blocks, so
# the same constant-8x8-block arithmetic gates the SOF2 path.
ORACLES["q_jpeg_progressive_stats"] = ORACLES["q_jpeg_roundtrip_stats"]

# J14g: GIF/LZW is lossless and the grayscale palette maps index v to
# RGB (v, v, v) — channels 3, pixel sum 3x the codepoint sum, max
# unchanged; 16-wide rows, zero padding as in the PGM/PNG chains.
ORACLES["q_gif_roundtrip_stats"] = """
    WITH v AS (
      SELECT doc_id,
             ascii(substr(d.text, i, 1)) % 256 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(3 * SUM(s) AS BIGINT) AS pix_sum,
             CAST(MAX(s) AS INT) AS pix_max
      FROM v GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(16 AS INT) AS width,
           CAST(greatest(1, (length(d.text) + 15) // 16) AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(COALESCE(agg.pix_sum, 0) AS BIGINT) AS pix_sum,
           CAST(COALESCE(agg.pix_max, 0) AS INT) AS pix_max
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

# J14d: G.711 µ-law expansion replayed in SQL bit arithmetic — the
# CCITT ulaw2linear(): complement the code byte, rebuild mantissa+bias
# (0x84), shift by the segment, strip the bias, apply the sign — then
# the same integer loudness features as q_audio_features.
ORACLES["q_g711_features"] = """
    WITH codes AS (
      SELECT doc_id, i,
             255 - (ascii(substr(d.text, i, 1)) % 256) AS u
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    v AS (
      SELECT doc_id, i,
             CASE WHEN (u & 128) <> 0
                  THEN 132 - ((((u & 15) << 3) + 132) << ((u & 112) >> 4))
                  ELSE ((((u & 15) << 3) + 132) << ((u & 112) >> 4)) - 132
             END AS s
      FROM codes
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS ssq,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(abs(s)) AS INT) AS peak
      FROM v GROUP BY doc_id
    ),
    nz AS (
      SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE -1 END AS sgn
      FROM v WHERE s <> 0
    ),
    zc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS zero_crossings
      FROM (
        SELECT doc_id, sgn,
               lag(sgn) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM nz
      ) WHERE prev IS NOT NULL AND sgn <> prev
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(floor(sqrt(CAST(agg.ssq // agg.n AS DOUBLE))), 0)
                AS BIGINT) AS rms,
           CAST(COALESCE(agg.peak, 0) AS INT) AS peak,
           CAST(COALESCE(zc.zero_crossings, 0) AS BIGINT) AS zero_crossings
    FROM documents d
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    LEFT JOIN zc ON d.doc_id = zc.doc_id
    """

# J14e: Y4M frame grammar — 8x8 mono frames (64 codepoints each, last
# frame zero-padded, empty text = one zero frame), every SECOND frame
# sampled; padding contributes 0 to y_sum and never raises y_max.
ORACLES["q_video_frame_stats"] = """
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(
               0,
               greatest(1, CAST(ceil(length(text) / 64.0) AS BIGINT)) - 1
             )) AS frame_idx
      FROM documents
    ),
    chars AS (
      SELECT doc_id, (i - 1) // 64 AS frame_idx,
             ascii(substr(d.text, i, 1)) % 256 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id, frame_idx,
             CAST(SUM(s) AS BIGINT) AS y_sum,
             CAST(MAX(s) AS INT) AS y_max
      FROM chars GROUP BY doc_id, frame_idx
    )
    SELECT f.doc_id,
           CAST(f.frame_idx AS INT) AS frame_idx,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(COALESCE(agg.y_sum, 0) AS BIGINT) AS y_sum,
           CAST(COALESCE(agg.y_max, 0) AS INT) AS y_max
    FROM f LEFT JOIN agg
      ON f.doc_id = agg.doc_id AND f.frame_idx = agg.frame_idx
    WHERE f.frame_idx % 2 = 0
    """

# J64b: the full PQ chain — deterministic per-subspace codebooks
# (lowest-16 vectors sliced 8 ways), encode by rounded-L2^2 argmin
# (ties -> lowest code id), ADC on the int64 micro lattice, shortlist
# of k*8 by (approx cos DESC, cand ASC), exact-cosine refine to top-k.
# Every accumulation is list_sum over ascending dims, matching the
# Spark side's sequential folds; every cross-row sum is over int64.
ORACLES["q_pq_topk"] = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
    ms AS (SELECT unnest(range(8)) AS m),
    cw AS (
      SELECT vec_id AS code_id, ms.m AS m,
             embedding[ms.m * 8 + 1 : ms.m * 8 + 8] AS w
      FROM embeddings, ms WHERE vec_id < 16
    ),
    cw2 AS (
      SELECT code_id, m, w,
             CAST(floor(list_sum(list_transform(w,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS w2_micro
      FROM cw
    ),
    sub AS (
      SELECT cand_id, ms.m AS m, cv[ms.m * 8 + 1 : ms.m * 8 + 8] AS s
      FROM c, ms
    ),
    dist AS (
      SELECT sub.cand_id, sub.m, cw2.code_id, cw2.w2_micro,
             floor(list_sum(list_transform(list_zip(s, w),
                    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                       * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                   * 10000 + 0.5) / 10000 AS d2
      FROM sub JOIN cw2 ON sub.m = cw2.m
    ),
    enc AS (
      SELECT cand_id, m, code_id, w2_micro FROM (
        SELECT *, row_number() OVER (
          PARTITION BY cand_id, m ORDER BY d2 ASC, code_id ASC) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    rn2 AS (
      SELECT cand_id, CAST(SUM(w2_micro) AS BIGINT) AS rn2_micro
      FROM enc GROUP BY cand_id
    ),
    qsub AS (
      SELECT query_id, ms.m AS m, qv[ms.m * 8 + 1 : ms.m * 8 + 8] AS qs
      FROM q, ms
    ),
    qd AS (
      SELECT query_id, qsub.m, cw2.code_id,
             CAST(floor(list_sum(list_transform(list_zip(qs, w),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS dot_micro
      FROM qsub JOIN cw2 ON qsub.m = cw2.m
    ),
    qn AS (
      SELECT query_id,
             sqrt(list_sum(list_transform(qv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
      FROM q
    ),
    adc AS (
      SELECT qd.query_id, enc.cand_id,
             CAST(SUM(qd.dot_micro) AS BIGINT) AS adc_micro
      FROM enc JOIN qd ON enc.m = qd.m AND enc.code_id = qd.code_id
      GROUP BY 1, 2
    ),
    approx AS (
      SELECT adc.query_id, adc.cand_id,
             floor((CAST(adc_micro AS DOUBLE) / 1000000.0)
                   / (qn.qnorm
                      * sqrt(CAST(rn2.rn2_micro AS DOUBLE) / 1000000.0))
                   * 10000 + 0.5) / 10000 AS acos_
      FROM adc
      JOIN qn USING (query_id)
      JOIN rn2 USING (cand_id)
      WHERE adc.query_id <> adc.cand_id
        AND qn.qnorm > 0 AND rn2.rn2_micro > 0
    ),
    short AS (
      SELECT query_id, cand_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY acos_ DESC, cand_id ASC) AS rn
        FROM approx
      ) WHERE rn <= 80
    ),
    ex AS (
      SELECT s.query_id, s.cand_id,
             floor(list_sum(list_transform(list_zip(q.qv, c.cv),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(q.qv,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(c.cv,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   * 10000 + 0.5) / 10000 AS cosine
      FROM short s
      JOIN q ON s.query_id = q.query_id
      JOIN c ON s.cand_id = c.cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
      FROM ex
    ) WHERE rnk <= 10
    """

ORACLES["q_bucketed_join"] = (
    # L50 mirror: the bucketed layout changes the physical plan, never
    # the answer — the oracle is the plain events ⋈ customer join.
    "SELECT c_mktsegment AS segment, COUNT(*) AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value "
    "FROM events JOIN customer ON user_id = c_custkey "
    "GROUP BY c_mktsegment"
)

ORACLES["q_bpe_encode_fixed"] = """
    -- J63b mirror: the fixed rules (t,h)(e,r)(i,n)(a,s)(o,u) are
    -- pairwise character-disjoint with unchained outputs, so the
    -- greedy left-to-right non-overlapping fold equals per-rule
    -- digram counts on the raw word: tokens = chars - sum of
    -- occurrences. replace() is itself greedy L2R non-overlapping,
    -- so (len - len(replace(w, d, ''))) // 2 IS the merge count.
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
      FROM documents
    ),
    enc AS (
      SELECT doc_id,
             COUNT(*) AS n_words,
             SUM(length(w)) AS n_chars,
             SUM(length(w)
                 - (length(w) - length(replace(w, 'th', ''))) // 2
                 - (length(w) - length(replace(w, 'er', ''))) // 2
                 - (length(w) - length(replace(w, 'in', ''))) // 2
                 - (length(w) - length(replace(w, 'as', ''))) // 2
                 - (length(w) - length(replace(w, 'ou', ''))) // 2
             ) AS n_bpe_tokens
      FROM words GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(enc.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(enc.n_chars, 0) AS BIGINT) AS n_chars,
           CAST(coalesce(enc.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id
    """

# J14i: FLAC is lossless, so its feature chain shares the PCM chain's
# character-level oracle verbatim — the stereo layouts synthesized by
# synth_flac_from_text use the REVERSED signal as the right channel,
# which preserves the sample multiset (rms/peak) and channel 0 (zc).
ORACLES["q_flac_features"] = ORACLES["q_audio_features"]


ORACLES["q_gif_anim_stats"] = """
    -- J14j mirror: 128-char frame bands on a 16x16 screen; composited
    -- frame k = own band + (previous band iff disposal==leave, i.e.
    -- even doc_id); gray palette expands to RGB (sum x3); background
    -- 0 never raises a max; empty docs emit one all-zero frame.
    WITH chars AS (
      SELECT doc_id, unnest(generate_series(1, length(text))) AS i
      FROM documents WHERE length(text) > 0
    ),
    chunk AS (
      SELECT c.doc_id, CAST((i - 1) // 128 AS BIGINT) AS f,
             SUM(ascii(substr(d.text, i, 1)) % 256) AS cs,
             MAX(ascii(substr(d.text, i, 1)) % 256) AS cm
      FROM chars c JOIN documents d ON c.doc_id = d.doc_id
      GROUP BY c.doc_id, f
    ),
    frames AS (
      SELECT doc_id, f, cs, cm,
             lag(cs) OVER (PARTITION BY doc_id ORDER BY f) AS pcs,
             lag(cm) OVER (PARTITION BY doc_id ORDER BY f) AS pcm
      FROM chunk
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(3 * (cs + CASE WHEN doc_id % 2 = 0
                               THEN coalesce(pcs, 0) ELSE 0 END)
                AS BIGINT) AS y_sum,
           CAST(greatest(cm, CASE WHEN doc_id % 2 = 0
                                  THEN coalesce(pcm, 0) ELSE 0 END)
                AS INT) AS y_max
    FROM frames
    UNION ALL
    SELECT doc_id, CAST(0 AS INT) AS frame_idx,
           CAST(0 AS BIGINT) AS y_sum, CAST(0 AS INT) AS y_max
    FROM documents WHERE length(text) = 0
    """

ORACLES["q_apng_anim_stats"] = """
    -- J14k mirror: identical carryover algebra to the GIF chain but
    -- single-channel (no palette->RGB x3): frame k = own band's char
    -- sum + previous band's iff dispose==none (even doc_id).
    WITH chars AS (
      SELECT doc_id, unnest(generate_series(1, length(text))) AS i
      FROM documents WHERE length(text) > 0
    ),
    chunk AS (
      SELECT c.doc_id, CAST((i - 1) // 128 AS BIGINT) AS f,
             SUM(ascii(substr(d.text, i, 1)) % 256) AS cs,
             MAX(ascii(substr(d.text, i, 1)) % 256) AS cm
      FROM chars c JOIN documents d ON c.doc_id = d.doc_id
      GROUP BY c.doc_id, f
    ),
    frames AS (
      SELECT doc_id, f, cs, cm,
             lag(cs) OVER (PARTITION BY doc_id ORDER BY f) AS pcs,
             lag(cm) OVER (PARTITION BY doc_id ORDER BY f) AS pcm
      FROM chunk
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(cs + CASE WHEN doc_id % 2 = 0
                          THEN coalesce(pcs, 0) ELSE 0 END
                AS BIGINT) AS y_sum,
           CAST(greatest(cm, CASE WHEN doc_id % 2 = 0
                                  THEN coalesce(pcm, 0) ELSE 0 END)
                AS INT) AS y_max
    FROM frames
    UNION ALL
    SELECT doc_id, CAST(0 AS INT) AS frame_idx,
           CAST(0 AS BIGINT) AS y_sum, CAST(0 AS INT) AS y_max
    FROM documents WHERE length(text) = 0
    """

ORACLES["q_avi_frame_stats"] = """
    -- J14l mirror: 64-char frames, every 2nd sampled; each codepoint
    -- is one DC-exact constant 8x8 block (sum = value x 64), padding
    -- blocks are zero and never raise the max; empty docs emit one
    -- all-zero frame (which index 0 always samples).
    WITH chars AS (
      SELECT doc_id, unnest(generate_series(1, length(text))) AS i
      FROM documents WHERE length(text) > 0
    ),
    chunk AS (
      SELECT c.doc_id, CAST((i - 1) // 64 AS BIGINT) AS f,
             SUM(ascii(substr(d.text, i, 1)) % 256) AS cs,
             MAX(ascii(substr(d.text, i, 1)) % 256) AS cm
      FROM chars c JOIN documents d ON c.doc_id = d.doc_id
      GROUP BY c.doc_id, f
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(64 * cs AS BIGINT) AS y_sum,
           CAST(cm AS INT) AS y_max
    FROM chunk WHERE f % 2 = 0
    UNION ALL
    SELECT doc_id, CAST(0 AS INT) AS frame_idx,
           CAST(0 AS BIGINT) AS y_sum, CAST(0 AS INT) AS y_max
    FROM documents WHERE length(text) = 0
    """


# J14m: the MPEG-1 Layer I level layer is integer-exact (the synth
# writes centered codepoints straight onto the quantization lattice),
# so the oracle is character arithmetic: frames of 384 levels with
# zero padding (adds 0 to the sum, never raises the absolute peak);
# n_samples is structural (384 per frame, the synthesis filterbank's
# output length).
ORACLES["q_mpeg1_features"] = """
    WITH v AS (
      SELECT doc_id,
             (ascii(substr(d.text, i, 1)) % 256) - 128 AS s
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(s) AS BIGINT) AS level_sum,
             CAST(MAX(ABS(s)) AS INT) AS level_peak
      FROM v GROUP BY doc_id
    ),
    fr AS (
      SELECT doc_id,
             GREATEST(1, (length(text) + 383) // 384) AS n_frames
      FROM documents
    )
    SELECT d.doc_id,
           CAST(fr.n_frames AS INT) AS n_frames,
           CAST(384 * fr.n_frames AS BIGINT) AS n_samples,
           CAST(COALESCE(agg.level_sum, 0) AS BIGINT) AS level_sum,
           CAST(COALESCE(agg.level_peak, 0) AS INT) AS level_peak
    FROM documents d
    JOIN fr USING (doc_id)
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

ORACLES["q_mpeg2_features"] = """
    WITH fr AS (
      SELECT doc_id,
             length(text) AS n,
             4 + doc_id % 3 AS k,
             GREATEST(
               1, (length(text) + 36 * (4 + doc_id % 3) - 1)
                  // (36 * (4 + doc_id % 3))
             ) AS f
      FROM documents
    ),
    v AS (
      SELECT d.doc_id, u.i,
             (ascii(substr(d.text, u.i, 1)) % 256) - 128 AS s,
             (ascii(substr(d.text, u.i, 1)) % 3) - 1 AS g
      FROM (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS i
        FROM documents
      ) u JOIN documents d USING (doc_id)
    ),
    agg AS (
      SELECT v.doc_id,
             SUM(v.s) AS char_sum,
             MAX(ABS(v.s)) AS char_peak,
             SUM(CASE WHEN v.i <= LEAST(fr.n, 36 * fr.f)
                      THEN v.g ELSE 0 END) AS g_sum,
             MAX(CASE WHEN v.i <= LEAST(fr.n, 36 * fr.f)
                      THEN ABS(v.g) ELSE 0 END) AS g_peak
      FROM v JOIN fr USING (doc_id)
      GROUP BY v.doc_id
    )
    SELECT fr.doc_id,
           CAST(fr.f AS INT) AS n_frames,
           CAST(1152 * fr.f AS BIGINT) AS n_samples,
           CAST(COALESCE(agg.char_sum + agg.g_sum, 0) AS BIGINT)
             AS level_sum,
           CAST(COALESCE(GREATEST(agg.char_peak, agg.g_peak), 0) AS INT)
             AS level_peak
    FROM fr LEFT JOIN agg USING (doc_id)
    """
