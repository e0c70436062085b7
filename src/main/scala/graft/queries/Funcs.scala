package graft.queries

import graft.Tables

/** SURVEY §2.3 scalar-function family probes. Spark side and DuckDB oracle
  * are written in their own dialects (names differ: instr vs strpos,
  * size vs len, array_x vs list_x) but produce identical column names,
  * types and value bits.
  *
  * Transcendentals (exp, sin, ...) are not correctly-rounded and differ between
  * java.lang.Math and libm in the last bit, so both sides round through the
  * explicit IEEE-deterministic `floor(x*1e6 + 0.5)/1e6` (floor and double
  * mul/div are exact/correctly-rounded everywhere).
  */
object Funcs {

  /** Portable 6-decimal rounding: Spark spelling. floor() yields LONG. */
  private def r6s(x: String) = s"floor(($x) * 1000000 + 0.5) / 1e6"
  /** Portable 6-decimal rounding: DuckDB spelling (floor yields DOUBLE). */
  private def r6d(x: String) = s"CAST(floor(($x) * 1000000 + 0.5) AS BIGINT) / 1e6"

  val defs: Seq[Q] = Seq(

    // ---- String family.
    Q("q26_string_funcs",
      (s, d) => Tables.sql(s, d, """
        SELECT n_name,
          lower(n_name) AS lo, upper(lower(n_name)) AS up,
          length(n_name) AS len,
          substr(n_name, 1, 6) AS sub,
          concat(n_name, '_', CAST(n_nationkey AS STRING)) AS cat,
          concat_ws('-', n_name, 'x', 'y') AS catws,
          replace(n_name, 'NATION', 'N') AS repl,
          split_part(n_name, '_', 2) AS part2,
          instr(n_name, 'ION') AS pos,
          lpad(CAST(n_nationkey AS STRING), 4, '0') AS pad,
          rpad('x', 3, 'ab') AS rp,
          trim('  x  ') AS tr, ltrim('  x') AS ltr, rtrim('x  ') AS rtr,
          reverse(n_name) AS rev,
          repeat('ab', 3) AS rep,
          left(n_name, 3) AS l3, right(n_name, 2) AS r2,
          translate(n_name, 'NAT', 'nat') AS transl,
          ascii(n_name) AS asc_c, chr(65 + n_nationkey % 26) AS ch,
          levenshtein(n_name, 'NATION_1') AS lev,
          startswith(n_name, 'NATION') AS sw,
          endswith(n_name, '1') AS ew,
          contains(n_name, '_1') AS cont
        FROM nation ORDER BY n_name"""),
      Some("""
        SELECT n_name,
          lower(n_name) AS lo, upper(lower(n_name)) AS up,
          CAST(length(n_name) AS INT) AS len,
          substr(n_name, 1, 6) AS sub,
          concat(n_name, '_', CAST(n_nationkey AS VARCHAR)) AS cat,
          concat_ws('-', n_name, 'x', 'y') AS catws,
          replace(n_name, 'NATION', 'N') AS repl,
          split_part(n_name, '_', 2) AS part2,
          CAST(strpos(n_name, 'ION') AS INT) AS pos,
          lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS pad,
          rpad('x', 3, 'ab') AS rp,
          trim('  x  ') AS tr, ltrim('  x') AS ltr, rtrim('x  ') AS rtr,
          reverse(n_name) AS rev,
          repeat('ab', 3) AS rep,
          left(n_name, 3) AS l3, right(n_name, 2) AS r2,
          translate(n_name, 'NAT', 'nat') AS transl,
          CAST(ascii(n_name) AS INT) AS asc_c, chr(65 + n_nationkey % 26) AS ch,
          CAST(levenshtein(n_name, 'NATION_1') AS INT) AS lev,
          starts_with(n_name, 'NATION') AS sw,
          ends_with(n_name, '1') AS ew,
          contains(n_name, '_1') AS cont
        FROM nation ORDER BY n_name""")),

    // ---- Regex family (Java regex vs RE2 agree on these basic patterns).
    Q("q27_regex_funcs",
      (s, d) => Tables.sql(s, d, """
        SELECT p_name,
          p_name rlike '[0-9]+$' AS has_num,
          regexp_extract(p_name, '([0-9]+)', 1) AS first_num,
          regexp_replace(p_name, '[aeiou]', '*') AS starred,
          regexp_count(p_name, '[A-Z]') AS n_upper
        FROM part WHERE p_partkey <= 50 ORDER BY p_partkey"""),
      Some("""
        SELECT p_name,
          regexp_matches(p_name, '[0-9]+$') AS has_num,
          coalesce(regexp_extract(p_name, '([0-9]+)', 1), '') AS first_num,
          regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
          CAST(len(regexp_extract_all(p_name, '[A-Z]')) AS INT) AS n_upper
        FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""")),

    // ---- Date/time family over real timestamps.
    Q("q28_datetime_funcs",
      (s, d) => Tables.sql(s, d, """
        SELECT o_orderkey,
          CAST(extract(year FROM o_orderdate) AS INT) AS y,
          CAST(extract(month FROM o_orderdate) AS INT) AS mo,
          CAST(extract(day FROM o_orderdate) AS INT) AS dd,
          CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
          date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS mon_start,
          CAST(o_orderdate AS DATE) AS od,
          CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS od_plus30,
          CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
          unix_timestamp(o_orderdate) AS epoch_s,
          datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since,
          date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS fmt
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          CAST(extract(year FROM o_orderdate) AS INT) AS y,
          CAST(extract(month FROM o_orderdate) AS INT) AS mo,
          CAST(extract(day FROM o_orderdate) AS INT) AS dd,
          CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
          strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon_start,
          CAST(o_orderdate AS DATE) AS od,
          CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS od_plus30,
          last_day(CAST(o_orderdate AS DATE)) AS eom,
          CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""")),

    // ---- Math family (exact ops raw; transcendentals via portable r6).
    Q("q29_math_funcs",
      (s, d) => Tables.sql(s, d, s"""
        SELECT n_nationkey AS k,
          abs(-n_nationkey) AS a,
          CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ce,
          CAST(floor(n_nationkey / 4.0) AS BIGINT) AS fl,
          power(n_nationkey, 2) AS p2,
          sqrt(n_nationkey) AS sq,
          CAST(sign(n_nationkey - 10) AS INT) AS sg,
          mod(n_nationkey, 7) AS md,
          factorial(n_nationkey % 10) AS fac,
          ${r6s("exp(n_nationkey / 10e0)")} AS ex,
          ${r6s("ln(n_nationkey + 1)")} AS lnv,
          ${r6s("log10(n_nationkey + 1)")} AS lg10,
          ${r6s("log2(n_nationkey + 1)")} AS lg2,
          ${r6s("sin(n_nationkey / 5e0)")} AS sn,
          ${r6s("cos(n_nationkey / 5e0)")} AS cs,
          ${r6s("tan(n_nationkey / 9e0)")} AS tn,
          ${r6s("asin(n_nationkey / 25e0)")} AS asn,
          ${r6s("atan2(n_nationkey, 3)")} AS at2,
          ${r6s("degrees(n_nationkey / 10e0)")} AS dg,
          ${r6s("radians(n_nationkey)")} AS rd,
          pi() AS pv,
          isnan(CAST(n_nationkey AS DOUBLE)) AS nn
        FROM nation ORDER BY k"""),
      Some(s"""
        SELECT n_nationkey AS k,
          abs(-n_nationkey) AS a,
          CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ce,
          CAST(floor(n_nationkey / 4.0) AS BIGINT) AS fl,
          power(n_nationkey, 2) AS p2,
          sqrt(n_nationkey) AS sq,
          CAST(sign(n_nationkey - 10) AS INT) AS sg,
          mod(n_nationkey, 7) AS md,
          CAST(factorial(n_nationkey % 10) AS BIGINT) AS fac,
          ${r6d("exp(n_nationkey / 10e0)")} AS ex,
          ${r6d("ln(n_nationkey + 1)")} AS lnv,
          ${r6d("log10(n_nationkey + 1)")} AS lg10,
          ${r6d("log2(n_nationkey + 1)")} AS lg2,
          ${r6d("sin(n_nationkey / 5e0)")} AS sn,
          ${r6d("cos(n_nationkey / 5e0)")} AS cs,
          ${r6d("tan(n_nationkey / 9e0)")} AS tn,
          ${r6d("asin(n_nationkey / 25e0)")} AS asn,
          ${r6d("atan2(n_nationkey, 3)")} AS at2,
          ${r6d("degrees(n_nationkey / 10e0)")} AS dg,
          ${r6d("radians(n_nationkey)")} AS rd,
          pi() AS pv,
          isnan(CAST(n_nationkey AS DOUBLE)) AS nn
        FROM nation ORDER BY k""")),

    // ---- Conditional / null handling.
    Q("q30_conditional",
      (s, d) => Tables.sql(s, d, """
        SELECT o_orderkey,
          CASE WHEN o_totalprice > 300000 THEN 'high'
               WHEN o_totalprice > 100000 THEN 'mid'
               ELSE 'low' END AS bucket,
          CASE o_orderstatus WHEN 'F' THEN 'filled' WHEN 'O' THEN 'open'
               ELSE 'other' END AS status_w,
          coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS nn_status,
          ifnull(nullif(o_orderkey, 1), -1) AS ifn,
          nvl2(nullif(o_orderstatus, 'P'), 'notp', 'p') AS nv2,
          greatest(o_orderkey, o_custkey, 50) AS gr,
          least(o_orderkey, o_custkey, 50) AS ls
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          CASE WHEN o_totalprice > 300000 THEN 'high'
               WHEN o_totalprice > 100000 THEN 'mid'
               ELSE 'low' END AS bucket,
          CASE o_orderstatus WHEN 'F' THEN 'filled' WHEN 'O' THEN 'open'
               ELSE 'other' END AS status_w,
          coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS nn_status,
          ifnull(nullif(o_orderkey, 1), -1) AS ifn,
          CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 'notp' ELSE 'p' END AS nv2,
          greatest(o_orderkey, o_custkey, 50) AS gr,
          least(o_orderkey, o_custkey, 50) AS ls
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""")),

    // ---- Casting incl. :: syntax and TRY_CAST.
    Q("q31_cast",
      (s, d) => Tables.sql(s, d, """
        SELECT n_nationkey,
          CAST(n_nationkey AS STRING) AS s_key,
          CAST(CAST(n_nationkey AS STRING) AS INT) AS roundtrip,
          '42' :: INT AS colons,
          try_cast(n_name AS INT) AS bad_int,
          try_cast(concat(CAST(n_nationkey AS STRING), '.5') AS DOUBLE) AS good_dbl,
          CAST(n_nationkey AS DOUBLE) AS as_dbl,
          CAST(n_nationkey % 2 AS BOOLEAN) AS as_bool,
          CAST(NULL AS INT) AS null_int
        FROM nation ORDER BY n_nationkey"""),
      Some("""
        SELECT n_nationkey,
          CAST(n_nationkey AS VARCHAR) AS s_key,
          CAST(CAST(n_nationkey AS VARCHAR) AS INT) AS roundtrip,
          '42' :: INT AS colons,
          try_cast(n_name AS INT) AS bad_int,
          try_cast(concat(CAST(n_nationkey AS VARCHAR), '.5') AS DOUBLE) AS good_dbl,
          CAST(n_nationkey AS DOUBLE) AS as_dbl,
          CAST(n_nationkey % 2 AS BOOLEAN) AS as_bool,
          CAST(NULL AS INT) AS null_int
        FROM nation ORDER BY n_nationkey""")),

    // ---- Array functions over the embeddings list column (quantized to
    // exact ints where arithmetic is involved).
    Q("q32_array_funcs",
      (s, d) => Tables.sql(s, d, """
        SELECT vec_id,
          size(embedding) AS dim,
          aggregate(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)),
            CAST(0 AS BIGINT), (acc, x) -> acc + x) AS qsum,
          array_max(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))) AS qmax,
          array_min(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))) AS qmin,
          element_at(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)), 1) AS q1,
          size(array_distinct(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)))) AS ndist,
          array_contains(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10 + 0.5) AS BIGINT)), 1) AS has_one,
          array_join(transform(slice(transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)), 1, 3),
            x -> CAST(x AS STRING)), ',') AS first3,
          array_join(transform(slice(embedding, 1, 2),
            x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS STRING)), ',') AS joined,
          array_join(transform(sequence(1, 5), x -> CAST(x AS STRING)), ',') AS seq15
        FROM embeddings WHERE vec_id <= 50 ORDER BY vec_id"""),
      Some("""
        SELECT vec_id,
          CAST(len(embedding) AS INT) AS dim,
          CAST(list_sum(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))) AS BIGINT) AS qsum,
          list_max(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))) AS qmax,
          list_min(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))) AS qmin,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))[1] AS q1,
          CAST(len(list_distinct(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)))) AS INT) AS ndist,
          list_contains(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10 + 0.5) AS BIGINT)), 1) AS has_one,
          array_to_string(list_slice(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)), 1, 3), ',') AS first3,
          array_to_string(list_transform(list_slice(embedding, 1, 2),
            x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS joined,
          array_to_string(generate_series(1, 5), ',') AS seq15
        FROM embeddings WHERE vec_id <= 50 ORDER BY vec_id""")),

    // ---- Struct construction + field access. The struct itself is
    // serialized with to_json in the final projection ONLY because the
    // driver's comparator can't hash nested columns — the operator under
    // test (named_struct / field access) is unchanged.
    Q("q33_struct",
      (s, d) => Tables.sql(s, d, """
        SELECT n_nationkey,
          to_json(named_struct('key', n_nationkey, 'name', n_name)) AS st,
          named_struct('key', n_nationkey, 'name', n_name).name AS st_name,
          struct(n_nationkey, n_regionkey).n_nationkey AS anon_first
        FROM nation ORDER BY n_nationkey"""),
      Some("""
        SELECT n_nationkey,
          CAST(to_json({'key': n_nationkey, 'name': n_name}) AS VARCHAR) AS st,
          struct_extract({'key': n_nationkey, 'name': n_name}, 'name') AS st_name,
          struct_extract({'col1': n_nationkey, 'col2': n_regionkey}, 'col1') AS anon_first
        FROM nation ORDER BY n_nationkey""")),

    // ---- Crypto hash + hex/base64 encodings (stable cross-engine).
    Q("q34_hash_encode",
      (s, d) => Tables.sql(s, d, """
        SELECT doc_id,
          md5(text) AS h_md5,
          sha2(text, 256) AS h_sha256,
          hex(encode(substr(text, 1, 8), 'UTF-8')) AS hexed,
          base64(encode(substr(text, 1, 9), 'UTF-8')) AS b64
        FROM documents WHERE doc_id <= 100 ORDER BY doc_id"""),
      Some("""
        SELECT doc_id,
          md5(text) AS h_md5,
          sha256(text) AS h_sha256,
          upper(hex(encode(substr(text, 1, 8)))) AS hexed,
          to_base64(encode(substr(text, 1, 9))) AS b64
        FROM documents WHERE doc_id <= 100 ORDER BY doc_id""")),

    // ---- Lateral explode (UNNEST) with position.
    Q("q35_explode",
      (s, d) => Tables.sql(s, d, """
        SELECT doc_id, pos, tok
        FROM documents
        LATERAL VIEW posexplode(slice(split(text, ' '), 1, 5)) t AS pos, tok
        WHERE doc_id <= 20
        ORDER BY doc_id, pos"""),
      Some("""
        SELECT doc_id,
          CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
          unnest(toks) AS tok
        FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS toks
              FROM documents WHERE doc_id <= 20)
        ORDER BY doc_id, pos""")),

    // ---- Table function: range/generate_series as a relation.
    Q("q36_series",
      (s, d) => Tables.sql(s, d, """
        SELECT id AS n, id * id AS sq
        FROM range(1, 21)
        ORDER BY n"""),
      Some("""
        SELECT CAST(n AS BIGINT) AS n, CAST(n * n AS BIGINT) AS sq
        FROM generate_series(1, 20) AS t(n)
        ORDER BY n""")),

    // ---- Ordered array_agg / string_agg aggregates.
    Q("q37_array_agg",
      (s, d) => Tables.sql(s, d, """
        SELECT n_regionkey,
          array_join(transform(array_sort(collect_list(n_nationkey)),
            x -> CAST(x AS STRING)), ',') AS nations,
          concat_ws(',', array_sort(collect_list(n_name))) AS names,
          size(collect_set(n_nationkey % 5)) AS n_mod
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey"""),
      Some("""
        SELECT n_regionkey,
          array_to_string(list_sort(array_agg(n_nationkey)), ',') AS nations,
          string_agg(n_name, ',' ORDER BY n_name) AS names,
          CAST(len(list_distinct(array_agg(n_nationkey % 5))) AS INT) AS n_mod
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey""")),

    // ---- Batch time-bucketing over the events stream table (reference is
    // batch-only — SURVEY §2.4; date_bin ≡ date_trunc here).
    Q("q38_time_bucket",
      (s, d) => Tables.sql(s, d, """
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
          event_type,
          count(*) AS n,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
          count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY date_trunc('day', ts), event_type
        ORDER BY day, event_type"""),
      Some("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          event_type,
          count(*) AS n,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
          count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY date_trunc('day', ts), event_type
        ORDER BY day, event_type""")),

    // ---- Sessionization-flavor window over events: per-user event seq +
    // gap to previous event in seconds (batch analogue of streaming state).
    Q("q39_event_seq",
      (s, d) => Tables.sql(s, d, """
        SELECT user_id, event_id,
          row_number() OVER w AS seq,
          unix_timestamp(ts) - lag(unix_timestamp(ts)) OVER w AS gap_s
        FROM events
        WHERE user_id <= 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, seq"""),
      Some("""
        SELECT user_id, event_id,
          CAST(row_number() OVER w AS INT) AS seq,
          CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap_s
        FROM (SELECT user_id, event_id, date_trunc('microsecond', ts) AS ts
              FROM events WHERE user_id <= 10)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, seq"""))
  )
}
