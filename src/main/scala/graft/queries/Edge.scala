package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining §2.2/§2.3 edge surfaces: bag-semantics set ops, ordered-set
  * (WITHIN GROUP) aggregates, decimal arithmetic, map functions, window
  * value functions with explicit frames, and typed-Dataset stateful
  * sessionization checked against a gaps-and-islands SQL oracle. */
object Edge {

  /** Portable 6-decimal rounding (see queries.Funcs). */
  private def r6s(x: String) = s"floor(($x) * 1000000 + 0.5) / 1e6"
  private def r6d(x: String) = s"CAST(floor(($x) * 1000000 + 0.5) AS BIGINT) / 1e6"

  val defs: Seq[Q] = Seq(

    // ---- Gap-based sessionization through the typed flatMapGroups
    // kernel (same fold the streaming flatMapGroupsWithState path uses);
    // the oracle is the classic gaps-and-islands SQL formulation.
    Q("q76_sessionize",
      (s, d) => {
        import org.apache.spark.sql.functions.col
        graft.streaming.Sessionize.runBatch(s, d)
          .orderBy(col("user_id"), col("start_s"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
          FROM events),
        o AS (
          SELECT user_id, epoch_s, value_c,
            CASE WHEN lag(epoch_s) OVER w IS NULL
                   OR epoch_s - lag(epoch_s) OVER w > 1800
                 THEN 1 ELSE 0 END AS brk
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, value_c)),
        sgrp AS (
          SELECT user_id, epoch_s, value_c,
            sum(brk) OVER (PARTITION BY user_id ORDER BY epoch_s, value_c
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
        SELECT user_id, CAST(min(epoch_s) AS BIGINT) AS start_s,
               CAST(max(epoch_s) AS BIGINT) AS end_s,
               count(*) AS n_events,
               CAST(sum(value_c) AS BIGINT) AS cents
        FROM sgrp GROUP BY user_id, sid
        ORDER BY user_id, start_s""")),

    // ---- As-of join (SURVEY §2.2 range/as-of row): for each 'view'
    // event, the most recent 'purchase' of the same user at or before it.
    // Spark side composes it scale-correctly — tag + union both streams,
    // one window pass per user carries the latest right-side row forward
    // (no range self-join) — and the oracle is DuckDB's NATIVE ASOF JOIN,
    // so the composition is checked against real as-of semantics.
    Q("q79_asof_join",
      (s, d) => Tables.sql(s, d, """
        WITH v AS (
          SELECT event_id, user_id,
                 unix_timestamp(ts) AS ts_s
          FROM events WHERE event_type = 'view'),
        p AS (
          SELECT user_id, unix_timestamp(ts) AS ts_s,
                 max(event_id) AS p_id
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, unix_timestamp(ts)),
        u AS (
          SELECT user_id, ts_s, event_id, CAST(NULL AS BIGINT) AS p_id,
                 1 AS is_left
          FROM v
          UNION ALL
          SELECT user_id, ts_s, CAST(NULL AS BIGINT), p_id, 0 AS is_left
          FROM p),
        m AS (
          SELECT user_id, ts_s, event_id, is_left,
            last_value(p_id) IGNORE NULLS OVER (
              PARTITION BY user_id
              ORDER BY ts_s, is_left, coalesce(event_id, p_id)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_p_id,
            last_value(CASE WHEN is_left = 0 THEN ts_s END) IGNORE NULLS OVER (
              PARTITION BY user_id
              ORDER BY ts_s, is_left, coalesce(event_id, p_id)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
          FROM u)
        SELECT event_id, user_id, ts_s, asof_p_id,
               ts_s - asof_ts AS gap_s
        FROM m WHERE is_left = 1 AND user_id <= 50
        ORDER BY event_id"""),
      Some("""
        WITH v AS (
          SELECT event_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
          FROM events WHERE event_type = 'view'),
        p AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                 CAST(max(event_id) AS BIGINT) AS p_id
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT))
        SELECT v.event_id, v.user_id, v.ts_s, p.p_id AS asof_p_id,
               v.ts_s - p.ts_s AS gap_s
        FROM v ASOF LEFT JOIN p
          ON v.user_id = p.user_id AND v.ts_s >= p.ts_s
        WHERE v.user_id <= 50
        ORDER BY v.event_id""")),

    // ---- RANGE (interval-containment) join, bucketized: points join
    // intervals via a month-bin equi-join + exact BETWEEN filter. Each
    // point carries ONE bin; each interval is exploded into every bin it
    // covers — so the join is an equi-join with bounded fan-out instead
    // of the inequality-only nested loop Spark would otherwise plan, and
    // no pair is ever produced twice (a matching pair meets only in the
    // point's bin). The oracle is the plain inequality join — identical
    // semantics, so the bucketing is proven lossless.
    Q("q98_range_join",
      (s, d) => {
        import s.implicits._
        val iv = Tables.t(s, d, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey", $"o_orderdate".as("start"),
            expr("o_orderdate + INTERVAL 30 DAYS").as("end"))
        val ivBins = iv.select($"o_orderkey", $"start", $"end",
          explode(expr(
            "sequence(date_trunc('MONTH', start), date_trunc('MONTH', end), interval 1 month)"))
            .as("bin"))
        val pts = Tables.t(s, d, "lineitem").filter($"l_suppkey" <= 2)
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate",
            date_trunc("MONTH", $"l_shipdate").as("bin"))
        pts.join(ivBins, Seq("bin"))
          .filter($"l_shipdate" >= $"start" && $"l_shipdate" <= $"end")
          .select($"o_orderkey", $"l_orderkey", $"l_linenumber",
            $"l_shipdate".cast("date").as("ship_d"))
          .orderBy($"o_orderkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber,
          CAST(l.l_shipdate AS DATE) AS ship_d
        FROM (SELECT o_orderkey, o_orderdate AS s,
                o_orderdate + INTERVAL 30 DAY AS e
              FROM orders WHERE o_orderkey < 200) o
        JOIN (SELECT l_orderkey, l_linenumber, l_shipdate
              FROM lineitem WHERE l_suppkey <= 2) l
          ON l.l_shipdate BETWEEN o.s AND o.e
        ORDER BY o.o_orderkey, l.l_orderkey, l.l_linenumber""")),

    // ---- DISTRIBUTED row_number over a LOW-CARDINALITY partition key
    // (graft.plans.DistributedRank): range-partition by the sort key,
    // local running index + metadata-sized offsets — identical numbers to
    // the window function (the oracle) but with cluster-wide parallelism
    // where the 5-key window (q10) is capped at 5 tasks.
    Q("q99_distributed_rank",
      (s, d) => {
        import s.implicits._
        val base = Tables.t(s, d, "orders")
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        graft.plans.DistributedRank.rowNumber(
          base, $"o_orderpriority",
          Seq(Q.cents($"o_totalprice").desc, $"o_orderkey".asc), "rn", 16)
          .filter($"rn" <= 3)
          .select($"o_orderpriority", $"o_orderkey",
            Q.cents($"o_totalprice").as("price_c"), $"rn")
          .orderBy($"o_orderpriority", $"rn")
      },
      Some("""
        SELECT o_orderpriority, o_orderkey, price_c, rn FROM (
          SELECT o_orderpriority, o_orderkey,
            CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                       o_orderkey ASC) AS BIGINT) AS rn
          FROM orders) t
        WHERE rn <= 3
        ORDER BY o_orderpriority, rn""")),

    // ---- LATERAL correlated subquery in FROM (§2.2 LATERAL row).
    Q("q77_lateral",
      (s, d) => Tables.sql(s, d, """
        SELECT c_custkey, c_mktsegment, t.max_price, t.n_orders
        FROM customer,
        LATERAL (SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_price,
                        count(*) AS n_orders
                 FROM orders WHERE o_custkey = c_custkey) t
        WHERE c_custkey <= 100
        ORDER BY c_custkey"""),
      Some("""
        SELECT c_custkey, c_mktsegment, t.max_price, t.n_orders
        FROM customer,
        LATERAL (SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_price,
                        count(*) AS n_orders
                 FROM orders WHERE o_custkey = c_custkey) t
        WHERE c_custkey <= 100
        ORDER BY c_custkey""")),

    // ---- GROUPS frames: missing in Spark AND DuckDB 1.0 ("not
    // implemented yet") — emulated exactly via dense_rank + rank-band
    // join on both sides; GroupsFrameSpec pins the semantics against a
    // hand-computed vector.
    Q("q78_groups_frame",
      (s, d) => Tables.sql(s, d, """
        WITH r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_quantity AS BIGINT) AS q,
                 dense_rank() OVER (PARTITION BY l_suppkey
                   ORDER BY CAST(l_quantity AS BIGINT)) AS dr
          FROM lineitem WHERE l_suppkey <= 2),
        g AS (
          SELECT l_suppkey, dr, sum(q) AS sq, count(*) AS c
          FROM r GROUP BY l_suppkey, dr)
        SELECT r.l_suppkey, r.l_orderkey, r.l_linenumber, r.q,
          CAST(sum(g.sq) AS BIGINT) AS groups_sum,
          CAST(sum(g.c) AS BIGINT) AS groups_n
        FROM r JOIN g
          ON g.l_suppkey = r.l_suppkey AND g.dr BETWEEN r.dr - 1 AND r.dr + 1
        GROUP BY r.l_suppkey, r.l_orderkey, r.l_linenumber, r.q
        ORDER BY r.l_suppkey, r.l_orderkey, r.l_linenumber"""),
      Some("""
        WITH r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_quantity AS BIGINT) AS q,
                 dense_rank() OVER (PARTITION BY l_suppkey
                   ORDER BY CAST(l_quantity AS BIGINT)) AS dr
          FROM lineitem WHERE l_suppkey <= 2),
        g AS (
          SELECT l_suppkey, dr, sum(q) AS sq, count(*) AS c
          FROM r GROUP BY l_suppkey, dr)
        SELECT r.l_suppkey, r.l_orderkey, r.l_linenumber, r.q,
          CAST(sum(g.sq) AS BIGINT) AS groups_sum,
          CAST(sum(g.c) AS BIGINT) AS groups_n
        FROM r JOIN g
          ON g.l_suppkey = r.l_suppkey AND g.dr BETWEEN r.dr - 1 AND r.dr + 1
        GROUP BY r.l_suppkey, r.l_orderkey, r.l_linenumber, r.q
        ORDER BY r.l_suppkey, r.l_orderkey, r.l_linenumber""")),

    // ---- Null-safe equality (IS [NOT] DISTINCT FROM) in filters and as
    // a join condition over keys with injected nulls.
    Q("q86_null_safe_eq",
      (s, d) => Tables.sql(s, d, """
        WITH a AS (
          SELECT n_nationkey, nullif(n_regionkey, 2) AS rk FROM nation),
        b AS (
          SELECT r_regionkey, nullif(r_regionkey, 2) AS rk, r_name FROM region)
        SELECT
          (SELECT count(*) FROM a WHERE rk IS DISTINCT FROM 1) AS n_distinct_from_1,
          (SELECT count(*) FROM a WHERE rk IS NOT DISTINCT FROM NULL) AS n_null_keys,
          (SELECT count(*) FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk) AS n_nullsafe_join,
          (SELECT count(*) FROM a JOIN b ON a.rk = b.rk) AS n_plain_join"""),
      Some("""
        WITH a AS (
          SELECT n_nationkey, nullif(n_regionkey, 2) AS rk FROM nation),
        b AS (
          SELECT r_regionkey, nullif(r_regionkey, 2) AS rk, r_name FROM region)
        SELECT
          (SELECT count(*) FROM a WHERE rk IS DISTINCT FROM 1) AS n_distinct_from_1,
          (SELECT count(*) FROM a WHERE rk IS NOT DISTINCT FROM NULL) AS n_null_keys,
          (SELECT count(*) FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk) AS n_nullsafe_join,
          (SELECT count(*) FROM a JOIN b ON a.rk = b.rk) AS n_plain_join""")),

    // ---- Bitwise aggregates + count_if + higher-moment statistics.
    Q("q85_bit_aggs",
      (s, d) => Tables.sql(s, d, s"""
        SELECT l_returnflag,
          CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS band,
          CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS bor,
          CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS bxor,
          count_if(l_quantity >= 25) AS n_big,
          ${r6s("skewness(l_quantity)")} AS skew,
          ${r6s("kurtosis(l_quantity)")} AS kurt
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some(s"""
        SELECT l_returnflag,
          CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS band,
          CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS bor,
          CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS bxor,
          CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_big,
          ${r6d("skewness(l_quantity) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0))")} AS skew,
          ${r6d("kurtosis_pop(l_quantity)")} AS kurt
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- INTERSECT ALL / EXCEPT ALL (bag semantics).
    Q("q69_setops_all",
      (s, d) => Tables.sql(s, d, """
        SELECT 'intersect_all' AS op, count(*) AS n FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 48
          INTERSECT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
        UNION ALL
        SELECT 'except_all' AS op, count(*) AS n FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 48
          EXCEPT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
        ORDER BY op"""),
      Some("""
        SELECT 'intersect_all' AS op, count(*) AS n FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 48
          INTERSECT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R') t1
        UNION ALL
        SELECT 'except_all' AS op, count(*) AS n FROM (
          SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 48
          EXCEPT ALL
          SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R') t2
        ORDER BY op""")),

    // ---- Ordered-set aggregates: percentile_cont/disc WITHIN GROUP.
    Q("q70_within_group",
      (s, d) => Tables.sql(s, d, """
        SELECT l_returnflag,
          floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
                * 1000000 + 0.5) / 1e6 AS pc50,
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS pd25
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
        SELECT l_returnflag,
          CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
               * 1000000 + 0.5) AS BIGINT) / 1e6 AS pc50,
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS pd25
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Decimal type: exact fixed-point arithmetic end to end (§1.2
    // Decimal(p,s) mapping). The decimal is constructed from exact integer
    // cents — never from a raw double — because Spark and DuckDB round
    // float noise differently when casting double→decimal (the Q.scala
    // determinism contract). cents × DECIMAL(3,2) 0.01 is exact decimal
    // multiplication in both engines (division would go through DOUBLE in
    // DuckDB); all aggregates then stay in decimal.
    // The aggregation pipeline stays entirely in DECIMAL (that is the
    // operator under test); only the FINAL projection re-serializes each
    // decimal as exact integer cents/ten-thousandths, because the driver's
    // comparator round-trips both sides through pandas and NO decimal-typed
    // output column can hash-match there (DuckDB→pandas yields float64,
    // Spark parquet→pyarrow→pandas yields Decimal objects). Same
    // serialize-only-the-projection pattern as the array/struct queries.
    Q("q71_decimal",
      (s, d) => Tables.sql(s, d, """
        SELECT o_orderpriority,
          CAST(total * 100 AS BIGINT) AS total_c,
          CAST(max_disc * 10000 AS BIGINT) AS max_disc_c4,
          CAST(min_price * 100 AS BIGINT) AS min_price_c
        FROM (
          SELECT o_orderpriority,
            CAST(sum(price) AS DECIMAL(28,2)) AS total,
            CAST(max(price * CAST(0.9 AS DECIMAL(3,2))) AS DECIMAL(28,4)) AS max_disc,
            CAST(min(price) AS DECIMAL(18,2)) AS min_price
          FROM (
            SELECT o_orderpriority,
              CAST(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
                   * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS price
            FROM orders) t
          GROUP BY o_orderpriority) agg
        ORDER BY o_orderpriority"""),
      Some("""
        SELECT o_orderpriority,
          CAST(total * 100 AS BIGINT) AS total_c,
          CAST(max_disc * 10000 AS BIGINT) AS max_disc_c4,
          CAST(min_price * 100 AS BIGINT) AS min_price_c
        FROM (
          SELECT o_orderpriority,
            CAST(sum(price) AS DECIMAL(28,2)) AS total,
            CAST(max(price * CAST(0.9 AS DECIMAL(3,2))) AS DECIMAL(28,4)) AS max_disc,
            CAST(min(price) AS DECIMAL(18,2)) AS min_price
          FROM (
            SELECT o_orderpriority,
              CAST(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))
                   * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS price
            FROM orders) t
          GROUP BY o_orderpriority) agg
        ORDER BY o_orderpriority""")),

    // ---- Window value functions: nth_value, first/last with explicit
    // frames and IGNORE NULLS.
    Q("q73_window_values",
      (s, d) => Tables.sql(s, d, """
        SELECT l_suppkey, l_orderkey, l_linenumber,
          nth_value(CAST(l_quantity AS BIGINT), 2) OVER wf AS second_qty,
          last_value(CAST(l_quantity AS BIGINT)) OVER wf AS last_qty,
          first_value(nullif(CAST(l_quantity AS BIGINT), 1)) IGNORE NULLS
            OVER wf AS first_not_one
        FROM lineitem
        WHERE l_suppkey = 1
        WINDOW wf AS (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_orderkey, l_linenumber"""),
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
          nth_value(CAST(l_quantity AS BIGINT), 2) OVER wf AS second_qty,
          last_value(CAST(l_quantity AS BIGINT)) OVER wf AS last_qty,
          first_value(nullif(CAST(l_quantity AS BIGINT), 1) IGNORE NULLS)
            OVER wf AS first_not_one
        FROM lineitem
        WHERE l_suppkey = 1
        WINDOW wf AS (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- Statement surface: EXPLAIN / SET / SHOW TABLES / DESCRIBE run
    // and return rows (plan text differs per engine → rows-only check).
    Q("q74_statements",
      (s, d) => {
        Tables.register(s, d)
        val explainRows = s.sql(
          "EXPLAIN SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").count()
        val setRows = s.sql("SET spark.sql.shuffle.partitions").count()
        val showRows = s.sql("SHOW TABLES").count()
        val descRows = s.sql("DESCRIBE TABLE nation").count()
        import s.implicits._
        Seq(("explain", explainRows > 0), ("set", setRows > 0),
          ("show_tables", showRows > 0), ("describe", descRows > 0))
          .toDF("stmt", "returns_rows").orderBy("stmt")
      },
      // Plan text differs per engine, so the check is normalized to "each
      // statement class returned rows" — a trivially-oracled boolean table.
      Some("""
        SELECT * FROM (VALUES
          ('describe', true), ('explain', true),
          ('set', true), ('show_tables', true))
          t(stmt, returns_rows)
        ORDER BY stmt""")),

    // ---- Array set algebra + search (§2.3 nested-function rows:
    // array_except/intersect/union/position, string_to_array).
    Q("q75_array_setops",
      (s, d) => Tables.sql(s, d, """
        SELECT doc_id,
          array_join(array_sort(array_except(slice(split(text, ' '), 1, 12),
                                  slice(split(text, ' '), 5, 12))), ',') AS only_head,
          array_join(array_sort(array_intersect(slice(split(text, ' '), 1, 12),
                                     slice(split(text, ' '), 5, 12))), ',') AS both_parts,
          size(array_union(slice(split(text, ' '), 1, 12),
                           slice(split(text, ' '), 5, 12))) AS union_n,
          CAST(array_position(slice(split(text, ' '), 1, 12),
                              element_at(split(text, ' '), 3)) AS BIGINT) AS pos3
        FROM documents WHERE doc_id < 60 ORDER BY doc_id"""),
      Some("""
        SELECT doc_id,
          -- coalesce: duckdb array_to_string is NULL on [], spark's is ''
          coalesce(array_to_string(list_sort(list_distinct(list_filter(head,
            w -> NOT list_contains(mid, w)))), ','), '') AS only_head,
          coalesce(array_to_string(list_sort(list_distinct(list_filter(head,
            w -> list_contains(mid, w)))), ','), '') AS both_parts,
          CAST(len(list_distinct(list_concat(head, mid))) AS INT) AS union_n,
          CAST(coalesce(list_position(head, toks[3]), 0) AS BIGINT) AS pos3
        FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                     string_split(text, ' ')[1:12] AS head,
                     string_split(text, ' ')[5:16] AS mid
              FROM documents) t
        WHERE doc_id < 60 ORDER BY doc_id""")),

    // ---- Map construction, key/value extraction, element access.
    Q("q72_map_funcs",
      (s, d) => Tables.sql(s, d, """
        SELECT n_nationkey,
          map('key', CAST(n_nationkey AS STRING), 'name', n_name)['name'] AS m_name,
          array_join(array_sort(map_keys(
            map('a', n_nationkey, 'b', n_regionkey))), ',') AS keys_sorted,
          element_at(map('x', n_regionkey), 'x') AS m_val,
          size(map('a', 1, 'b', 2)) AS m_size
        FROM nation ORDER BY n_nationkey"""),
      Some("""
        SELECT n_nationkey,
          MAP(['key', 'name'], [CAST(n_nationkey AS VARCHAR), n_name])['name'][1] AS m_name,
          array_to_string(list_sort(map_keys(
            MAP(['a', 'b'], [n_nationkey, n_regionkey]))), ',') AS keys_sorted,
          element_at(MAP(['x'], [n_regionkey]), 'x')[1] AS m_val,
          CAST(cardinality(MAP(['a', 'b'], [1, 2])) AS INT) AS m_size
        FROM nation ORDER BY n_nationkey""")),

    // ---- PIVOT: rows → columns with an explicit value list (explicit so
    // the plan needs no value-discovery pre-pass — at scale an implicit
    // pivot costs an extra distinct scan). One partial→final aggregate;
    // DuckDB mirror is the equivalent conditional aggregation.
    Q("q105_pivot",
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "lineitem")
          .select($"l_returnflag", $"l_linestatus", Q.cents($"l_quantity").as("qc"))
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum($"qc"))
          .select($"l_returnflag",
            Q.unc(coalesce($"F", lit(0L))).as("qty_f"),
            Q.unc(coalesce($"O", lit(0L))).as("qty_o"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
          CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
            THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS qty_f,
          CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
            THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- UNPIVOT (columns → rows) via Dataset.unpivot (SQL UNPIVOT's
    // API twin): three measure columns melt into (metric, v) rows, then
    // aggregate per metric. Narrow map before the one aggregate shuffle.
    Q("q106_unpivot",
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "lineitem")
          .select($"l_returnflag",
            Q.cents($"l_quantity").as("qty"),
            Q.cents($"l_extendedprice").as("price"),
            Q.cents($"l_discount").as("disc"))
          .unpivot(Array($"l_returnflag"), Array($"qty", $"price", $"disc"),
            "metric", "v")
          .groupBy($"l_returnflag", $"metric")
          .agg(Q.unc(sum($"v")).as("total"))
          .orderBy($"l_returnflag", $"metric")
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag,
            CAST(round(l_quantity * 100) AS BIGINT) AS qty,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
            CAST(round(l_discount * 100) AS BIGINT) AS disc
          FROM lineitem),
        m AS (
          SELECT l_returnflag, 'qty' AS metric, qty AS v FROM c
          UNION ALL SELECT l_returnflag, 'price', price FROM c
          UNION ALL SELECT l_returnflag, 'disc', disc FROM c)
        SELECT l_returnflag, metric, CAST(sum(v) AS DOUBLE) / 100.0 AS total
        FROM m
        GROUP BY l_returnflag, metric
        ORDER BY l_returnflag, metric""")),

    // ---- Salted two-phase aggregate: the skew-mitigation pattern for
    // hot grouping keys (l_returnflag has 3 values — at 100 TB a plain
    // groupBy funnels a third of the fact table through one reducer).
    // Phase 1 shards each hot key across 16 deterministic salts
    // (l_orderkey % 16, so both engines derive the same shards); phase 2
    // combines the 48 partials. Results are exactly the unsalted
    // aggregate — the oracle IS the plain GROUP BY.
    Q("q107_skew_salt",
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "lineitem")
          .select($"l_returnflag", ($"l_orderkey" % 16).as("salt"),
            Q.cents($"l_quantity").as("qc"))
          .groupBy($"l_returnflag", $"salt")
          .agg(sum($"qc").as("s"), count(lit(1)).as("n"))
          .groupBy($"l_returnflag")
          .agg(Q.unc(sum($"s")).as("sum_qty"), sum($"n").as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
          CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
          count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- SALTED SKEW JOIN (q107's discipline applied to the JOIN
    // side): a fact stream where one hot key carries ~80% of all rows
    // (declared skew map: l_orderkey%10 < 8 collapses to key 0) joins a
    // 100-row dim. Unsalted, every hot-key row lands in ONE reducer of
    // the shuffle join — the partition that never finishes at 100 TB.
    // The salt spell: fact rows carry salt = l_orderkey % 8, the dim
    // replicates ×8 (explode over the salt domain — dim cost is
    // |dim|·S, metadata-sized), and the join key widens to (k, salt) so
    // the hot key spreads over 8 reducers. The merge-join hint keeps
    // the demo in the SMJ regime the spell exists for (a dim this
    // small would otherwise broadcast and dodge the skew entirely;
    // past the broadcast threshold the salted shape is the writer-side
    // fix, complementing AQE's runtime skew split). The oracle is the
    // PLAIN unsalted join — salting is proven lossless.
    Q("q157_skew_salt_join",
      (s, d) => {
        import s.implicits._
        val fact = Tables.t(s, d, "lineitem")
          .select(
            when($"l_orderkey" % 10 < 8, 0L)
              .otherwise($"l_orderkey" % 100).as("k"),
            Q.cents($"l_extendedprice").as("pc"),
            ($"l_orderkey" % 8).cast("int").as("salt"))
        val dim = Tables.t(s, d, "orders")
          .groupBy(($"o_orderkey" % 100).as("k"))
          .agg(min($"o_orderpriority").as("attr"))
          .select($"k", $"attr", explode(expr("sequence(0, 7)")).as("salt"))
        fact.hint("merge").join(dim, Seq("k", "salt"))
          .groupBy($"attr")
          .agg(count(lit(1)).as("n"), Q.unc(sum($"pc")).as("revenue"))
          .orderBy($"attr")
      },
      Some("""
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                      ELSE l_orderkey % 100 END AS k,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
          FROM lineitem),
        dim AS (
          SELECT o_orderkey % 100 AS k, min(o_orderpriority) AS attr
          FROM orders GROUP BY 1)
        SELECT attr, count(*) AS n,
          CAST(sum(pc) AS DOUBLE) / 100.0 AS revenue
        FROM fact JOIN dim USING (k)
        GROUP BY attr ORDER BY attr""")),

    // ---- Z-ORDER LAYOUT (multi-dimensional clustering): the write-path
    // operator behind Delta's `OPTIMIZE … ZORDER BY` — cluster lineitem
    // on (l_partkey, l_suppkey) so per-file min/max stats are tight in
    // BOTH dims and either-dim predicates skip files (single-key sort
    // gives the second dim a ~full-range span in every file; DeltaStats
    // then prunes nothing for it — ZOrderSpec measures the difference).
    // Shape: dims normalize to a shared 8-bit grid via ONE cheap
    // columnar max pre-agg (corpus-derived scales, mismatched
    // bit-widths would let the wide dim dominate), the Morton key is 8
    // shift-mask ops (functions.ZOrder, map-only, codegen), and the
    // equal-count bucket id — the file id repartitionByRange(z) would
    // produce at write time — comes from plans.DistributedRank (q123's
    // range-exchange + broadcast offsets; NEVER a single-partition
    // global window). Output = the layout audit: per-bucket row count +
    // per-dim min/max/span, i.e. exactly the stats a file-skipping
    // reader sees.
    Q("q154_zorder_layout",
      (s, d) => {
        import s.implicits._
        val raw = Tables.t(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
        val m = raw.agg(max($"l_partkey").as("mp"), max($"l_suppkey").as("ms"),
          count(lit(1)).as("nt")).head()
        val (mp, ms, nt) = (m.getLong(0), m.getLong(1), m.getLong(2))
        val zt = raw.select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          graft.functions.ZOrder.morton(
            expr(s"l_partkey * 256 DIV ${mp + 1}"),
            expr(s"l_suppkey * 256 DIV ${ms + 1}")).as("z"))
        // the synthetic corpus does NOT have unique (l_orderkey,
        // l_linenumber) pairs — order by the full key so the rank is a
        // total order on both engines (the one surviving tie class is
        // byte-identical duplicate rows, which are interchangeable and
        // bucket-aggregate-invariant)
        graft.plans.DistributedRank.rowNumber(
            zt, lit(0L), Seq($"z".asc, $"l_orderkey".asc, $"l_linenumber".asc,
              $"l_partkey".asc, $"l_suppkey".asc),
            "rk", 32)
          .select(expr(s"CAST((rk - 1) * 32 DIV $nt AS BIGINT)").as("bucket"),
            $"l_partkey", $"l_suppkey")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
            min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"))
          .select($"bucket", $"n", $"min_p", $"max_p", $"min_s", $"max_s",
            ($"max_p" - $"min_p").as("span_p"), ($"max_s" - $"min_s").as("span_s"))
          .orderBy($"bucket")
      },
      Some(s"""
        WITH p AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms,
                          CAST(count(*) AS BIGINT) AS nt FROM lineitem),
        zt AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, nt,
                 ${graft.functions.ZOrder.mortonDuck(
                   "l_partkey * 256 // (mp + 1)",
                   "l_suppkey * 256 // (ms + 1)")} AS z
               FROM lineitem CROSS JOIN p),
        r AS (SELECT l_partkey, l_suppkey,
                (CAST(row_number() OVER
                   (ORDER BY z, l_orderkey, l_linenumber,
                             l_partkey, l_suppkey) AS BIGINT) - 1)
                  * 32 // nt AS bucket
              FROM zt)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
          min(l_partkey) AS min_p, max(l_partkey) AS max_p,
          min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
          max(l_partkey) - min(l_partkey) AS span_p,
          max(l_suppkey) - min(l_suppkey) AS span_s
        FROM r GROUP BY bucket ORDER BY bucket""")),

    // ---- INCREMENTAL LAYOUT ROUTING (q154 maintained under ingest):
    // boundaries train ONCE on the sealed corpus (l_orderkey % 7 != 0
    // — the q125 sealed/incoming discipline), then the arriving batch
    // routes through them WITHOUT re-ranking anything: bucket =
    // #{boundary tuples <= row tuple} under the layout's full-key
    // total order — the same streaming/StreamZRoute fold, here
    // oracle-checked (the stream spec proves stream == batch; this
    // query proves the routing math itself against DuckDB's
    // independent tuple-comparison spelling). Output = the ingest
    // audit: arrivals + z envelope per bucket. At 100 TB the sealed
    // rank pass is per layout EPOCH; each increment pays one map-only
    // pass over itself (31 tuple compares per row, a literal array).
    Q("q159_zroute_increment",
      (s, d) => {
        import s.implicits._
        val raw = Tables.t(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
            $"l_partkey", $"l_suppkey")
        val sealed0 = raw.where($"l_orderkey" % 7 =!= 0)
        val m = sealed0.agg(max($"l_partkey").as("mp"), max($"l_suppkey").as("ms"),
          count(lit(1)).as("nt")).head()
        val (mp, ms, nt) = (m.getLong(0), m.getLong(1), m.getLong(2))
        val zt = sealed0.withColumn("z", graft.functions.ZOrder.morton(
          expr(s"l_partkey * 256 DIV ${mp + 1}"),
          expr(s"l_suppkey * 256 DIV ${ms + 1}")))
        val ranked = graft.plans.DistributedRank.rowNumber(
          zt, lit(0L), Seq($"z".asc, $"l_orderkey".asc, $"l_linenumber".asc,
            $"l_partkey".asc, $"l_suppkey".asc), "rk", 32)
        val bs = graft.streaming.StreamZRoute.boundaries(ranked, 32, nt)
        graft.streaming.StreamZRoute
          .route(raw.where($"l_orderkey" % 7 === 0), bs, mp, ms)
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_arrivals"),
            min($"z").as("min_z"), max($"z").as("max_z"))
          .orderBy($"bucket")
      },
      Some(s"""
        WITH p AS (
          SELECT max(l_partkey) FILTER (l_orderkey % 7 <> 0) AS mp,
                 max(l_suppkey) FILTER (l_orderkey % 7 <> 0) AS ms,
                 CAST(count(*) FILTER (l_orderkey % 7 <> 0) AS BIGINT) AS nt
          FROM lineitem),
        zt AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
            l_partkey, l_suppkey, nt,
            ${graft.functions.ZOrder.mortonDuck(
              "l_partkey * 256 // (mp + 1)",
              "l_suppkey * 256 // (ms + 1)")} AS z
          FROM lineitem CROSS JOIN p),
        rs AS (
          SELECT *, CAST(row_number() OVER (ORDER BY z, l_orderkey,
            l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rk
          FROM zt WHERE l_orderkey % 7 <> 0),
        bnd AS (
          SELECT rs.z, rs.l_orderkey, rs.l_linenumber, rs.l_partkey, rs.l_suppkey
          FROM rs JOIN generate_series(1, 31) c(b)
            ON rs.rk = (b * rs.nt + 31) // 32 + 1),
        inc AS (
          SELECT *, row_number() OVER (ORDER BY z, l_orderkey,
            l_linenumber, l_partkey, l_suppkey) AS iid
          FROM zt WHERE l_orderkey % 7 = 0),
        routed AS (
          SELECT i.iid, any_value(i.z) AS z, count(b.z) AS bucket
          FROM inc i LEFT JOIN bnd b
            ON (b.z, b.l_orderkey, b.l_linenumber, b.l_partkey, b.l_suppkey)
               <= (i.z, i.l_orderkey, i.l_linenumber, i.l_partkey, i.l_suppkey)
          GROUP BY i.iid)
        SELECT CAST(bucket AS BIGINT) AS bucket,
          CAST(count(*) AS BIGINT) AS n_arrivals,
          min(z) AS min_z, max(z) AS max_z
        FROM routed GROUP BY bucket ORDER BY bucket"""))
  )
}
