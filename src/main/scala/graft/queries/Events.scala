package graft.queries

import graft.Tables

/** Round-10 event-analytics operators over the `events` stream: funnel
  * conversion and behavioral transition matrices — the product-analytics
  * surface an engine serving both a training-data pipeline and its
  * telemetry needs.
  *
  * Scale design (100 TB): every exchange is keyed on user_id (high
  * cardinality) or a tiny (type, type) pair; the funnel's step joins are
  * per-user equi-joins of per-user minima — linear, no window over a
  * low-cardinality key anywhere. Timestamps follow the q39 ns-events
  * contract: Spark reads ns-parquet through graft.Tables (µs truncation),
  * the oracle date_truncs to microseconds, and second-granularity
  * arithmetic uses the proven unix_timestamp ↔ floor(epoch) pairing.
  */
object Events {

  val defs: Seq[Q] = Seq(

    // ---- FUNNEL ANALYSIS: per first-view-day cohort, how many users
    // progressed view → click → purchase IN ORDER (each step strictly
    // after the previous user's step time — the sequential-conversion
    // semantics product funnels mean, not mere presence of all three
    // types). Steps are per-user minima joined per user: three
    // user-keyed aggregates + two user-keyed equi-joins, linear at any
    // scale. Conversion time is exact integer seconds (summed), with
    // the mean divided out as double only at the end.
    Q("q139_funnel",
      (s, d) => Tables.sql(s, d, """
        WITH v AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT date_format(v.t1, 'yyyy-MM-dd') AS cohort,
          count(*) AS n_viewed,
          count(c.user_id) AS n_clicked,
          count(p.user_id) AS n_purchased,
          coalesce(sum(CASE WHEN p.user_id IS NOT NULL
            THEN unix_timestamp(p.t3) - unix_timestamp(v.t1) END), 0)
            AS convert_s_total
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
        GROUP BY date_format(v.t1, 'yyyy-MM-dd')
        ORDER BY cohort"""),
      Some("""
        WITH e0 AS (
          SELECT user_id, event_type, date_trunc('microsecond', ts) AS ts
          FROM events),
        v AS (
          SELECT user_id, min(ts) AS t1 FROM e0
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM e0 e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM e0 e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT strftime(v.t1, '%Y-%m-%d') AS cohort,
          count(*) AS n_viewed,
          count(c.user_id) AS n_clicked,
          count(p.user_id) AS n_purchased,
          CAST(coalesce(sum(CASE WHEN p.user_id IS NOT NULL
            THEN CAST(floor(epoch(p.t3)) AS BIGINT)
               - CAST(floor(epoch(v.t1)) AS BIGINT) END), 0) AS BIGINT)
            AS convert_s_total
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
        GROUP BY strftime(v.t1, '%Y-%m-%d')
        ORDER BY cohort""")),

    // ---- EVENT-TYPE TRANSITION MATRIX: corpus-wide Markov bigram
    // counts over each user's time-ordered event stream (the behavioral
    // twin of q113's text collocations). The lag window partitions on
    // user_id (high-cardinality; ~tens of rows per partition) with the
    // (ts, event_id) total order; the transition rollup is a 25-key
    // aggregate. Probabilities divide exact counts as double at the end.
    Q("q140_transitions",
      (s, d) => Tables.sql(s, d, """
        WITH seq AS (
          SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, count(*) AS n,
          CAST(count(*) AS DOUBLE) /
            CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type, next_type"""),
      Some("""
        WITH seq AS (
          SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY date_trunc('microsecond', ts), event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, count(*) AS n,
          CAST(count(*) AS DOUBLE) /
            CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type, next_type"""))
  )
}
