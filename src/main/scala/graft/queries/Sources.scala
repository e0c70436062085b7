package graft.queries

import org.apache.spark.sql.functions._
import graft.{AdtContext, Tables}
import graft.sources.{DeltaReader, Fixtures}

/** SURVEY §2.1 source coverage: CSV / NDJSON / hive-partitioned parquet /
  * direct-URL tables / Delta (log replay, removes, partition values,
  * deletion vectors, checkpoints) — each scanned through the
  * `CREATE EXTERNAL TABLE` DDL shim or reader and oracle-checked against
  * the same rows read from the original parquet corpus. */
object Sources {

  /** The q177 SCD2 fixture history recomposed from the untouched corpus
    * (DuckDB dialect) — the ONE oracle spelling of what
    * [[Fixtures.deltaNationScd2]]'s three batches must have produced,
    * shared by q177 (history hash) and q178 (point-in-time join). */
  private val DuckScd2HistoryCtes = """
        v AS (
          SELECT n_nationkey, CAST(100 AS BIGINT) AS valid_from,
                 n_name, n_regionkey
          FROM nation
          UNION ALL
          SELECT n_nationkey, 200, n_name || '_V2', n_regionkey
          FROM nation WHERE n_nationkey % 3 = 0
          UNION ALL
          SELECT n_nationkey, 300,
            CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_V2'
                 ELSE n_name END,
            n_regionkey + 10
          FROM nation WHERE n_nationkey % 2 = 0
          UNION ALL
          SELECT 99, 300, 'NEW NATION', 0),
        hist AS (
          SELECT n_nationkey, valid_from,
            lead(valid_from) OVER (PARTITION BY n_nationkey
              ORDER BY valid_from) AS valid_to,
            n_name, n_regionkey
          FROM v)"""

  val defs: Seq[Q] = Seq(

    // ---- CSV via DDL with declared schema (listing.rs:83-108 semantics).
    Q("q55_csv_scan",
      (s, d) => {
        val dir = Fixtures.nationCsv(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"""CREATE EXTERNAL TABLE nation_csv
          (n_nationkey INT, n_name STRING, n_regionkey INT)
          STORED AS CSV OPTIONS(header='true') LOCATION '$dir'""")
        ctx.sql("""
          SELECT n_regionkey, count(*) AS n,
            CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
            min(n_name) AS first_name
          FROM nation_csv GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""
        SELECT n_regionkey, count(*) AS n,
          CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
          min(n_name) AS first_name
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- NDJSON via DDL with schema inference (listing.rs:67-82).
    Q("q56_ndjson_scan",
      (s, d) => {
        val dir = Fixtures.eventsNdjson(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(
          s"CREATE EXTERNAL TABLE events_json STORED AS NDJSON LOCATION '$dir'")
        ctx.sql("""
          SELECT event_type, count(*) AS n,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
            CAST(max(user_id) AS BIGINT) AS max_user
          FROM events_json GROUP BY event_type ORDER BY event_type""")
      },
      Some("""
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
          CAST(max(user_id) AS BIGINT) AS max_user
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- Hive-partitioned parquet: partition column comes back from the
    // directory layout; the filter prunes partitions, not just rows.
    Q("q57_partitioned_parquet",
      (s, d) => {
        val dir = Fixtures.lineitemPartitioned(s, d)
        s.read.parquet(dir)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .orderBy(col("l_linestatus"))
      },
      Some("""
        SELECT l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- Direct-URL table (enable_url_table ≡ Spark's
    // datasource.`path` syntax — SURVEY §1.1).
    Q("q58_url_table",
      (s, d) => s.sql(s"""
        SELECT o_orderpriority, count(*) AS n
        FROM parquet.`$d/orders.parquet`
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      Some("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta: log replay across commits incl. a remove action → live
    // set is rows 0..19.
    Q("q59_delta_scan",
      (s, d) => {
        val dir = Fixtures.deltaNation(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_delta STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT n_nationkey, n_name, n_regionkey
          FROM nation_delta ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation WHERE n_nationkey <= 19 ORDER BY n_nationkey""")),

    // ---- Delta with hive partitions: n_regionkey restored from
    // partitionValues, typed per the table schema, appended after file
    // columns (deltatable.rs:136-189 ordering).
    Q("q60_delta_partitioned",
      (s, d) => {
        val dir = Fixtures.deltaNationPartitioned(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_dp STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
          FROM nation_dp WHERE n_regionkey >= 1
          GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""
        SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM nation WHERE n_regionkey >= 1
        GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- Delta deletion vectors across all three storage types (inline
    // Z85, UUID-relative, absolute path): rows 1, 3, 9 and 19 are deleted
    // via DV row-index skipping.
    Q("q61_delta_dv",
      (s, d) => {
        val dir = Fixtures.deltaNationDv(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_dv STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT n_nationkey, n_name FROM nation_dv ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey NOT IN (1, 3, 9, 19) ORDER BY n_nationkey""")),

    // ---- Delta checkpoint: state = checkpoint parquet + JSON tail.
    Q("q62_delta_checkpoint",
      (s, d) => {
        val dir = Fixtures.deltaNationCheckpoint(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_cp STORED AS DELTA LOCATION '$dir'")
        ctx.sql("SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum FROM nation_cp")
      },
      Some("""
        SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum FROM nation""")),

    // ---- Delta V2 checkpoint: a UUID-named spec-v2 checkpoint keeps
    // its file actions in SIDECAR parquet files under
    // _delta_log/_sidecars (sidecar actions in the checkpoint name
    // them); replay = checkpoint inline state + sidecar adds + JSON
    // tail, with the remove in the tail dropping a sidecar-declared
    // file. This moves the reader PAST the reference's own gate
    // posture: delta-kernel 0.13 reads these, and now so does this
    // replay (previously a clean feature-gate reject).
    Q("q149_delta_v2_checkpoint",
      (s, d) => {
        val dir = Fixtures.deltaNationV2Checkpoint(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_v2cp STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT n_nationkey, n_name FROM nation_v2cp ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey >= 9 ORDER BY n_nationkey""")),

    // ---- Arrow IPC file scan (context.rs:42 parity) via the arrow-vector
    // classes inside Spark's own jars: footer-indexed record batches are
    // the parallelism unit. The fixture derives from nation, so the oracle
    // reads the same rows from the parquet corpus — every value of every
    // row must survive the arrow write→read round trip bit-for-bit.
    Q("q87_arrow_scan",
      (s, d) => {
        val dir = Fixtures.nationArrow(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE nation_arrow STORED AS ARROW LOCATION '$dir'")
        ctx.sql("""
          SELECT n_nationkey, n_name, n_regionkey
          FROM nation_arrow ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation ORDER BY n_nationkey""")),

    // ---- information_schema.{tables,columns} (context.rs:27 parity):
    // both views exercised in one statement; DuckDB's native
    // information_schema over the same registered tables is the oracle.
    Q("q88_info_schema",
      (s, d) => {
        Tables.register(s, d)
        val ctx = new AdtContext(s)
        ctx.sql("""
          SELECT c.table_name, c.column_name,
            CAST(c.ordinal_position AS BIGINT) AS pos
          FROM information_schema.columns c
          JOIN information_schema.tables t ON c.table_name = t.table_name
          WHERE c.table_name IN ('nation', 'region')
          ORDER BY c.table_name, pos""")
      },
      Some("""
        SELECT c.table_name, c.column_name,
          CAST(c.ordinal_position AS BIGINT) AS pos
        FROM information_schema.columns c
        JOIN information_schema.tables t ON c.table_name = t.table_name
        WHERE c.table_name IN ('nation', 'region')
        ORDER BY c.table_name, pos""")),

    // ---- Postgres-dialect regex operators (context.rs:29 sets the
    // postgres sqlparser dialect, so adt scripts reach `~` / `!~` /
    // `~*` / `~~` / `SIMILAR TO` through ADTContext::sql): the statement
    // below runs VERBATIM through AdtContext (SqlCompat rewrites the
    // operators onto RLIKE/LIKE spellings). The oracle spells the same
    // semantics in DuckDB functions — NOT DuckDB's own `~`, which is
    // regexp_full_match, unlike the PARTIAL match postgres/DataFusion/
    // RLIKE share — and pins that a `~` INSIDE a literal is untouched.
    Q("q117_pg_regex",
      (s, d) => {
        Tables.register(s, d)
        new AdtContext(s).sql("""
          SELECT n_name,
            n_name ~ '1[0-9]$' AS teens,
            n_name !~ '^NATION_[0-9]$' AS multi_digit,
            n_name ~* 'nation_2' AS ci_two,
            n_name ~~ '%1_' AS like_teens,
            CASE WHEN n_name SIMILAR TO 'NATION_(1|2)[0-9]' THEN 1 ELSE 0 END
              AS sim_2digit,
            'a~b' AS tilde_lit
          FROM nation ORDER BY n_name""")
      },
      Some("""
        SELECT n_name,
          regexp_matches(n_name, '1[0-9]$') AS teens,
          NOT regexp_matches(n_name, '^NATION_[0-9]$') AS multi_digit,
          regexp_matches(n_name, 'nation_2', 'i') AS ci_two,
          n_name LIKE '%1_' AS like_teens,
          CASE WHEN n_name SIMILAR TO 'NATION_(1|2)[0-9]' THEN 1 ELSE 0 END
            AS sim_2digit,
          'a~b' AS tilde_lit
        FROM nation ORDER BY n_name""")),

    // ---- ORC via DDL (Spark-native bonus format beyond the reference's
    // factory set — the q54-JSON posture applied to §2.1): Spark's
    // vectorized ORC reader carries the same columnar contract as
    // parquet — schema in the footer, column pruning, predicate pushdown
    // (the selective o_orderstatus filter reaches the ORC scan; at scale
    // the row-group stats skip like parquet's). Fixture = the orders
    // corpus rewritten as ORC; oracle = identical aggregate over the
    // original parquet rows, so the format round-trips bit-exactly.
    Q("q158_orc_scan",
      (s, d) => {
        val dir = Fixtures.ordersOrc(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE orders_orc STORED AS ORC LOCATION '$dir'")
        ctx.sql("""
          SELECT o_orderpriority, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders_orc
          WHERE o_orderstatus = 'F'
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta WRITE → read round trip: the table is produced by
    // graft's own committing writer (sources/DeltaWriter — staged data
    // files, hive partition dirs, one-pass per-file stats, atomic
    // versioned commits), two appends split by order-key parity, then
    // read back through the same DDL + DeltaReader path as q59-q62.
    // The oracle computes the identical aggregate over the ORIGINAL
    // parquet rows, so any row lost/duplicated/mistyped anywhere in the
    // write path (including partition values re-typed from the writer's
    // own paths) breaks the hash. The selective filter exercises the
    // written stats end-to-end: o_orderstatus min/max come from the
    // writer's aggregate and DeltaSnapshotFileIndex prunes with them.
    Q("q163_delta_write_roundtrip",
      (s, d) => {
        val dir = Fixtures.deltaOrdersWritten(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE orders_written STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT o_orderpriority, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders_written
          WHERE o_orderstatus = 'F'
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta MAINTENANCE life cycle round trip: the fixture table
    // has been appended twice, partition-backfilled (replacePartitions),
    // compacted into one clustered file per partition, checkpointed,
    // and vacuumed — five writer operations whose composed result must
    // STILL equal the original corpus row-for-row (the oracle computes
    // from the untouched parquet). Any loss/duplication/mistyping in
    // remove emission, compaction rewrite, checkpoint replay, or
    // vacuum's live-set diff breaks the hash. Grouped on o_orderstatus
    // so the aggregate cuts across the maintenance partitioning.
    Q("q164_delta_maintenance",
      (s, d) => {
        val dir = Fixtures.deltaOrdersMaintained(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE orders_maint STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT o_orderstatus, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders_maint
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Delta incremental CDC read: consume ONLY the second commit of
    // the written table (versions (0..1], the odd-orderkey append) as a
    // change feed — the incremental-ingest primitive that lets a
    // downstream materialization or a q159-style layout router process
    // new data without re-scanning the table. Partition columns restore
    // typed from the adds' partitionValues (one lit().cast() projection
    // per partition tuple in the window). Oracle = the odd half of the
    // original corpus, so a CDC feed that leaked version-0 rows (or
    // dropped a partition group) breaks the hash.
    Q("q165_delta_cdc_read",
      (s, d) => {
        val dir = Fixtures.deltaOrdersWritten(s, d)
        DeltaReader.loadChanges(s, dir, 0L, 1L)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 2 = 1
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Incremental aggregate maintenance under the oracle: the
    // fixture ran commit → refresh → commit → refresh, so the second
    // refresh folded ONLY the second commit's rows (the CDC feed) into
    // the materialization — and the final materialized rows must equal
    // the oracle's full aggregate over the original corpus exactly.
    // Any error in the CDC window, the partial-aggregate merge, or the
    // atomic overwrite publish breaks the hash. Reading the mv is a
    // metadata-sized delta scan (one tiny file).
    Q("q167_incremental_agg",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvm(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "total AS cents")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta MERGE (upsert): the fixture's base holds orders with
    // o_orderkey % 3 != 0; the merge source is every even-key order at
    // doubled o_totalprice, keyed on o_orderkey. Matched rows were
    // replaced, unmatched source rows inserted, untouched files carried
    // forward — so the final table is exactly (even keys at 2×) ∪ (odd
    // non-div-3 keys at 1×), which the oracle recomputes from the
    // original corpus. Any row lost/duplicated by the touched-file
    // discovery, the survivor anti-join, or the remove+add commit
    // breaks the hash. (o_totalprice*2 is an exact power-of-two double
    // scaling — bit-identical in both engines.)
    Q("q168_delta_merge",
      (s, d) => {
        val dir = Fixtures.deltaOrdersMerged(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM (
          SELECT o_orderpriority, o_totalprice * 2 AS o_totalprice
          FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL
          SELECT o_orderpriority, o_totalprice
          FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
        ) GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta DELETE WHERE: copy-on-write removal of every 5th 'F'
    // order; survivors must equal the oracle's negated-predicate filter
    // over the original corpus (three-valued logic is irrelevant here —
    // the corpus is null-free — but pinned in DeltaWriterSpec). Files
    // whose stats exclude the predicate were never rewritten.
    Q("q169_delta_delete",
      (s, d) => {
        val dir = Fixtures.deltaOrdersDeleted(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Delta UPDATE … SET … WHERE: copy-on-write halving of every
    // 'P' order's o_totalprice (exact power-of-two double scaling —
    // bit-identical across engines); non-matching rows in touched
    // files must pass through BIT-IDENTICAL, which the oracle's CASE
    // recomposition checks hash-exactly. Files whose stats exclude
    // the predicate were never rewritten.
    Q("q170_delta_update",
      (s, d) => {
        val dir = Fixtures.deltaOrdersUpdated(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(
            (CASE WHEN o_orderstatus = 'P' THEN o_totalprice / 2
                  ELSE o_totalprice END) * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Delta DELETE via DELETION VECTORS (merge-on-read): the same
    // predicate as q169 but NOTHING was rewritten — the writer emitted
    // roaring-bitmap vectors (+ the protocol escalation announcing the
    // reader feature) and the reader's executor-side DV anti-join
    // excludes the dead rows at scan time. Oracle identical to q169's
    // by construction, so any divergence isolates the vector path:
    // serialization, descriptor plumbing, or the anti-join.
    Q("q171_delta_dv_delete",
      (s, d) => {
        val dir = Fixtures.deltaOrdersDvDeleted(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- Delta UPDATE via DELETION VECTORS (merge-on-read): every
    // 'P' order's price doubled, but NOTHING was rewritten in place —
    // the matched rows died by writer-emitted vectors and the doubled
    // versions landed as new files in the same commit. The oracle
    // recomposes the doubled state from the untouched corpus; q170
    // pins the copy-on-write analogue, so a q184 divergence isolates
    // the vector + new-file path.
    Q("q184_delta_mor_update",
      (s, d) => {
        val dir = Fixtures.deltaOrdersMorUpdated(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(
            (CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 2
                  ELSE o_totalprice END) * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- SQL DML end-to-end: the fixture ran `DELETE FROM … WHERE` +
    // `UPDATE … SET … WHERE` as SQL STATEMENTS through AdtContext (the
    // CLI's execute path) — parser → registry lookup → writer verbs →
    // view re-registration. The oracle recomposes both mutations over
    // the original corpus; q169/q170 pin the same predicates through
    // the library calls, so a q172 divergence isolates the SQL layer.
    Q("q172_sql_dml",
      (s, d) => {
        val dir = Fixtures.deltaOrdersSqlDml(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(
            (CASE WHEN o_orderstatus = 'P' THEN o_totalprice / 2
                  ELSE o_totalprice END) * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- OPTIMIZE ZORDER round trip: the fixture table was appended in
    // two commits whose files each span the FULL (l_partkey, l_suppkey)
    // range (zero skipping on either dim), then rewritten by
    // DeltaWriter.optimizeZOrder into Morton-range-clustered files. The
    // hashed contract here is exactness through the rewrite — the
    // grouped aggregate over the optimized table must equal the oracle's
    // over the untouched corpus (any row lost, duplicated, or mistyped
    // by the z rewrite breaks the hash); the layout property itself
    // (tight per-file min/max in BOTH dims → either-dim predicates
    // prune through DeltaSnapshotFileIndex) is deterministic-free of
    // file boundaries and pinned in DeltaWriterSpec, the q154 split of
    // measure-vs-persist.
    Q("q176_delta_zorder",
      (s, d) => {
        val dir = Fixtures.deltaLineitemZOrdered(s, d)
        DeltaReader.load(s, dir)
          .groupBy((col("l_partkey") % 16).as("pk_band"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_suppkey")).cast("long").as("supp_sum"),
            sum(expr("CAST(round(l_quantity * 100) AS BIGINT)"))
              .cast("long").as("qty_cents"))
          .orderBy(col("pk_band"))
      },
      Some("""
        SELECT l_partkey % 16 AS pk_band, count(*) AS n,
          CAST(sum(l_suppkey) AS BIGINT) AS supp_sum,
          CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
            AS qty_cents
        FROM lineitem
        GROUP BY l_partkey % 16 ORDER BY pk_band""")),

    // ---- SNAPSHOT-MODE SCD2 (soft deletes): the fixture's second
    // batch was a COMPLETE extract holding only keys < 15, so keys ≥ 15
    // must be CLOSED with no successor (the soft delete an SCD2 history
    // records), the renamed %3==0 keys close + reopen, and the rest
    // stay open untouched. The oracle recomposes the exact history with
    // explicit validity stamps (no lead() window — a close-without-
    // successor has no following row to lead into).
    Q("q182_scd2_snapshot",
      (s, d) => {
        val dir = Fixtures.deltaNationScd2Snapshot(s, d)
        DeltaReader.load(s, dir)
          .select(col("n_nationkey"), col("valid_from"), col("valid_to"),
            col("n_name"), col("n_regionkey"))
          .orderBy(col("n_nationkey"), col("valid_from"))
      },
      Some("""
        SELECT n_nationkey, CAST(100 AS BIGINT) AS valid_from,
          CASE WHEN n_nationkey >= 15
                 OR (n_nationkey < 15 AND n_nationkey % 3 = 0)
               THEN CAST(200 AS BIGINT) ELSE NULL END AS valid_to,
          n_name, n_regionkey
        FROM nation
        UNION ALL
        SELECT n_nationkey, 200, NULL, n_name || '_V2', n_regionkey
        FROM nation WHERE n_nationkey < 15 AND n_nationkey % 3 = 0
        ORDER BY n_nationkey, valid_from""")),

    // ---- RESTORE round trip: the fixture deleted every 'F' order
    // (copy-on-write, v2) then restored to v1 — the grouped aggregate
    // over the restored table must equal the oracle over the untouched
    // corpus, 'F' rows included (a restore that missed a removed file,
    // re-added a wrong one, or failed to roll the delete back breaks
    // the hash). The deleted state remains time-travelable; the spec
    // pins that plus the DV-rollback and vacuumed-refusal edges.
    Q("q179_delta_restore",
      (s, d) => {
        val dir = Fixtures.deltaOrdersRestored(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- SCD TYPE-2 dimension history: the fixture dimension was
    // maintained through three scd2Apply batches (bootstrap → rename
    // batch with one unchanged re-delivery → region shift + brand-new
    // key). The hashed contract is the FULL history table — every
    // version window [valid_from, valid_to) per key, NULL = current —
    // against an oracle that recomposes the identical history from the
    // untouched corpus: explicit per-batch version rows + a lead()
    // window for the closing stamps. Any wrong close/open, a version
    // for the unchanged re-delivery, or a lost survivor breaks the
    // hash.
    Q("q177_scd2_history",
      (s, d) => {
        val dir = Fixtures.deltaNationScd2(s, d)
        DeltaReader.load(s, dir)
          .select(col("n_nationkey"), col("valid_from"), col("valid_to"),
            col("n_name"), col("n_regionkey"))
          .orderBy(col("n_nationkey"), col("valid_from"))
      },
      Some(s"""
        WITH $DuckScd2HistoryCtes
        SELECT n_nationkey, valid_from, valid_to, n_name, n_regionkey
        FROM hist
        ORDER BY n_nationkey, valid_from""")),

    // ---- POINT-IN-TIME dimension join (the read side of q177's SCD2
    // verb — "join each fact to the dim version that was current at the
    // fact's event time"): facts derive a key and a deterministic event
    // stamp from orders, the join is key-equi PLUS the validity-window
    // residual (valid_from <= ts < valid_to, NULL-open current) — which
    // is exactly how Spark executes it: ONE equi-join on the key with
    // the range as a post-join filter, dim history broadcast. The
    // grouped revenue by version-resolved name proves each fact bound
    // to the right version (a fact at ts=200 must see the _V2 rename,
    // one at ts=100 must not). Shapes at 100 TB: dim histories are
    // metadata-sized next to facts → broadcast; a giant dim would fall
    // back to the same equi-join shuffled on the key.
    Q("q178_scd2_pointintime",
      (s, d) => {
        val dir = Fixtures.deltaNationScd2(s, d)
        val hist = DeltaReader.load(s, dir)
        val f = Tables.t(s, d, "orders").select(
          (col("o_custkey") % 25).as("k"),
          (lit(100L) + (col("o_orderkey") % 3) * 100L).as("ts"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        f.join(broadcast(hist), f("k") === hist("n_nationkey") &&
            hist("valid_from") <= f("ts") &&
            (hist("valid_to").isNull || f("ts") < hist("valid_to")))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("cents"))
          .orderBy(col("n_name"))
      },
      Some(s"""
        WITH $DuckScd2HistoryCtes,
        f AS (
          SELECT o_custkey % 25 AS k,
            CAST(100 + (o_orderkey % 3) * 100 AS BIGINT) AS ts,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders)
        SELECT h.n_name AS n_name, count(*) AS n,
          CAST(sum(f.cents) AS BIGINT) AS cents
        FROM f JOIN hist h ON f.k = h.n_nationkey
          AND h.valid_from <= f.ts
          AND (h.valid_to IS NULL OR f.ts < h.valid_to)
        GROUP BY h.n_name
        ORDER BY n_name""")),

    // ---- FULL change-data-feed read over a NON-APPEND window: the
    // fixture's history is append → DV delete (%7) → CoW update (%5,
    // price doubled), and the query folds the whole feed (0..2] into a
    // signed per-priority net. The DV window must emit EXACTLY the
    // newly-dead rows (no survivor churn), and the CoW update commit
    // carries cdc actions, so the feed emits delta's own
    // update_preimage/update_postimage rows for exactly the matched
    // rows (postimage insert-signed, preimage retracting) — the oracle
    // recomputes the same net from the original corpus, so a leaked
    // survivor, a double-counted DV row, a mis-signed update image, or
    // a wrong-version event breaks the hash. This is the feed
    // IncrementalAgg consumes with retractions (q186).
    Q("q185_delta_cdf_read",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCdf(s, d)
        val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), 1L).otherwise(-1L)
        DeltaReader.loadChangeFeed(s, dir, 0L, 2L)
          .groupBy(col("o_orderpriority"))
          .agg(sum(sign).cast("long").as("n"),
            sum(sign * expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority,
          CAST(-sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n,
          CAST(sum(CASE
            WHEN o_orderkey % 7 = 0
              THEN -CAST(round(o_totalprice * 100) AS BIGINT)
            WHEN o_orderkey % 5 = 0
              THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
                 - CAST(round(o_totalprice * 100) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- COLUMN-MAPPED WRITER round trip: the fixture table was
    // CREATED in delta.columnMapping.mode=name by graft's own writer
    // (physical col-<uuid> names in the files, hive dirs, and
    // partitionValues), appended to, and then had o_custkey RENAMED to
    // customer_key — a metadata-only commit no unmapped layout could
    // express. The grouped aggregate over the renamed logical column,
    // read back through the DDL shim, must equal the oracle over the
    // original corpus: a wrong physical resolution reads nulls, a
    // missed partition-key mapping drops rows, a botched rename loses
    // the column entirely.
    Q("q187_delta_mapped_write",
      (s, d) => {
        val dir = Fixtures.deltaOrdersMapped(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE orders_mapped STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT o_orderpriority, count(*) AS n,
            CAST(sum(customer_key) AS BIGINT) AS csum
          FROM orders_mapped
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_custkey) AS BIGINT) AS csum
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- IVM WITH RETRACTIONS: the fixture refreshed the
    // materialization, then deleted (CoW %10=3), DV-deleted (%10=4),
    // updated (%10=5 doubled), and compacted the base, then refreshed
    // again — the second refresh consumed ONLY the signed change feed
    // (the compact window folds in nothing). The final mv rows must
    // hash-match the oracle's full recompute over the mutated corpus:
    // a missed retraction, a double-counted rewrite survivor, or a
    // maintenance-window leak breaks it.
    // ---- COLUMN-MAPPED ROW-VERB surface: the fixture drove the q187
    // layout through CoW DELETE (%7), merge-on-read DV delete (%11),
    // CoW UPDATE (%5 doubled), compact, and a full OPTIMIZE ZORDER —
    // every rewrite re-staged under the minted physical names. The
    // aggregate over the renamed logical column must equal the oracle's
    // recomposition from the original corpus: a rewrite staged under
    // LOGICAL names would read back all-null, a missed physical
    // partition key would drop whole hive dirs, and an unabsorbed DV
    // would resurrect the %11 rows.
    Q("q188_delta_mapped_verbs",
      (s, d) => {
        val dir = Fixtures.deltaOrdersMappedVerbs(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("customer_key")).cast("long").as("csum"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_custkey) AS BIGINT) AS csum,
          CAST(sum(CASE WHEN o_orderkey % 5 = 0
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
            AS cents
        FROM orders
        WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- MIN/MAX IVM THROUGH RETRACTIONS: min/max are not
    // retractable from scalar state, so the refresh merges insert
    // bounds for free and re-scans ONLY the groups whose deleted
    // values touched a stored extremum (the delete/update classes in
    // the fixture are chosen to force both the free-merge and the
    // rescan paths). The final mv must hash-match the oracle's full
    // recompute: a missed extremum retraction leaves a stale min/max,
    // an over-eager rescan is invisible here but the spec pins its
    // targeting.
    Q("q189_incremental_minmax_retract",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmMinMax(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "mn", "mx")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          min(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mn,
          max(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mx
        FROM orders
        WHERE o_orderkey % 10 NOT IN (3, 4)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- ID-MAPPED WRITER surface (r16): same life cycle as q188 but
    // in delta.columnMapping.mode=id — every staged file carries
    // parquet FIELD IDS and scans resolve columns by id, not name, so
    // a rewrite that forgot to stamp ids (or stamped the wrong ones)
    // reads back all-null and breaks the hash. The rename is the
    // id-contract showcase: the field keeps its id, only the logical
    // name moves.
    Q("q190_delta_id_mapped_verbs",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIdMapped(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("customer_key")).cast("long").as("csum"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_custkey) AS BIGINT) AS csum,
          CAST(sum(CASE WHEN o_orderkey % 4 = 0
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
            AS cents
        FROM orders
        WHERE o_orderkey % 9 <> 0 AND o_orderkey % 13 <> 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Delta as a STRUCTURED STREAMING SOURCE (DeltaStreamSource):
    // the fixture replicates the two-commit partitioned orders table
    // through readStream(graft-delta) → writeStream(graft-delta) — a
    // paced commit-version-offset replay landing in txn-ledger
    // exactly-once commits — and the query proves the replica IS the
    // corpus. The reference has no streaming surface; this is the
    // forward extension of its Delta read path (deltatable.rs:136-189).
    Q("q191_delta_stream_read",
      (s, d) => {
        val dir = Fixtures.deltaOrdersReplicated(s, d)
        val ctx = new AdtContext(s)
        ctx.sql(s"CREATE EXTERNAL TABLE orders_replica STORED AS DELTA LOCATION '$dir'")
        ctx.sql("""
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(o_orderkey) AS BIGINT) AS key_sum
          FROM orders_replica
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- STREAMING IVM: the fixture maintains a COUNT/SUM
    // materialization purely from the CDF streaming source (one
    // micro-batch per change commit, checkpointed restart after the
    // base moved on — StreamIvm's exactly-once comes from commit-window
    // offsets × the mv's own __upto guard, no txn ledger). The mv must
    // equal the oracle recomputation over the mutated corpus: a missed
    // retraction inflates a group, a double-folded redelivery doubles
    // one, a dropped window loses one.
    Q("q197_stream_ivm",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmStreamed(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "total AS cents")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CASE WHEN o_orderkey % 10 = 2
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS cents
        FROM orders
        WHERE NOT (o_orderkey % 2 = 0 AND o_orderkey % 14 = 0)
          AND o_orderkey % 9 <> 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- STREAMING MIN/MAX IVM: q189's extremum-retraction classes
    // (DV delete, copy-on-write delete, doubling update, compaction)
    // driven through the CDF STREAMING pipeline instead of the poll
    // verb — one micro-batch per change commit, a checkpointed restart
    // after the base moved on, targeted rescans riding the base
    // snapshot AT each window's top version. The mv must hash-match
    // the oracle's full recompute over the mutated corpus: a missed
    // extremum retraction leaves a stale bound, a rescan against the
    // wrong (later) snapshot folds rows the window hasn't seen, a
    // redelivered window double-counts.
    Q("q199_stream_ivm_minmax",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmMinMaxStreamed(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "mn", "mx")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          min(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mn,
          max(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mx
        FROM orders
        WHERE o_orderkey % 10 NOT IN (3, 4)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- SKETCHED MIN/MAX IVM: the q189 churn maintained by
    // refreshMinMaxSketched — per-group bounded value sketches make
    // the extremum retractions rescan-free (IncrementalAggSpec pins
    // the rescan-count contrast; THIS query pins exactness: the
    // sketch-merged extrema must hash-match the oracle's full
    // recompute over the mutated corpus, so a wrong cut, an
    // under-subtracted delete, or a missed exhaustion all break the
    // hash, not just the cost model).
    Q("q200_ivm_minmax_sketched",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmMinMaxSketched(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "mn", "mx")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          min(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mn,
          max(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mx
        FROM orders
        WHERE o_orderkey % 10 NOT IN (3, 4)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- CONVERT TO DELTA: the migration verb — a plain
    // hive-partitioned parquet dir gains a delta log IN PLACE (zero
    // bytes moved, stats computed over the existing files), then a
    // REAL delta DELETE mutates it. The aggregate must equal the
    // oracle over (orders minus the deleted class): a file missed by
    // conversion drops rows, a mis-parsed partition dir shifts groups,
    // wrong per-file stats would let the delete's pruning skip a live
    // file and resurrect deleted rows.
    Q("q201_convert_to_delta",
      (s, d) => {
        val dir = Fixtures.deltaOrdersConverted(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_custkey")).cast("long").as("csum"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_custkey) AS BIGINT) AS csum,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders
        WHERE o_orderkey % 6 <> 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- STREAMING SKETCHED MIN/MAX IVM: the fourth cell of the
    // {poll, stream} × {scalar, sketched} extremum-maintenance matrix
    // — q199's checkpointed CDF pipeline, but each trigger folds
    // through the value sketches (rescans only on per-window
    // exhaustion). Hash-matching the same full-recompute oracle proves
    // the sketch algebra exact across micro-batch boundaries too.
    Q("q203_stream_ivm_minmax_sketched",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmMinMaxSketchStreamed(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "mn", "mx")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          min(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mn,
          max(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS mx
        FROM orders
        WHERE o_orderkey % 10 NOT IN (3, 4)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- COPY INTO: the landing-zone ingest verb — two waves of
    // plain parquet files loaded exactly once each through the
    // per-file txn ledger (the middle re-run is a published-nothing
    // no-op). The aggregate must equal the whole corpus: a skipped new
    // file drops rows, a re-ingested old file doubles them, and
    // either breaks the hash.
    Q("q202_copy_into",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCopied(s, d)
        DeltaReader.load(s, s"$dir/table")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).cast("long").as("key_sum"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- CDF EXACTNESS of the CoW DELETE: the verb writes cdc
    // actions, so the delete commit's window must emit EXACTLY the
    // matched rows as 'delete' events — no touched-file survivor churn
    // at all (pre-r19 the window shipped every touched-file row as a
    // self-cancelling delete+insert pair: exact in net, corpus-sized in
    // volume). The oracle counts the deleted class directly, so one
    // churn pair — or one missed matched row — changes n and breaks the
    // hash.
    Q("q204_delta_cdf_delete_exact",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCdcDelete(s, d)
        DeltaReader.loadChangeFeed(s, dir, 0L, 1L)
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("_change_type"))
      },
      Some("""
        SELECT 'delete' AS _change_type, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders WHERE o_orderkey % 3 = 0""")),

    // ---- CDF EXACTNESS of MERGE: the upsert commit's cdc actions
    // spell the feed as exact update_preimage (replaced target rows) /
    // update_postimage (their source versions) / insert (unmatched
    // source rows). The oracle recomputes each event class from the
    // corpus — survivor churn, a mis-classified insert, or a
    // double-counted matched row each breaks a class count.
    Q("q205_delta_cdf_merge_exact",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCdcMerge(s, d)
        DeltaReader.loadChangeFeed(s, dir, 0L, 1L)
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("_change_type"))
      },
      Some("""
        SELECT * FROM (
          SELECT 'update_preimage' AS _change_type, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS cents
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT 'update_postimage', count(*),
            CAST(sum(CAST(round(o_totalprice * 2 * 100) AS BIGINT)) AS BIGINT)
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT 'insert', count(*),
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 5 = 0
        ) t ORDER BY _change_type""")),

    // ---- GENERATED COLUMNS: the fixture declares
    // `o_year = year(o_orderdate)` as a generated PARTITION column at
    // create, appends once WITHOUT the column (the writer computes it),
    // and then shifts o_orderdate on %10=6 rows — the generated key
    // must follow its source (rows re-bucket into new year dirs). The
    // year histogram over the table must equal the oracle recomputing
    // year() over the shifted corpus: a missed computation nulls a
    // partition, a stale generated value after the update lands rows
    // in the wrong year.
    Q("q196_delta_generated",
      (s, d) => {
        val dir = Fixtures.deltaOrdersGenerated(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_year").cast("long").as("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).cast("long").as("key_sum"))
          .orderBy(col("o_year"))
      },
      Some("""
        SELECT CAST(year(shifted) AS BIGINT) AS o_year,
          count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM (SELECT o_orderkey,
            CASE WHEN o_orderkey % 10 = 6
              THEN o_orderdate + INTERVAL 365 DAY
              ELSE o_orderdate END AS shifted
          FROM orders) t
        GROUP BY 1 ORDER BY 1""")),

    // ---- SHALLOW CLONE: the fixture clones the q185 table zero-copy
    // (version-0 adds reference the source's files by ABSOLUTE path —
    // the delta protocol's absolute-path allowance) and then diverges
    // with a copy-on-write DELETE that rewrites only touched absolute
    // files into the clone. The aggregate over the clone must equal
    // the oracle recomposition of (DV-delete %7, update-double %5,
    // clone, delete %3) over the untouched corpus — a wrong path
    // resolution drops files, a botched DV re-address ("u"→"p")
    // resurrects dead rows, a clone that mutated the source breaks
    // q185/q194 instead.
    Q("q195_delta_clone",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCloned(s, d)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CASE WHEN o_orderkey % 5 = 0
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS cents
        FROM orders
        WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 <> 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- STREAMING change-data-feed: the q185 window replayed through
    // the CDF mode of the streaming source (readChangeFeed=true), one
    // micro-batch per change commit, events landed by the exactly-once
    // sink — the same signed aggregate over the LANDED event table must
    // equal q185's oracle, proving the feed's per-window state seeding
    // and DV row-diffs survive micro-batch boundaries.
    Q("q194_delta_stream_cdf",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCdfStreamed(s, d)
        val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), 1L).otherwise(-1L)
        DeltaReader.load(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(sum(sign).cast("long").as("n"),
            sum(sign * expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority,
          CAST(-sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n,
          CAST(sum(CASE
            WHEN o_orderkey % 7 = 0
              THEN -CAST(round(o_totalprice * 100) AS BIGINT)
            WHEN o_orderkey % 5 = 0
              THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
                 - CAST(round(o_totalprice * 100) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS cents
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q("q186_incremental_agg_retract",
      (s, d) => {
        val dir = Fixtures.deltaOrdersIvmRetract(s, d)
        DeltaReader.load(s, s"$dir/mv")
          .selectExpr("key AS o_orderpriority", "n", "total AS cents")
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CASE WHEN o_orderkey % 10 = 5
            THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
            ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS cents
        FROM orders
        WHERE o_orderkey % 10 NOT IN (3, 4)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- CDF EXACTNESS of replacePartitions (r20): the overwrite-class
    // verb commits plain removes + adds (no cdc actions — delta-spark
    // parity), and the file-diff derivation is exact BY CONSTRUCTION:
    // a replaced partition has no survivors, so the feed's delete class
    // is exactly the old partition rows and the insert class exactly
    // the replacement. The oracle recomputes both classes from the
    // corpus — a leaked survivor pair, a missed removed file, or an
    // event from an untouched partition each breaks a class count.
    Q("q207_delta_cdf_replace_exact",
      (s, d) => {
        val dir = Fixtures.deltaOrdersCdcReplace(s, d)
        DeltaReader.loadChangeFeed(s, dir, 0L, 1L)
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents"))
          .orderBy(col("_change_type"))
      },
      Some("""
        SELECT * FROM (
          SELECT 'delete' AS _change_type, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS cents
          FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT 'insert', count(*),
            CAST(sum(CAST(round(o_totalprice * 2 * 100) AS BIGINT)) AS BIGINT)
          FROM orders WHERE o_orderpriority = '1-URGENT'
            AND o_orderkey % 2 = 0
        ) t ORDER BY _change_type""")),

    // ---- SQL INSERT INTO (r20): the append statement a script author
    // expects after CREATE (the reference's DataFusion context accepts
    // INSERT through its all-permissive SQLOptions, context.rs:94).
    // The fixture lands a full-row VALUES insert and a
    // partial-column-list SELECT insert through the SQL dispatch; the
    // read-back must equal the oracle's recomposed corpus — a
    // transposed positional bind, a dropped null-fill, or a statement
    // that didn't commit each breaks the row set.
    Q("q206_sql_insert_into",
      (s, d) => {
        val dir = Fixtures.deltaNationInserted(s, d)
        DeltaReader.load(s, s"$dir/table")
          .select(col("n_nationkey").cast("int").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some("""
        SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
          CAST(n_regionkey AS INT) AS n_regionkey
        FROM nation
        UNION ALL
        SELECT * FROM (VALUES
          (900, 'INSERTED-A', 1),
          (901, 'INSERTED-B', 2)) v(n_nationkey, n_name, n_regionkey)
        UNION ALL
        SELECT CAST(n_nationkey + 1000 AS INT),
          concat('COPY-', n_name), CAST(NULL AS INT)
        FROM nation WHERE n_nationkey < 5
        ORDER BY n_nationkey"""))
  )
}
