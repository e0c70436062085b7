package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** SQL DML + maintenance over DDL-registered Delta tables — `DELETE
  * FROM`, `UPDATE … SET`, the canonical upsert `MERGE INTO`, plus the
  * maintenance statements `OPTIMIZE [ZORDER BY (…)]`, `VACUUM
  * [RETAIN n HOURS]`, `RESTORE TABLE … TO VERSION/TIMESTAMP AS OF`,
  * `ALTER TABLE … ADD/DROP CONSTRAINT`, and `ALTER TABLE … SET/UNSET
  * TBLPROPERTIES` (where `delta.enableDeletionVectors=true` flips
  * DELETE/UPDATE to the merge-on-read verbs) — dispatched to
  * [[DeltaWriter]]'s verbs through
  * `AdtContext.sql`, so the CLI's execute pipeline can mutate AND
  * maintain a table it created (the reference is read-only; this is
  * the write half its users script by hand).
  *
  * Scope is deliberate:
  *  - targets must be `STORED AS DELTA` external tables registered in
  *    THIS session (the [[Ddl]] registry carries name → location);
  *    time-travel-pinned registrations (`versionAsOf`) refuse writes;
  *  - `MERGE INTO` supports exactly the upsert form the verb
  *    implements — equi-key `ON` conjunctions plus
  *    `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    — anything else errors with the supported spelling;
  *  - WHERE/SET expressions are Spark SQL, parsed with `expr` and
  *    resolved against the table's frame (so every scalar function the
  *    engine exposes works in DML predicates);
  *  - after a write the view is RE-REGISTERED, so the next statement
  *    in a script reads the new snapshot.
  *
  * Parsing is a top-level token scan (quote- and paren-aware), not a
  * grammar: keywords inside string literals or subquery parens never
  * split a clause.
  */
object Dml {

  sealed trait Stmt { def table: String }
  final case class Delete(table: String, where: Option[String]) extends Stmt
  final case class Update(table: String, sets: Seq[(String, String)],
      where: Option[String]) extends Stmt
  final case class Merge(table: String, sourceQuery: String,
      keys: Seq[String]) extends Stmt
  /** `OPTIMIZE t [WHERE partition-pred]` (compact) /
    * `OPTIMIZE t ZORDER BY (x[, y[, z]])` — 1 col = clustered
    * compaction sort, 2/3 cols = the Morton interleaves
    * ([[DeltaWriter.optimizeZOrder]]); more refused by the verb
    * (per-dim locality is gone past 3). WHERE scopes the rewrite to
    * the matching PARTITIONS (compact and 1-col clustered sorts; the
    * multi-col Morton verbs refuse it — their scoped form is the
    * incremental z-order, which rewrites only loose files). */
  final case class Optimize(table: String, zorder: Seq[String],
      where: Option[String] = None) extends Stmt
  /** `VACUUM t [RETAIN n HOURS]` — missing RETAIN sweeps immediately
    * (retainMs = 0), the library default. */
  final case class Vacuum(table: String, retainHours: Option[Long])
      extends Stmt
  /** `VACUUM t LOGS [RETAIN n HOURS]` — retention-driven LOG cleanup
    * ([[DeltaWriter.cleanupLogs]]); missing RETAIN defers to the
    * table's `delta.logRetentionDuration` (then 30 days). */
  final case class CleanupLogs(table: String, retainHours: Option[Long])
      extends Stmt
  /** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` /
    * `ALTER TABLE t DROP CONSTRAINT name`. */
  final case class AddConstraint(table: String, name: String,
      check: String) extends Stmt
  final case class DropConstraint(table: String, name: String) extends Stmt
  /** `INSERT INTO t [(c1, c2, …)] VALUES (…)[, (…)]` / `INSERT INTO t
    * [(c1, …)] SELECT …` — the append commit a script author expects
    * after CREATE (the reference's DataFusion context accepts INSERT
    * through its all-permissive SQLOptions, `context.rs:94`). The
    * source binds POSITIONALLY to the named column list (or the full
    * table schema when none is given), casts to the table's types,
    * and lands through [[DeltaWriter.append]] — so NOT NULL / CHECK /
    * generated-column invariants gate it exactly like every other
    * row-landing verb, and absent generated columns are computed. */
  final case class Insert(table: String, cols: Seq[String],
      sourceSql: String) extends Stmt
  /** `ALTER TABLE t DROP COLUMN c` — metadata-only drop on a
    * column-mapped table ([[DeltaWriter.dropColumn]]). */
  final case class DropColumn(table: String, column: String) extends Stmt
  /** `ALTER TABLE t RENAME COLUMN a TO b` — metadata-only rename on a
    * column-mapped table ([[DeltaWriter.renameColumn]]). */
  final case class RenameColumn(table: String, from: String,
      to: String) extends Stmt
  /** `TRUNCATE TABLE t` — delete every row in one commit (delta's
    * TRUNCATE: the log keeps history, so the pre-truncate state stays
    * time-travelable; routed through [[DeltaWriter.delete]] with an
    * all-rows predicate). */
  final case class Truncate(table: String) extends Stmt
  /** `INSERT OVERWRITE t SELECT …` / `INSERT OVERWRITE t VALUES (…)`
    * — atomic full-table swap ([[DeltaWriter.overwrite]]): the same
    * positional binding and invariant gating as [[Insert]], but the
    * commit removes every live file and lands the new rows in one
    * version. */
  final case class InsertOverwrite(table: String, cols: Seq[String],
      sourceSql: String) extends Stmt
  /** `ALTER TABLE t ADD COLUMNS (c1 TYPE [, c2 TYPE …])` — the SQL
    * spelling of [[DeltaWriter.evolveSchema]]'s additive-only
    * evolution: new columns are nullable (old files null-fill on
    * read), name collisions refuse, the commit patches only the
    * metaData schemaString. */
  final case class AddColumns(table: String, colsDdl: String) extends Stmt
  /** `RESTORE TABLE t TO VERSION AS OF n` /
    * `RESTORE TABLE t TO TIMESTAMP AS OF '<ts>'`. */
  final case class Restore(table: String, versionAsOf: Option[Long],
      timestampAsOf: Option[String]) extends Stmt
  /** `CREATE TABLE t SHALLOW CLONE src LOCATION '<path>'` — zero-copy
    * clone ([[DeltaWriter.cloneShallow]]): `table` is the NEW name the
    * clone registers under, `source` must be a registered DELTA table.
    * LOCATION is required — there is no managed warehouse; the
    * external-table contract names every table's directory. */
  final case class ShallowClone(table: String, source: String,
      location: String, versionAsOf: Option[Long] = None) extends Stmt
  /** `CREATE TABLE t [DEEP] CLONE src LOCATION '<path>'` — an
    * unqualified CLONE is DEEP (delta's own default): the clone owns
    * physical copies of every live file ([[DeltaWriter.cloneDeep]]),
    * fully decoupled from the source's vacuum/lifecycle. */
  final case class DeepClone(table: String, source: String,
      location: String, versionAsOf: Option[Long] = None) extends Stmt
  /** `CONVERT TO DELTA t` — in-place migration
    * ([[DeltaWriter.convertToDelta]]): `t` must be a registered
    * PARQUET external table; after the zero-copy conversion its
    * registration flips to DELTA, so the next statement can run DML /
    * maintenance / time travel against it. */
  final case class ConvertToDelta(table: String) extends Stmt
  /** `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
    * [FORCE = TRUE]` — idempotent batch file ingestion
    * ([[DeltaWriter.copyInto]]): files load exactly once, keyed by
    * path in the table's own txn ledger. */
  final case class CopyInto(table: String, from: String,
      fileFormat: String, force: Boolean) extends Stmt
  /** `ALTER TABLE t SET TBLPROPERTIES ('k'='v'[, …])` / `… UNSET
    * TBLPROPERTIES ('k'[, …])`. */
  final case class SetProps(table: String,
      props: Seq[(String, String)]) extends Stmt
  final case class UnsetProps(table: String, keys: Seq[String]) extends Stmt

  /** A table identifier: bare word, pg-style "quoted" (any chars), or a
    * dot-qualified mix of both — captured whole, normalized by
    * [[unquote]]. Quoting gets a DML statement the registry's
    * actionable refusal instead of falling through to Spark's parser. */
  private val Id = """((?:"[^"]+"|\w+)(?:\.(?:"[^"]+"|\w+))*)"""
  private val DeleteP = raw"""(?is)\s*DELETE\s+FROM\s+$Id\s*(.*?)\s*;?\s*""".r
  private val UpdateP = raw"""(?is)\s*UPDATE\s+$Id\s+SET\s+(.+?)\s*;?\s*""".r
  private val MergeP =
    (raw"""(?is)\s*MERGE\s+INTO\s+$Id(?:\s+AS\s+\w+|\s+(?!USING)\w+)?\s+""" +
      """USING\s+\((.+)\)(?:\s+AS)?\s+(\w+)\s+ON\s+(.+?)\s+""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  private val OptimizeP =
    (raw"""(?is)\s*OPTIMIZE\s+$Id(?:\s+WHERE\s+(.+?))?""" +
      raw"""(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val VacuumLogsP =
    raw"""(?is)\s*VACUUM\s+$Id\s+LOGS\s*(?:RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*""".r
  private val VacuumP =
    raw"""(?is)\s*VACUUM\s+$Id\s*(?:RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*""".r
  private val AddConstraintP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraintP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val DropColumnP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+DROP\s+COLUMN\s+("[^"]+"|\w+)\s*;?\s*""".r
  private val RenameColumnP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+RENAME\s+COLUMN\s+("[^"]+"|\w+)\s+TO\s+("[^"]+"|\w+)\s*;?\s*""".r
  private val TruncateP =
    raw"""(?is)\s*TRUNCATE\s+TABLE\s+$Id\s*;?\s*""".r
  private val InsertOverwriteP =
    raw"""(?is)\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?$Id\s*(?:\(([^()]*)\))?\s*((?:VALUES|SELECT|WITH)\b.+?)\s*;?\s*""".r
  // the source query is everything after the optional column list —
  // VALUES rows, a SELECT, or a WITH-prefixed select; parsed as a
  // whole by the session's SQL pipeline, so every scalar function and
  // pg rewrite works inside an INSERT source
  private val InsertP =
    raw"""(?is)\s*INSERT\s+INTO\s+$Id\s*(?:\(([^()]*)\))?\s*((?:VALUES|SELECT|WITH)\b.+?)\s*;?\s*""".r
  // greedy (.+) like AddConstraintP: parameterized types — DECIMAL(p,s),
  // VARCHAR(n) — carry inner parens the non-greedy [^)]+ would cut at
  private val AddColumnsP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""".r
  private val RestoreVersionP =
    raw"""(?is)\s*RESTORE\s+TABLE\s+$Id\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTimestampP =
    raw"""(?is)\s*RESTORE\s+TABLE\s+$Id\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val ShallowCloneP =
    (raw"""(?is)\s*CREATE\s+TABLE\s+$Id\s+SHALLOW\s+CLONE\s+$Id\s*""" +
      raw"""(?:VERSION\s+AS\s+OF\s+(\d+)\s+)?LOCATION\s+'([^']+)'\s*;?\s*""").r
  private val DeepCloneP =
    (raw"""(?is)\s*CREATE\s+TABLE\s+$Id\s+(?:DEEP\s+)?CLONE\s+$Id\s*""" +
      raw"""(?:VERSION\s+AS\s+OF\s+(\d+)\s+)?LOCATION\s+'([^']+)'\s*;?\s*""").r
  private val ConvertP =
    raw"""(?is)\s*CONVERT\s+TO\s+DELTA\s+$Id\s*;?\s*""".r
  private val CopyIntoP =
    (raw"""(?is)\s*COPY\s+INTO\s+$Id\s+FROM\s+'([^']+)'\s+""" +
      raw"""FILEFORMAT\s*=\s*(\w+)(?:\s+FORCE\s*=\s*(TRUE|FALSE))?\s*;?\s*""").r
  private val SetPropsP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+SET\s+TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""".r
  private val UnsetPropsP =
    raw"""(?is)\s*ALTER\s+TABLE\s+$Id\s+UNSET\s+TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""".r
  private val PropPair = """\s*'([^']+)'\s*=\s*'([^']*)'\s*""".r
  private val PropKey = """\s*'([^']+)'\s*""".r

  def matches(sql: String): Boolean = parseOpt(sql).isDefined

  def parse(sql: String): Stmt = parseOpt(sql).getOrElse(
    throw new IllegalArgumentException(s"not a DML statement: $sql"))

  /** `"My.Table"` → `My.Table`; `sch."tab le"` → `sch.tab le` — quotes
    * stripped per dot-separated part, parts rejoined (the registry key
    * the DDL shim stores). */
  /** INSERT column lists split on commas OUTSIDE double quotes, then
    * trim + unquote each segment whole — a "quoted identifier" may
    * itself contain commas, and an unquoted segment keeps its exact
    * spelling (so a forgotten comma stays one unknown-column refusal,
    * never a silent two-column bind). */
  private def splitColumnList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inQ = false; var start = 0; var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '"') inQ = !inQ
      else if (ch == ',' && !inQ) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty).map(unquote)
  }

  private def unquote(name: String): String =
    """"[^"]+"|\w+""".r.findAllIn(name)
      .map(p => if (p.startsWith("\"")) p.substring(1, p.length - 1) else p)
      .mkString(".")

  private def parseOpt(sql: String): Option[Stmt] = sql match {
    case MergeP(table, source, _, on) =>
      Some(Merge(unquote(table), source, onKeys(table, on)))
    case OptimizeP(table, pred, cols) =>
      Some(Optimize(unquote(table), Option(cols).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
        Option(pred).map(_.trim).filter(_.nonEmpty)))
    case VacuumLogsP(table, hours) =>
      Some(CleanupLogs(unquote(table), Option(hours).map(_.toLong)))
    case VacuumP(table, hours) =>
      Some(Vacuum(unquote(table), Option(hours).map(_.toLong)))
    case AddConstraintP(table, name, check) =>
      Some(AddConstraint(unquote(table), name, check.trim))
    case DropConstraintP(table, name) =>
      Some(DropConstraint(unquote(table), name))
    case DropColumnP(table, column) =>
      Some(DropColumn(unquote(table), unquote(column)))
    case RenameColumnP(table, from, to) =>
      Some(RenameColumn(unquote(table), unquote(from), unquote(to)))
    case TruncateP(table) =>
      Some(Truncate(unquote(table)))
    case InsertOverwriteP(table, cols, src) =>
      Some(InsertOverwrite(unquote(table),
        Option(cols).toSeq.flatMap(splitColumnList), src.trim))
    case InsertP(table, cols, src) =>
      Some(Insert(unquote(table),
        Option(cols).toSeq.flatMap(splitColumnList), src.trim))
    case AddColumnsP(table, cols) =>
      Some(AddColumns(unquote(table), cols.trim))
    case RestoreVersionP(table, v) =>
      Some(Restore(unquote(table), Some(v.toLong), None))
    case RestoreTimestampP(table, ts) =>
      Some(Restore(unquote(table), None, Some(ts)))
    case ShallowCloneP(target, source, v, loc) =>
      Some(ShallowClone(unquote(target), unquote(source), loc,
        Option(v).map(_.toLong)))
    case DeepCloneP(target, source, v, loc) =>
      Some(DeepClone(unquote(target), unquote(source), loc,
        Option(v).map(_.toLong)))
    case ConvertP(table) =>
      Some(ConvertToDelta(unquote(table)))
    case CopyIntoP(table, from, fmt, force) =>
      Some(CopyInto(unquote(table), from, fmt.toLowerCase,
        Option(force).exists(_.equalsIgnoreCase("TRUE"))))
    case SetPropsP(table, pairs) =>
      val raw = splitTopLevelCommas(pairs)
      val ps = raw.collect { case PropPair(k, v) => (k, v) }
      if (ps.isEmpty || ps.size != raw.size) None
      else Some(SetProps(unquote(table), ps))
    case UnsetPropsP(table, keys) =>
      val raw = splitTopLevelCommas(keys)
      val ks = raw.collect { case PropKey(k) => k }
      if (ks.isEmpty || ks.size != raw.size) None
      else Some(UnsetProps(unquote(table), ks))
    case DeleteP(table, tail) =>
      whereTail(tail).map(Delete(unquote(table), _))
    case UpdateP(table, rest) =>
      val (setPart, where) = splitTopLevel(rest, "WHERE") match {
        case Some((s, w)) => (s, Some(w))
        case None => (rest, None)
      }
      val sets = splitTopLevelCommas(setPart).map { a =>
        val i = topLevelIndexOf(a, '=')
        if (i <= 0) return None
        (a.take(i).trim, a.drop(i + 1).trim)
      }
      if (sets.isEmpty || sets.exists(s => s._1.isEmpty || s._2.isEmpty)) None
      else Some(Update(unquote(table), sets, where))
    case _ => None
  }

  /** "" → no WHERE; "WHERE p" → Some(p); anything else → not DML. */
  private def whereTail(tail: String): Option[Option[String]] =
    if (tail.trim.isEmpty) Some(None)
    else {
      val t = tail.trim
      if (t.length > 5 && t.substring(0, 5).equalsIgnoreCase("WHERE") &&
        t.charAt(5).isWhitespace) Some(Some(t.drop(6).trim))
      else None
    }

  /** `t.k = s.k [AND …]` → the equi-key column list; anything that is
    * not a conjunction of matching-name equalities is refused. */
  private def onKeys(table: String, on: String): Seq[String] =
    splitTopLevelAll(on, "AND").map { clause =>
      val i = topLevelIndexOf(clause, '=')
      require(i > 0, s"MERGE ON supports equi-key conjunctions only: $clause")
      def colOf(s: String): String = {
        val t = s.trim
        val dot = t.lastIndexOf('.')
        (if (dot >= 0) t.drop(dot + 1) else t).trim
      }
      val l = colOf(clause.take(i))
      val r = colOf(clause.drop(i + 1))
      require(l.equalsIgnoreCase(r),
        s"MERGE ON must equate the SAME column on both sides (got $l = $r)")
      l
    }

  /** Execute against the session's registry; `run` evaluates a nested
    * query through the full context (MERGE's USING source). Returns the
    * committed version (VACUUM: the deleted-file count — it publishes
    * no commit). */
  def execute(spark: SparkSession, stmt: Stmt,
      run: String => DataFrame): Long = {
    stmt match {
      // the clone's TARGET is by definition unregistered — resolve the
      // SOURCE through the registry, clone, then register the target so
      // the next statement in the script reads it
      case ShallowClone(target, source, loc, vAsOf) =>
        val srcT = Ddl.lookup(spark, source).getOrElse(
          throw new IllegalArgumentException(
            s"$source is not a registered external table — SHALLOW CLONE " +
              "sources must be created via CREATE EXTERNAL TABLE … " +
              "STORED AS DELTA"))
        require(srcT.format == "DELTA",
          s"SHALLOW CLONE supports DELTA sources only; $source is ${srcT.format}")
        val v = DeltaWriter.cloneShallow(spark, srcT.location, loc, vAsOf)
        Ddl.register(spark, Ddl.ExternalTable(
          target, "DELTA", loc, None, Nil, Map.empty))
        return v
      case DeepClone(target, source, loc, vAsOf) =>
        val srcT = Ddl.lookup(spark, source).getOrElse(
          throw new IllegalArgumentException(
            s"$source is not a registered external table — CLONE " +
              "sources must be created via CREATE EXTERNAL TABLE … " +
              "STORED AS DELTA"))
        require(srcT.format == "DELTA",
          s"CLONE supports DELTA sources only; $source is ${srcT.format}")
        val v = DeltaWriter.cloneDeep(spark, srcT.location, loc, vAsOf)
        Ddl.register(spark, Ddl.ExternalTable(
          target, "DELTA", loc, None, Nil, Map.empty))
        return v
      // the convert TARGET is registered as PARQUET (the generic delta
      // guard below would refuse it) — flip the registration after the
      // in-place conversion so the next statement gets the delta view
      case ConvertToDelta(name) =>
        val t = Ddl.lookup(spark, name).getOrElse(
          throw new IllegalArgumentException(
            s"$name is not a registered external table — CONVERT TO " +
              "DELTA targets must be created via CREATE EXTERNAL TABLE " +
              "… STORED AS PARQUET"))
        require(t.format == "PARQUET",
          s"CONVERT TO DELTA converts PARQUET tables; $name is ${t.format}" +
            (if (t.format == "DELTA") " already" else ""))
        val v = DeltaWriter.convertToDelta(spark, t.location)
        Ddl.register(spark, t.copy(format = "DELTA"))
        return v
      case _ => ()
    }
    val t = Ddl.lookup(spark, stmt.table).getOrElse(
      throw new IllegalArgumentException(
        s"${stmt.table} is not a registered external table — DML targets " +
          "must be created via CREATE EXTERNAL TABLE … STORED AS DELTA"))
    require(t.format == "DELTA",
      s"DML is supported only for DELTA tables; ${stmt.table} is ${t.format}")
    require(!t.options.contains("versionasof") &&
      !t.options.contains("timestampasof"),
      s"${stmt.table} is pinned to a time-travel snapshot " +
        "(versionAsOf/timestampAsOf) — a time-travel view is read-only")
    // delta.enableDeletionVectors=true routes DELETE/UPDATE to the
    // merge-on-read verbs (write cost ∝ matched rows), the same
    // property switch real engines use; default stays copy-on-write
    def morEnabled: Boolean =
      DeltaReader.snapshot(spark, t.location)
        .configuration.get("delta.enableDeletionVectors").contains("true")
    val version = stmt match {
      case Delete(_, where) =>
        val pred = where.map(expr).getOrElse(lit(true))
        if (morEnabled) DeltaWriter.deleteWithVectors(spark, t.location, pred)
        else DeltaWriter.delete(spark, t.location, pred)
      case Update(_, sets, where) =>
        val pred = where.map(expr).getOrElse(lit(true))
        val assignments = sets.map { case (k, v) => k -> expr(v) }.toMap
        if (morEnabled)
          DeltaWriter.updateWithVectors(spark, t.location, pred, assignments)
        else DeltaWriter.update(spark, t.location, pred, assignments)
      case Merge(_, source, keys) =>
        DeltaWriter.merge(run(source), t.location, keys)
      case Insert(_, cols, srcSql) =>
        val (out, snap) = bindInsertSource(spark, run, t.location,
          stmt.table, "INSERT INTO", cols, srcSql)
        DeltaWriter.append(out, t.location,
          partitionBy = snap.partitionColumns)
      case InsertOverwrite(_, cols, srcSql) =>
        // the atomic full-table swap: same binding + invariant gating,
        // one commit removes every live file and lands the new rows
        val (out, snap) = bindInsertSource(spark, run, t.location,
          stmt.table, "INSERT OVERWRITE", cols, srcSql)
        DeltaWriter.overwrite(out, t.location,
          partitionBy = snap.partitionColumns)
      case DropColumn(_, column) =>
        DeltaWriter.dropColumn(spark, t.location, column)
      case RenameColumn(_, from, to) =>
        DeltaWriter.renameColumn(spark, t.location, from, to)
      case Truncate(_) =>
        // all-rows delete; the log keeps history, so the pre-truncate
        // state stays time-travelable (delta's TRUNCATE semantics,
        // audited under its own operation name)
        DeltaWriter.delete(spark, t.location, lit(true),
          operation = "TRUNCATE")
      case Optimize(_, Nil, w) =>
        DeltaWriter.compact(spark, t.location, where = w.map(expr))
      case Optimize(_, Seq(one), w) =>
        DeltaWriter.compact(spark, t.location, sortBy = Seq(one),
          where = w.map(expr))
      case Optimize(_, cs, w) =>
        require(w.isEmpty,
          "OPTIMIZE … WHERE scopes compaction and 1-column clustered " +
            "sorts; the multi-column ZORDER verbs refuse a partition " +
            "scope — use the property-routed INCREMENTAL z-order " +
            "(graft.autoOptimize.zOrderCols), which rewrites only " +
            "loose files")
        // 2 or 3 columns → the Morton verbs; more refused by the verb.
        // Steady-state routing: when the table carries
        // `graft.autoOptimize.zOrderCols` naming these columns (matched
        // AS A SET, case-insensitive — `y,x` vs `x,y` must not silently
        // re-pay the full rewrite) AND already holds optimize-tagged
        // files (an earlier full pass ran), dispatch the INCREMENTAL
        // verb — admit/skip from written stats only, no commit when
        // nothing is loose — so a scheduled `OPTIMIZE … ZORDER BY` in a
        // script costs nothing at steady state. The incremental call
        // uses the PROPERTY's column order, keeping the curve spelling
        // consistent with the seeded layout. The first OPTIMIZE after
        // tagging (no tagged files yet) and every other spelling run
        // the full rewrite, which seeds the tags the incremental loop
        // converges on. A deletion vector on a LOOSE (untagged) file
        // also falls back to the full rewrite: the incremental verb
        // refuses DV'd loose files, while the full pass absorbs the
        // vectors (ADVICE r15).
        val snap = DeltaReader.snapshot(spark, t.location)
        val propCols = snap.configuration
          .get("graft.autoOptimize.zOrderCols")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        val seeded = snap.files.exists(
          _.tags.get("optimized").contains("zorder"))
        val colsMatch = propCols.exists(p =>
          p.map(_.toLowerCase).toSet == cs.map(_.toLowerCase).toSet)
        val dvOnLoose = snap.files.exists(a =>
          a.deletionVector.nonEmpty &&
            !a.tags.get("optimized").contains("zorder"))
        if (colsMatch && seeded && !dvOnLoose &&
            (cs.length == 2 || cs.length == 3))
          DeltaWriter.optimizeZOrderIncremental(spark, t.location,
            propCols.get, 8, 500)
        else DeltaWriter.optimizeZOrder(spark, t.location, cs)
      case Vacuum(_, hours) =>
        // returns the deleted-file count, not a version — vacuum
        // publishes no commit
        DeltaWriter.vacuum(spark, t.location,
          hours.getOrElse(0L) * 3600000L).length.toLong
      case CleanupLogs(_, hours) =>
        // returns the deleted-commit count — log cleanup publishes no
        // commit either
        DeltaWriter.cleanupLogs(spark, t.location,
          hours.map(_ * 3600000L)).length.toLong
      case AddColumns(_, colsDdl) =>
        val added =
          try org.apache.spark.sql.types.StructType.fromDDL(colsDdl)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"ADD COLUMNS: unparseable column list '$colsDdl' — " +
                "expected 'name TYPE[, name TYPE …]'", e)
          }
        val old = DeltaReader.snapshot(spark, t.location).schema
        // CASE-INSENSITIVE collision check: Spark resolves names
        // case-insensitively by default, so a case-variant duplicate
        // would commit a schema whose every later read is ambiguous
        val oldLower = old.fieldNames.map(_.toLowerCase).toSet
        val dup = added.fieldNames.filter(n => oldLower(n.toLowerCase))
        require(dup.isEmpty,
          s"ADD COLUMNS: column(s) already exist: ${dup.mkString(", ")}")
        DeltaWriter.evolveSchema(spark, t.location,
          org.apache.spark.sql.types.StructType(
            old.fields ++ added.fields))
      case AddConstraint(_, name, check) =>
        DeltaWriter.addCheckConstraint(spark, t.location, name, check)
      case DropConstraint(_, name) =>
        DeltaWriter.dropCheckConstraint(spark, t.location, name)
      case Restore(_, v, ts) =>
        DeltaWriter.restore(spark, t.location, v.getOrElse(
          DeltaReader.versionAtTimestamp(t.location,
            Ddl.parseTsMillis(ts.get))))
      case SetProps(_, props) =>
        props.map { case (k, v) =>
          DeltaWriter.setTableProperty(spark, t.location, k, v)
        }.last
      case UnsetProps(_, keys) =>
        keys.map(k =>
          DeltaWriter.unsetTableProperty(spark, t.location, k)).last
      case CopyInto(_, from, fmt, force) =>
        // no-op (every file already ingested) reports the current
        // version — the statement is idempotent by design
        DeltaWriter.copyInto(spark, t.location, from, fmt, force)._1
          .getOrElse(DeltaReader.snapshot(spark, t.location).version)
    }
    Ddl.register(spark, t) // the view must see the new snapshot
    version
  }

  /** Shared INSERT source binding ([[Insert]] / [[InsertOverwrite]]):
    * evaluate the VALUES/SELECT source through the full context, bind
    * POSITIONALLY to the named column list (or the full schema,
    * names resolved case-insensitively to the table's spelling), cast
    * to the table's types, null-fill absent non-generated columns
    * (the NOT NULL invariant gate refuses the mandatory ones by
    * name; absent GENERATED columns are computed by the landing
    * verb). Returns the bound frame + the snapshot it bound against. */
  private def bindInsertSource(spark: SparkSession,
      run: String => DataFrame, location: String, tableName: String,
      verb: String, cols: Seq[String], srcSql: String)
      : (DataFrame, DeltaReader.Snapshot) = {
    // VALUES rows ride Spark's inline-table syntax; SELECT/WITH
    // sources evaluate through the full context (pg rewrites,
    // registered views, every engine scalar)
    val sql =
      if (srcSql.length >= 6 &&
        srcSql.substring(0, 6).equalsIgnoreCase("VALUES"))
        s"SELECT * FROM $srcSql"
      else srcSql
    val src = run(sql)
    val snap = DeltaReader.snapshot(spark, location)
    val targets =
      if (cols.isEmpty) snap.schema.fieldNames.toSeq
      else cols.map(c =>
        snap.schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"$verb $tableName: unknown column $c")))
    require(targets.distinct.size == targets.size,
      s"$verb $tableName: duplicate target column")
    require(src.columns.length == targets.size,
      s"$verb $tableName: ${targets.size} target column(s) " +
        s"but the source produces ${src.columns.length}")
    val named = src.toDF(targets: _*)
    val gens = DeltaWriter.generationExpressions(snap.schema).keySet
    val absent = snap.schema.fieldNames
      .filterNot(c => targets.contains(c) || gens.contains(c))
    val filled = absent.foldLeft(named)((d, c) =>
      d.withColumn(c, lit(null).cast(snap.schema(c).dataType)))
    val out = filled.select(filled.columns.toIndexedSeq.map(c =>
      col(c).cast(snap.schema(c).dataType).as(c)): _*)
    (out, snap)
  }

  // ---- top-level token scanning (quotes + parens respected)

  private def topLevelIndexOf(s: String, c: Char): Int = {
    var depth = 0; var inQ = false; var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ) { if (ch == '\'') inQ = false }
      else ch match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case x if x == c && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var start = 0; var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ) { if (ch == '\'') inQ = false }
      else ch match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** First top-level occurrence of the WORD `kw` → (before, after). */
  private def splitTopLevel(s: String, kw: String): Option[(String, String)] = {
    var depth = 0; var inQ = false; var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ) { if (ch == '\'') inQ = false; i += 1 }
      else ch match {
        case '\'' => inQ = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && i + kw.length <= s.length &&
            s.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + kw.length == s.length || s.charAt(i + kw.length).isWhitespace))
            return Some((s.take(i).trim, s.drop(i + kw.length).trim))
          else i += 1
      }
    }
    None
  }

  /** Split on EVERY top-level occurrence of the word `kw`. */
  private def splitTopLevelAll(s: String, kw: String): Seq[String] =
    splitTopLevel(s, kw) match {
      case Some((head, tail)) => head +: splitTopLevelAll(tail, kw)
      case None => Seq(s.trim)
    }
}
