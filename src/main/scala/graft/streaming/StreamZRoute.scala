package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming z-order ingest routing — the write-path half of batch
  * q154: arriving fact rows are routed to the z-range file bucket the
  * layout assigns them, in-stream, so an ingest pipeline appends each
  * row to the right clustered file without a batch re-sort.
  *
  * The trained artifact is the bucket BOUNDARY list: the full sort-key
  * tuples `(z, keyCols…)` at the first rank of each bucket of the
  * batch layout (B−1 tuples — metadata, the StreamAnnAssign centroid
  * posture). Routing a row = counting boundaries ≤ its own tuple under
  * the SAME total order the batch rank sorts by — the boundary carries
  * the ENTIRE tie-break key (q154's corpus lesson: a prefix of the key
  * is NOT unique in the synthetic corpus), so streamed == batch holds
  * row-for-row, with byte-identical duplicate rows interchangeable by
  * construction (StreamingSpec compares bucket multisets per distinct
  * row). Per row this is one fold over a B−1-element literal array:
  * stateless scan → project, no shuffle, no state store.
  *
  * SCHEMA-GENERIC: the layout key is `(z, keyCols…)` for ANY table —
  * the z expression and the tie-break column list are parameters
  * ([[boundaryTuples]]/[[route]]); the lineitem spellings q159 and the
  * batch spec use are thin wrappers over the same fold.
  *
  * At 100 TB: boundaries train once per layout epoch (the q154 rank
  * pass); the stream is then embarrassingly parallel. Spark's own
  * `repartitionByRange` on a stream would re-SAMPLE boundaries per
  * micro-batch — different files per batch, never the stable layout a
  * compaction-free ingest needs.
  */
object StreamZRoute {

  /** Train the boundary list from a ranked frame carrying the layout
    * key (`z`, `keyCols`… — all long-castable) and the rank column
    * `rk` for B equal-count buckets. Returns B−1 tuples, each
    * `(z, keyCols…)`, ascending in the layout's total order. */
  def boundaryTuples(ranked: DataFrame, keyCols: Seq[String],
      buckets: Int, nTotal: Long): Seq[Seq[Long]] = {
    // batch bucket(rk) = (rk−1)·B DIV n, so bucket b's first row sits at
    // rank ceil(b·n/B)+1 — ceil, not floor, when B does not divide b·n
    val cuts = (1 until buckets)
      .map(b => (b.toLong * nTotal + buckets - 1) / buckets + 1L)
    val n = keyCols.length + 1
    ranked.filter(col("rk").isin(cuts: _*))
      .select((col("z") +: keyCols.map(c => col(c).cast("long"))) :+
        col("rk"): _*)
      .collect()
      .sortBy(_.getLong(n))
      .map(r => (0 until n).map(r.getLong).toSeq)
      .toSeq
  }

  /** Route any frame — batch or streaming — through trained
    * boundaries: adds `z` (from `zExpr`) and `bucket` =
    * #{boundary tuples ≤ (z, keyCols…)} under the lexicographic order,
    * one fold over a literal B−1 array per row. */
  def route(rows: DataFrame, zExpr: Column, keyCols: Seq[String],
      bs: Seq[Seq[Long]]): DataFrame = {
    require(bs.forall(_.length == keyCols.length + 1),
      s"boundary arity ${bs.map(_.length).distinct} != key arity " +
        s"${keyCols.length + 1}")
    val bArr = typedLit(bs)
    val withZ = rows.withColumn("z", zExpr)
    val rowKey: Seq[Column] =
      col("z") +: keyCols.map(c => col(c).cast("long"))
    // lexicographic boundary <= row-key, built innermost-last: at the
    // final position <= ; earlier positions strict-< or tie-and-rest
    def leq(b: Column): Column =
      rowKey.indices.foldRight(lit(true): Column) { (i, rest) =>
        (b.getItem(i) < rowKey(i)) ||
          (b.getItem(i) === rowKey(i) && rest)
      }
    withZ.withColumn("bucket",
      aggregate(bArr, lit(0L),
        (acc, b) => acc + when(leq(b), 1L).otherwise(0L)))
  }

  // ------------------------------------------------ lineitem spellings

  /** One lineitem layout boundary: the full sort-key tuple of the first
    * row of bucket b+1. */
  final case class Boundary(z: Long, okey: Long, line: Long,
      pkey: Long, skey: Long)

  private val LineitemKeys =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  /** Train from a batch frame carrying q154's ranked lineitem layout
    * (z, l_orderkey, l_linenumber, l_partkey, l_suppkey, rk). */
  def boundaries(ranked: DataFrame, buckets: Int,
      nTotal: Long): Seq[Boundary] =
    boundaryTuples(ranked, LineitemKeys, buckets, nTotal)
      .map(t => Boundary(t(0), t(1), t(2), t(3), t(4)))

  /** Route a (l_orderkey, l_linenumber, l_partkey, l_suppkey) frame
    * through the trained lineitem boundaries. Scales are the
    * corpus-derived 8-bit normalization maxima from training time
    * (part of the layout artifact, like the boundaries). */
  def route(rows: DataFrame, bs: Seq[Boundary],
      mp: Long, ms: Long): DataFrame = {
    val z = graft.functions.ZOrder.morton(
      expr(s"l_partkey * 256 DIV ${mp + 1}"),
      expr(s"l_suppkey * 256 DIV ${ms + 1}"))
    route(
      // the corpus ships l_linenumber as int32 — normalize so the
      // boundary compare is long-vs-long on both sides
      rows.withColumn("l_linenumber", col("l_linenumber").cast("long")),
      z, LineitemKeys,
      bs.map(b => Seq(b.z, b.okey, b.line, b.pkey, b.skey)))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("z"), col("bucket"))
  }

  /** Replay a finite lineitem directory through the router. */
  def runToCompletion(spark: SparkSession, dir: String, bs: Seq[Boundary],
      mp: Long, ms: Long, queryName: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType)))
    val rows = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "lineitem.parquet")
      .parquet(dir)
    val q = route(rows, bs, mp, ms)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
