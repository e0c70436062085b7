package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming z-order ingest routing — the write-path half of batch
  * q154: arriving fact rows are routed to the z-range file bucket the
  * layout assigns them, in-stream, so an ingest pipeline appends each
  * row to the right clustered file without a batch re-sort.
  *
  * The trained artifact is the bucket BOUNDARY list: the full sort-key
  * tuples (z, l_orderkey, l_linenumber, l_partkey, l_suppkey) at the
  * first rank of each bucket of the batch layout (B−1 tuples —
  * metadata, the StreamAnnAssign centroid posture). Routing a row =
  * counting boundaries ≤ its own tuple under the SAME total order the
  * batch rank sorts by — the boundary carries the ENTIRE tie-break
  * key (q154's corpus lesson: (l_orderkey, l_linenumber) alone is NOT
  * unique in the synthetic corpus), so streamed == batch holds
  * row-for-row, with byte-identical duplicate rows interchangeable by
  * construction (StreamingSpec compares bucket multisets per distinct
  * row). Per row this is one fold over a B−1-element literal array:
  * stateless scan → project, no shuffle, no state store.
  *
  * At 100 TB: boundaries train once per layout epoch (the q154 rank
  * pass); the stream is then embarrassingly parallel. Spark's own
  * `repartitionByRange` on a stream would re-SAMPLE boundaries per
  * micro-batch — different files per batch, never the stable layout a
  * compaction-free ingest needs.
  */
object StreamZRoute {

  /** One layout boundary: the full sort-key tuple of the first row of
    * bucket b+1 — a row routes to bucket = #{boundaries <= row tuple}. */
  final case class Boundary(z: Long, okey: Long, line: Long,
      pkey: Long, skey: Long)

  /** Train the boundary list from a batch frame carrying q154's ranked
    * layout (z, l_orderkey, l_linenumber, l_partkey, l_suppkey, rk)
    * for B equal-count buckets. Returns B−1 boundaries. */
  def boundaries(ranked: DataFrame, buckets: Int, nTotal: Long): Seq[Boundary] = {
    // batch bucket(rk) = (rk−1)·B DIV n, so bucket b's first row sits at
    // rank ceil(b·n/B)+1 — ceil, not floor, when B does not divide b·n
    val cuts = (1 until buckets)
      .map(b => (b.toLong * nTotal + buckets - 1) / buckets + 1L)
    ranked.filter(col("rk").isin(cuts: _*))
      .select(col("z"), col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_partkey"), col("l_suppkey"), col("rk"))
      .collect()
      .sortBy(_.getLong(5))
      .map(r => Boundary(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
  }

  /** boundary-tuple <= row-tuple under the layout's lexicographic
    * order (z, okey, line, pkey, skey). `b` is a struct element of the
    * broadcast boundary array. */
  private def leq(b: Column): Column = {
    def f(i: Int) = b.getField(s"_$i")
    val Seq(z, ok, ln, pk, sk) = Seq(col("z"), col("l_orderkey"),
      col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    (f(1) < z) ||
      (f(1) === z && (f(2) < ok ||
        (f(2) === ok && (f(3) < ln ||
          (f(3) === ln && (f(4) < pk ||
            (f(4) === pk && f(5) <= sk)))))))
  }

  /** Route a (l_orderkey, l_linenumber, l_partkey, l_suppkey) frame —
    * batch or streaming — through the trained boundaries. Scales are
    * the corpus-derived 8-bit normalization maxima from training time
    * (part of the layout artifact, like the boundaries). */
  def route(rows: DataFrame, bs: Seq[Boundary],
      mp: Long, ms: Long): DataFrame = {
    val bArr = typedLit(bs.map(b => (b.z, b.okey, b.line, b.pkey, b.skey)))
    rows
      // the corpus ships l_linenumber as int32 — normalize so the
      // boundary compare is long-vs-long on both sides
      .withColumn("l_linenumber", col("l_linenumber").cast("long"))
      .withColumn("z", graft.functions.ZOrder.morton(
        expr(s"l_partkey * 256 DIV ${mp + 1}"),
        expr(s"l_suppkey * 256 DIV ${ms + 1}")))
      .withColumn("bucket",
        aggregate(bArr, lit(0L),
          (acc, b) => acc + when(leq(b), 1L).otherwise(0L)))
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
