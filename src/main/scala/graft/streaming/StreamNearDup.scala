package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-dup candidates — the ingest-time twin of
  * the batch q42 operator, completing the dedup streaming surface next
  * to [[StreamDedup]] (exact) the way a production ingest pipeline runs:
  * candidates stream out at arrival time; exact-jaccard verification
  * stays a batch pass over the sealed corpus (q42's verification stage).
  *
  * Signature FORMULA is exactly q42's (queries/Dedup.scala): word
  * 3-gram shingles → 60-bit md5 hash mod P31 → 16 universal-hash
  * minhashes h_j(x) = ((2j+1)·x + 7919j) mod P31 → 4 bands of 4,
  * signature = comma-joined minhashes. StreamNearDupSpec pins the Scala
  * kernel bit-for-bit against the Spark-SQL spelling of that formula.
  * One DECLARED divergence from batch: q42 drops shingles whose corpus
  * document frequency exceeds MaxShingleDf BEFORE minhashing — document
  * frequency is a whole-corpus property no arrival-time stream can
  * know, so the stream minhashes over ALL of a doc's shingles. On a
  * corpus where a >50-df shingle wins an argmin, the two sides can
  * bucket that doc differently; the batch sweep over the sealed corpus
  * (which re-runs full q42) remains the source of truth, with the
  * stream as the early-warning candidate feed. The analogous streaming
  * guard against boilerplate saturation is [[MaxBucketState]] below.
  *
  * State: one [[GroupState]] per live band signature holding up to
  * [[MaxBucketState]] doc ids (declared cap — the streaming analogue of
  * the batch df caps: a bucket collecting more docs than that is
  * boilerplate saturation, not near-dup signal, and unbounded bucket
  * membership would otherwise grow state quadratically in the hot
  * bucket). Candidate pairs may repeat across bands (band is in the
  * output); downstream verification deduplicates.
  */
object StreamNearDup {

  private val P31 = 2147483647L // 2^31 - 1, q42's mixing prime

  /** Max doc ids retained per band bucket (declared semantics). */
  val MaxBucketState = 8

  final case class BandRow(sig: String, docId: Long)
  final case class BandRowTs(sig: String, docId: Long, ts: java.sql.Timestamp)
  final case class Candidate(d1: Long, d2: Long, band: Int)

  /** Shared bucket kernel: admit up to the remaining cap from `incoming`
    * (deduped, sorted, minus docs already seen) and emit the cross pairs
    * (seen × admitted) plus the within-batch pairs among the admitted. */
  private def admitAndPair(band: Int, seen: List[Long],
      incoming: Seq[Long]): (List[Long], List[Candidate]) = {
    // the bucket cap bounds WITHIN-batch work too: only the doc ids
    // actually admitted into the (capped) bucket participate in
    // pairing, so one hot signature in a single backfill batch
    // costs at most MaxBucketState² pairs — never |batch|²
    val admitted = incoming.toList.distinct.sorted
      .filterNot(seen.contains)
      .take(MaxBucketState - seen.size)
    val cross = for (s <- seen; n <- admitted)
      yield Candidate(math.min(s, n), math.max(s, n), band)
    val within = for {
      i <- admitted.indices.toList
      j <- (i + 1 until admitted.size).toList
    } yield Candidate(admitted(i), admitted(j), band)
    (admitted, cross ++ within)
  }

  /** First 60 bits of md5 as a long — the portable hash every dedup
    * operator shares (Dedup.h60), via the same digest-byte packing as
    * the native [[graft.functions.Md5Long]] expression. */
  def h60(s: String): Long =
    graft.functions.Md5Long.hash60(s.getBytes("UTF-8"))

  /** The 4 (band, signature) pairs of a document under q42's scheme;
    * empty for docs with fewer than 3 words (no shingles — absent from
    * the batch operator too). */
  def bands(text: String): Seq[(Int, String)] = {
    val w = text.split(" ", -1)
    if (w.length < 3) return Seq.empty
    val hs = (0 until w.length - 2)
      .map(i => w.slice(i, i + 3).mkString(" "))
      .distinct.map(s => h60(s) % P31)
    val mh = (0 until 16).map { j =>
      hs.map(h => ((2L * j + 1) * h + 7919L * j) % P31).min
    }
    (0 until 4).map(b =>
      b -> (0 until 4).map(r => mh(b * 4 + r)).mkString(","))
  }

  /** Candidate near-dup pairs across ALL micro-batches seen so far:
    * a new arrival pairs with every doc already retained in any of its
    * 4 band buckets (and with same-batch bucket-mates). Output is
    * (d1, d2, band) with d1 < d2. */
  def candidates(docs: DataFrame): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        bands(text).map { case (b, s) => BandRow(s"$b|$s", id) }
      }
      .groupByKey(_.sig)
      .flatMapGroupsWithState[List[Long], Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[BandRow], state: GroupState[List[Long]]) =>
          val band = key.takeWhile(_ != '|').toInt
          val seen = state.getOption.getOrElse(Nil)
          val (admitted, out) = admitAndPair(band, seen, rows.map(_.docId).toSeq)
          state.update(seen ++ admitted)
          out.iterator
      }
  }

  /** Bounded-state variant of [[candidates]] — the ingest-time analogue
    * of [[StreamDedup.dedupWithinWatermark]]: candidate pairs are only
    * emitted between docs whose event times lie within `horizonMs` of
    * the stream frontier (declared semantics: near-dups further apart
    * than the horizon are the batch sweep's job, exactly like
    * `dropDuplicatesWithinWatermark`'s state/recall trade).
    *
    * Event time is derived deterministically from the doc id (1 s per
    * id, offset a day past the epoch) mirroring [[StreamDedup]]. Two
    * mechanisms bound state:
    *   - docs older than the watermark are evicted from a bucket BEFORE
    *     pairing whenever the bucket receives data (a group with new
    *     arrivals never fires `hasTimedOut`, so in-function eviction is
    *     what keeps a hot bucket's membership inside the horizon);
    *   - buckets receiving no data are dropped wholesale by an
    *     event-time timeout set at the newest member's timestamp, so
    *     the live state is bounded by the buckets touched within one
    *     horizon, independent of total stream length.
    */
  def candidatesWithinWatermark(docs: DataFrame,
      horizonMs: Long = 3600000L): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 1000000L + 86400L * 1000000L))
      .selectExpr("doc_id", "text", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        bands(text).map { case (b, s) => BandRowTs(s"$b|$s", id, ts) }
      }
      // the watermark must sit ABOVE the typed flatMap: a typed map strips
      // attribute metadata, and the event-time-timeout checker requires a
      // delayKey-tagged column in the stateful operator's direct child
      .withWatermark("ts", s"$horizonMs milliseconds")
      .groupByKey(_.sig)
      .flatMapGroupsWithState[List[(Long, Long)], Candidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[BandRowTs],
         state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val band = key.takeWhile(_ != '|').toInt
            val wm = state.getCurrentWatermarkMs()
            // evict members past the horizon (watermark = frontier − horizon)
            val live = state.getOption.getOrElse(Nil).filter(_._2 >= wm)
            // drop LATE arrivals symmetrically: flatMapGroupsWithState
            // still delivers rows whose event time is already behind the
            // watermark, and admitting one would pair outside the
            // declared horizon (the eviction above only polices members
            // already in state, not incoming rows)
            val rs = rows.toList.filter(_.ts.getTime >= wm)
            val byId = rs.groupBy(_.docId).map { case (id, xs) =>
              id -> xs.map(_.ts.getTime).max
            }
            val (admitted, out) =
              admitAndPair(band, live.map(_._1), rs.map(_.docId))
            val next = live ++ admitted.map(id => id -> byId(id))
            // every member evicted and every arrival late → bucket dies now
            if (next.isEmpty) { state.remove(); Iterator.empty }
            else {
              state.update(next)
              // bucket dies when its newest member leaves the horizon
              val maxTs = next.map(_._2).max
              state.setTimeoutTimestamp(math.max(maxTs + 1, wm + 1))
              out.iterator
            }
          }
      }
  }

  /** Replay a finite directory of document parquet files (one file per
    * micro-batch) and collect the candidate stream. */
  def runToCompletion(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String): DataFrame = {
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = candidates(docs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Replay helper for [[candidatesWithinWatermark]]; returns the
    * collected candidates plus the final state-store row count (live
    * band buckets) so callers can assert the state bound. */
  def runWithinWatermark(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, horizonMs: Long = 3600000L): (DataFrame, Long) = {
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = candidatesWithinWatermark(docs, horizonMs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    val stateRows =
      try {
        q.processAllAvailable()
        q.recentProgress.reverse
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .headOption.map(_.numRowsTotal).getOrElse(-1L)
      } finally q.stop()
    (spark.table(queryName), stateRows)
  }
}
