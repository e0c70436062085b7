package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Multimodal

/** Streaming perceptual near-dup — the ingest-time twin of the batch
  * q143 operator, completing the multimodal streaming surface next to
  * [[StreamNearDup]] (text MinHash) and [[StreamDedup]] (exact digest):
  * a media blob is dHashed on arrival and checked against previously
  * ingested blobs through the same 3×21-bit pigeonhole chunk blocking
  * the batch join uses.
  *
  * Unlike MinHash (whose batch side df-caps shingles on a whole-corpus
  * property no stream can know — the one declared StreamNearDup
  * divergence), dHash has NO corpus-level dependency: the signature is
  * a pure function of the blob, so stream and batch signatures are
  * bit-identical, and because hamming distance is plain arithmetic on
  * two longs, this stream emits EXACT VERIFIED pairs (hamming <= Tau),
  * not candidates — there is no batch verification stage to defer to.
  * The same pair may surface through up to 3 chunk buckets; downstream
  * consumers (and the spec) deduplicate on (d1, d2).
  *
  * State: one [[GroupState]] per live chunk bucket holding (doc_id,
  * signature) members — 16 bytes per member. Per-arrival work is one
  * long-XOR + popcount against each member of the blob's 3 buckets,
  * exactly the Σ bucket² economics of the batch equi-join. Buckets are
  * NOT truncated: a hot bucket (e.g. the all-zero high chunk shared by
  * every short blob) is precisely where the batch side also pays its
  * pairing cost, and truncation would silently lose real pairs. For
  * unbounded feeds, [[pairsWithinWatermark]] bounds state by the
  * [[StreamNearDup]] horizon mechanism instead: members past the
  * watermark are evicted before pairing, idle buckets die on an
  * event-time timeout, and pairs further apart than the horizon are the
  * batch sweep's job.
  */
object StreamPerceptualDedup {

  /** Max hamming distance for a verified pair (q143's declared τ). */
  val Tau = 2

  final case class ChunkRow(key: String, docId: Long, dh: Long)
  final case class ChunkRowTs(
      key: String, docId: Long, dh: Long, ts: java.sql.Timestamp)
  final case class DupPair(d1: Long, d2: Long, hamming: Int)

  /** The 3 (chunk, value) keys of a signature — the batch blocking. */
  def chunkKeys(dh: Long): Seq[(Int, Long)] =
    (0 until 3).map(c => c -> ((dh >>> (21 * c)) & 0x1FFFFFL))

  /** Blob → 63-bit signature (the exact batch kernel). */
  def signature(blob: Array[Byte]): Long = Multimodal.dHash(blob)

  /** Shared bucket kernel: verify each incoming signature against the
    * retained members (and same-batch predecessors), emit pairs within
    * τ, and return the grown membership. Incoming ids are deduped and
    * processed in sorted order so within-batch emission is
    * deterministic. */
  private def admitAndVerify(seen: List[(Long, Long)],
      incoming: Seq[(Long, Long)]): (List[(Long, Long)], List[DupPair]) = {
    // admission check and accumulation are O(1) per row (id Set + buffer
    // append) so a hot bucket (e.g. the all-zero chunk shared by short
    // blobs) pays only the intended Σ bucket² pairing cost, not an extra
    // O(|seen|) scan / List rebuild per arrival
    val seenIds = scala.collection.mutable.HashSet.from(seen.iterator.map(_._1))
    val fresh = incoming.toList.distinct.sortBy(_._1)
      .filter(x => seenIds.add(x._1))
    val out = scala.collection.mutable.ListBuffer.empty[DupPair]
    val members = scala.collection.mutable.ListBuffer.from(seen)
    fresh.foreach { case (id, dh) =>
      members.foreach { case (mid, mdh) =>
        if (mid != id) {
          val ham = java.lang.Long.bitCount(dh ^ mdh)
          if (ham <= Tau)
            out += DupPair(math.min(id, mid), math.max(id, mid), ham)
        }
      }
      members += (id -> dh)
    }
    (members.toList, out.toList)
  }

  /** Exact verified near-dup pairs across all micro-batches seen so
    * far. Output (d1, d2, hamming), d1 < d2; pairs may repeat across
    * the 3 chunk buckets. */
  def pairs(docs: DataFrame): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val dh = signature(text.getBytes("UTF-8"))
        chunkKeys(dh).map { case (c, cv) => ChunkRow(s"$c|$cv", id, dh) }
      }
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Long)], DupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[ChunkRow],
         state: GroupState[List[(Long, Long)]]) =>
          val (members, out) = admitAndVerify(
            state.getOption.getOrElse(Nil), rows.map(r => r.docId -> r.dh).toSeq)
          state.update(members)
          out.iterator
      }
  }

  /** Horizon-bounded variant — [[StreamNearDup.candidatesWithinWatermark]]'s
    * state discipline applied to the perceptual buckets: event time is
    * 1 s per doc id (offset a day past the epoch), members behind the
    * watermark are evicted in-function before pairing, late arrivals
    * are dropped symmetrically, and idle buckets die wholesale on an
    * event-time timeout at their newest member's timestamp — live state
    * is bounded by the buckets touched within one horizon. */
  def pairsWithinWatermark(docs: DataFrame,
      horizonMs: Long = 3600000L): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 1000000L + 86400L * 1000000L))
      .selectExpr("doc_id", "text", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val dh = signature(text.getBytes("UTF-8"))
        chunkKeys(dh).map { case (c, cv) => ChunkRowTs(s"$c|$cv", id, dh, ts) }
      }
      // watermark above the typed flatMap (the StreamNearDup placement
      // contract: the stateful operator's direct child must carry the
      // delayKey-tagged column)
      .withWatermark("ts", s"$horizonMs milliseconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Long, Long)], DupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[ChunkRowTs],
         state: GroupState[List[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val live = state.getOption.getOrElse(Nil).filter(_._3 >= wm)
            val rs = rows.toList.filter(_.ts.getTime >= wm)
            val byId = rs.groupBy(_.docId).map { case (id, xs) =>
              id -> xs.map(_.ts.getTime).max
            }
            val (members, out) = admitAndVerify(
              live.map(m => (m._1, m._2)), rs.map(r => r.docId -> r.dh))
            val liveIds = live.map(_._1).toSet
            val next = live ++ members.collect {
              case (id, dh) if !liveIds.contains(id) => (id, dh, byId(id))
            }
            if (next.isEmpty) { state.remove(); Iterator.empty }
            else {
              state.update(next)
              val maxTs = next.map(_._3).max
              state.setTimeoutTimestamp(math.max(maxTs + 1, wm + 1))
              out.iterator
            }
          }
      }
  }

  /** Replay a finite directory of document parquet files (one file per
    * micro-batch) and collect the verified pair stream. */
  def runToCompletion(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String): DataFrame = {
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = pairs(docs)
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
