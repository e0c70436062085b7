package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` (SURVEY §2.4 forward surface; the reference
  * itself is batch-only).
  *
  * A session = consecutive events of one user with gaps <= `gapSeconds`.
  * Streaming semantics: a session is EMITTED once a later event proves the
  * gap exceeded (it can never reopen); the still-open tail session lives
  * in the per-user state between micro-batches. State is O(1) per active
  * user — partitioned by user_id, bounded by active-user count,
  * independent of stream length.
  */
object Sessionize {

  final case class Event(user_id: Long, epoch_s: Long, value_c: Long)
  final case class OpenSession(start_s: Long, last_s: Long, n: Long, cents: Long)
  final case class Session(
      user_id: Long, start_s: Long, end_s: Long, n_events: Long, cents: Long)

  /** Shared projection from any (ts: timestamp, user_id, value) events
    * frame to the typed fold input — the single source of the
    * epoch/cents derivation for the batch AND streaming paths. */
  private def toEvents(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col("user_id"),
      unix_timestamp(col("ts")).as("epoch_s"),
      EventStream.cents(col("value")).as("value_c"))
      .as[Event]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] =
    toEvents(graft.Tables.t(spark, dir, "events"))

  /** Fold time-ordered events on top of an optional carried-in open
    * session; returns (closed sessions in order, open tail).
    *
    * Within one invocation the input is sorted, but a LATE event — one
    * arriving in a later micro-batch with an epoch behind the carried
    * session's frontier — still reaches the merge branch (its gap is
    * negative). It is absorbed into the open session with CLAMPED
    * bounds (start = min, last = max), never regressing the frontier:
    * without the clamp a late arrival would drag `last_s` backward and
    * the next on-time event could close a session with end < start.
    * This is the declared no-watermark trade: a late event that belongs
    * to an already-emitted session re-attributes to the open one rather
    * than being dropped. On sorted batch input the clamp is the
    * identity, so the batch kernel (q76's oracle) is unaffected. */
  def fold(userId: Long, carried: Option[OpenSession], sorted: Seq[Event],
      gapSeconds: Long): (Seq[Session], Option[OpenSession]) = {
    val closed = Seq.newBuilder[Session]
    var st = carried
    sorted.foreach { e =>
      st match {
        case Some(s) if e.epoch_s - s.last_s <= gapSeconds =>
          st = Some(OpenSession(math.min(s.start_s, e.epoch_s),
            math.max(s.last_s, e.epoch_s), s.n + 1, s.cents + e.value_c))
        case Some(s) =>
          closed += Session(userId, s.start_s, s.last_s, s.n, s.cents)
          st = Some(OpenSession(e.epoch_s, e.epoch_s, 1, e.value_c))
        case None =>
          st = Some(OpenSession(e.epoch_s, e.epoch_s, 1, e.value_c))
      }
    }
    (closed.result(), st)
  }

  /** Streaming sessionization: emits closed sessions per micro-batch,
    * carries the open tail in GroupState. Returns the collected closed
    * sessions after replaying the finite corpus. */
  def runStream(spark: SparkSession, dir: String,
      gapSeconds: Long = 1800L,
      queryName: String = "sessions"): DataFrame = {
    import spark.implicits._
    // same raw-nanos read recipe as the windowed aggregate, same typed
    // projection as the batch path — no private re-spelling of either
    val src = toEvents(EventStream.readEvents(spark, dir))

    val sessions = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.epoch_s, e.value_c))
          val (closed, open) = fold(uid, state.getOption, sorted, gapSeconds)
          open match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.iterator
      }

    val q = sessions.toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Batch sessionization through the same fold kernel, distributed per
    * user via KeyValueGroupedDataset.flatMapGroups (includes the tail
    * sessions a stream would still hold open). */
  def runBatch(spark: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (e.epoch_s, e.value_c))
        val (closed, open) = fold(uid, None, sorted, gapSeconds)
        (closed ++ open.map(s =>
          Session(uid, s.start_s, s.last_s, s.n, s.cents))).iterator
      }
      .toDF()
  }
}
