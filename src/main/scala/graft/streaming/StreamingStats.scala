package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Stateful Structured Streaming operators over the events stream
  * (SURVEY.md §2.10 extension; builder-prompt streaming list:
  * watermarks + windowed aggs + flatMapGroupsWithState custom state).
  *
  * Both run as incremental AvailableNow drains over a parquet landing
  * dir: each drain processes exactly the new files (exactly-once via
  * the streaming checkpoint), watermarks advance batch-over-batch, and
  * append-mode results are emitted only once finalized — the shape of
  * a periodically-scheduled 100 TB event pipeline.
  */
object StreamingStats {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  private def readEvents(spark: SparkSession, srcDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Hourly event counts per type with a 1-hour watermark; append mode
    * emits a window only after the watermark passes its end (late data
    * within 1 h still lands in the right window).
    */
  def windowedCounts(spark: SparkSession, srcDir: String,
                     outDir: String, ckptDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** UPDATE-mode variant: a serving table that stays CURRENT for every
    * window touched so far (append mode only emits a window once the
    * watermark seals it). Update mode emits the CHANGED (window, type)
    * rows per micro-batch; foreachBatch lands them with dynamic
    * partition overwrite keyed by (win_part, event_type), so exactly
    * the updated cells are replaced — idempotent on batch replay, and
    * concurrent readers of the parquet serving table always see the
    * latest complete value per cell.
    */
  def windowedCountsUpdate(spark: SparkSession, srcDir: String,
                           outDir: String, ckptDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch
          .withColumn("win_part", date_format(col("win_start"), "yyyyMMddHH"))
          .write.mode("overwrite")
          // writer-scoped, NOT spark.conf.set: mutating the session conf
          // would silently turn every later full-table overwrite in the
          // same session into a partial one
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("win_part", "event_type")
          .parquet(outDir)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked event row: `ts` stays in the Dataset so the plan keeps
    * its event-time watermark column for the EventTimeTimeout.
    */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  final case class SessionState(start: Long, last: Long, n: Int)
  /** ALL not-yet-finalized sessions of one user, sorted by start. */
  final case class SessionsState(sessions: List[SessionState])
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** 30-minute session gap, in event-time microseconds. */
  val GapUs: Long = 30L * 60 * 1000000

  /** Merge a timestamp into the session list, coalescing neighbors that
    * now fall within the gap (a late event can BRIDGE two sessions).
    */
  private[streaming] def insert(sessions: List[SessionState], t: Long): List[SessionState] =
    mergeAll(sessions, Array(t))

  /** Merge a WHOLE batch of timestamps in one sort + one coalesce pass
    * (a hot key with k events and n live sessions pays O((k+n)·log(k+n))
    * once, not k separate re-sorts of the session list).
    */
  private[streaming] def mergeAll(sessions: List[SessionState],
                                  ts: Array[Long]): List[SessionState] = {
    if (ts.isEmpty) return sessions
    (sessions ++ ts.iterator.map(t => SessionState(t, t, 1)))
      .sortBy(_.start)
      .foldLeft(List.empty[SessionState]) { (acc, s) =>
        acc match {
          case h :: tl if s.start - h.last <= GapUs =>
            SessionState(h.start, math.max(h.last, s.last), h.n + s.n) :: tl
          case _ => s :: acc
        }
      }.reverse
  }

  /** Custom per-key state: sessions stay in GroupState until the
    * EVENT-TIME watermark passes last+gap — only then is a session
    * truly final (append-mode contract). A gap-crossing event does NOT
    * emit eagerly: a later-but-still-in-watermark event may land
    * INSIDE the gap and must merge the two sessions (the eager version
    * emitted a session that was not final yet).
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[SessionsState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var ss = state.getOption.map(_.sessions).getOrElse(Nil)
          if (!state.hasTimedOut) {
            ss = mergeAll(ss, it.map(_.ts_us).toArray)
          }
          // finalize every session the watermark has sealed
          val (done, live) = ss.partition(s => s.last + GapUs <= wmUs)
          if (live.nonEmpty) {
            state.update(SessionsState(live))
            // fire when the earliest live session becomes sealable
            state.setTimeoutTimestamp(live.map(_.last + GapUs).min / 1000 + 1)
          } else state.remove()
          done.sortBy(_.start).iterator
            .map(s => SessionOut(user, s.start, s.last, s.n))
      }
  }

  def sessionQuery(spark: SparkSession, srcDir: String,
                   outDir: String, ckptDir: String): StreamingQuery = {
    import spark.implicits._
    val events = readEvents(spark, srcDir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    sessionize(events)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
