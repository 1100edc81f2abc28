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

  /** Watermarked event row: `ts` stays in the Dataset so the plan keeps
    * its event-time watermark column for the EventTimeTimeout.
    */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** 30-minute session gap, in event-time microseconds. */
  val GapUs: Long = 30L * 60 * 1000000

  /** Custom per-key state: open sessions live in GroupState; a session
    * closes (and is emitted, append-mode) when a same-user event
    * arrives past the gap, or when the EVENT-TIME TIMEOUT fires — the
    * watermark passed last+gap, so no late event can reopen it.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (state.hasTimedOut) {
            state.getOption.foreach { s =>
              out += SessionOut(user, s.start, s.last, s.n)
            }
            state.remove()
          } else {
            var cur = state.getOption
            it.map(_.ts_us).toArray.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last > GapUs =>
                  out += SessionOut(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + GapUs) / 1000 + 1)
            }
          }
          out.iterator
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
