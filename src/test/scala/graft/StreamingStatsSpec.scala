package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingStats

/** Stateful streaming: watermarked windowed aggregation and
  * flatMapGroupsWithState sessionization over incremental drains.
  */
class StreamingStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val eventsParquet = "/root/testdata/sf0.001/events.parquet"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-stats-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Split driver events at the median ts into two landing batches. */
  private def landTwoBatches(srcDir: String): Unit = {
    val ev = spark.read.parquet(eventsParquet)
      .withColumn("ts", col("ts").cast("timestamp"))
    val mid = ev.stat.approxQuantile("event_id", Array(0.5), 0.0)(0)
    ev.filter(col("event_id") <= mid).write.mode("append").parquet(srcDir)
    // second batch written later by the caller
    ev.filter(col("event_id") > mid).write.mode("overwrite")
      .parquet(srcDir + "_part2")
  }

  test("watermarked windowed counts emit finalized windows across drains") {
    val base = Files.createTempDirectory("graft-swc").toString
    val src = s"$base/src"
    landTwoBatches(src)
    StreamingStats.windowedCounts(spark, src, s"$base/out", s"$base/ckpt")
      .awaitTermination()
    val afterFirst = spark.read.parquet(s"$base/out").count()
    // second drain: watermark advances past the early windows
    spark.read.parquet(src + "_part2").write.mode("append").parquet(src)
    StreamingStats.windowedCounts(spark, src, s"$base/out", s"$base/ckpt")
      .awaitTermination()
    val emitted = spark.read.parquet(s"$base/out")
    assert(emitted.count() > afterFirst, "no windows finalized on drain 2")
    // every finalized window matches the batch computation exactly
    val batch = spark.read.parquet(eventsParquet)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    emitted.collect().foreach { r =>
      val k = (r.getTimestamp(0), r.getString(1))
      assert(batch(k) == r.getLong(2), s"window $k count mismatch")
    }
  }

  test("flatMapGroupsWithState sessionization matches batch sessions") {
    val base = Files.createTempDirectory("graft-sess").toString
    val src = s"$base/src"
    landTwoBatches(src)
    StreamingStats.sessionQuery(spark, src, s"$base/out", s"$base/ckpt")
      .awaitTermination()
    spark.read.parquet(src + "_part2").write.mode("append").parquet(src)
    StreamingStats.sessionQuery(spark, src, s"$base/out", s"$base/ckpt")
      .awaitTermination()
    val emitted = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(emitted.nonEmpty, "no sessions emitted")
    assert(emitted.distinct.size == emitted.size, "duplicate session emissions")

    // batch reference: same gap rule over all events per user
    val all = spark.read.parquet(eventsParquet)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .select("user_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val batchSessions = all.flatMap { case (user, ts) =>
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int)]
      var start = ts.head; var last = ts.head; var n = 1
      ts.tail.foreach { t =>
        if (t - last > StreamingStats.GapUs) {
          sessions += ((user, start, last, n)); start = t; last = t; n = 1
        } else { last = t; n += 1 }
      }
      sessions += ((user, start, last, n))
      sessions
    }.toSet
    emitted.foreach { s =>
      assert(batchSessions.contains(s), s"streamed session $s not in batch result")
    }
  }
}
