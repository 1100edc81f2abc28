package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PageSource

/** Compaction of the append-based output table: file count drops,
  * every column (including resume-critical part_id) survives verbatim
  * (full-row digest), and a post-compaction ExtractJob rerun still
  * resumes cleanly (nothing re-appended).
  */
class CompactJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-compact-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("compaction reduces files, preserves every row byte-for-byte, keeps resume working") {
    val pagesDir = java.nio.file.Files.createTempDirectory("compact-pages").toString
    val outDir = java.nio.file.Files.createTempDirectory("compact-out").toString
    PageSource.genPages(spark, 800, 16).toDF()
      .write.mode("overwrite").parquet(pagesDir)

    // two incremental appends → plenty of small files
    val (rows1, _) = ExtractJob.run(spark, pagesDir, outDir, 8, "c1")
    assert(rows1 == 800L)
    val tableDir = s"$outDir/pages_extracted"
    val before = spark.read.parquet(tableDir)
      .orderBy("url").collect().map(_.toString)
    val filesBefore = new java.io.File(tableDir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore > 1)

    val r = CompactJob.run(spark, tableDir, targetFileBytes = 1L << 30)
    assert(r.rows == 800L)
    assert(r.filesBefore == filesBefore && r.filesAfter == 1)
    assert(!new java.io.File(tableDir + ".bak").exists())
    assert(!new java.io.File(tableDir + ".compacting").exists())

    // row-level identity after the rewrite
    val after = spark.read.parquet(tableDir)
      .orderBy("url").collect().map(_.toString)
    assert(after.toSeq == before.toSeq)

    // resume over the compacted table: rerun appends nothing
    val (rows2, resumed) = ExtractJob.run(spark, pagesDir, outDir, 8, "c2")
    assert(rows2 == 800L && resumed == 8L)
  }
}
