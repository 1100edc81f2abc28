package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Commit, IcebergTableIO, ParquetTableIO, TableIO}

/** The storage seam's commit contract: appendCommit identifies exactly
  * the rows it added, readCommit returns them and nothing else, and
  * snapshotId changes iff the table state changes — the invariants the
  * single-pass ExtractJob metrics depend on. IcebergTableIO is
  * compile-checked against the same trait (runtime needs a catalog,
  * SURVEY.md §7.2); the seam swap itself is exercised here.
  */
class TableIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tableio-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("appendCommit token = exactly the added files; readCommit = exactly those rows") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tio").toString + "/t"
    val io: TableIO = ParquetTableIO // through the seam type

    val c1 = io.appendCommit((0L until 10L).toDF("id"), path)
    assert(c1.token.nonEmpty)
    val c2 = io.appendCommit((100L until 105L).toDF("id"), path)
    assert(c2.token.nonEmpty)
    assert(c1.token.toSet.intersect(c2.token.toSet).isEmpty, "commits must not share files")

    val r1 = io.readCommit(spark, c1).select("id").as[Long].collect().sorted.toSeq
    val r2 = io.readCommit(spark, c2).select("id").as[Long].collect().sorted.toSeq
    assert(r1 == (0L until 10L))
    assert(r2 == (100L until 105L))
    // the full table is the union — commits partition it
    assert(spark.read.parquet(path).count() == 15)
  }

  test("empty append yields a readable empty commit") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tio-empty").toString + "/t"
    val io: TableIO = ParquetTableIO
    io.appendCommit((0L until 3L).toDF("id"), path)
    val c = io.appendCommit(spark.range(0).toDF("id").filter(lit(false)), path)
    val back = io.readCommit(spark, c)
    assert(back.columns.isEmpty || back.count() == 0)
  }

  test("snapshotId is a pure function of the committed file set") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tio-snap").toString + "/t"
    val io: TableIO = ParquetTableIO
    val empty = io.snapshotId(spark, path)
    io.append((0L until 5L).toDF("id"), path)
    val s1 = io.snapshotId(spark, path)
    val s1again = io.snapshotId(spark, path)
    assert(s1 == s1again, "stable without new commits")
    assert(s1 != empty, "must change when data lands")
    io.append((5L until 9L).toDF("id"), path)
    assert(io.snapshotId(spark, path) != s1, "must change on append")
  }

  test("time travel: readAsOf replays any commit prefix; readChanges is the exact delta") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-tt").toString + "/t"
    ParquetTableIO.appendCommit((0L until 10L).toDF("id"), path)
    ParquetTableIO.appendCommit((10L until 25L).toDF("id"), path)
    ParquetTableIO.appendCommit((25L until 30L).toDF("id"), path)

    val hist = ParquetTableIO.commitHistory(spark, path)
    assert(hist.map(_._1) == Seq(0L, 1L, 2L))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      if (df.schema.isEmpty) Seq.empty
      else df.select("id").as[Long].collect().sorted.toSeq
    assert(ids(ParquetTableIO.readAsOf(spark, path, 0L)) == (0L until 10L))
    assert(ids(ParquetTableIO.readAsOf(spark, path, 1L)) == (0L until 25L))
    assert(ids(ParquetTableIO.readAsOf(spark, path, 2L)) == (0L until 30L))
    // CDC: (from, to] delta only — no full-table scan, no diff join
    assert(ids(ParquetTableIO.readChanges(spark, path, 0L, 2L)) == (10L until 30L))
    assert(ids(ParquetTableIO.readChanges(spark, path, 2L)) == Seq.empty)
    // an incremental consumer that checkpoints "last seen seq" drains
    // exactly once: tail from each seq and union == full table
    val drained = (Seq(-1L, 0L, 1L).zip(Seq(0L, 1L, 2L))).flatMap {
      case (f, t) => ids(ParquetTableIO.readChanges(spark, path, f, t))
    }
    assert(drained.sorted == (0L until 30L))
  }

  test("time travel: legacy unnumbered commit lists order by modification time") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-ttl").toString + "/t"
    ParquetTableIO.appendCommit((0L until 4L).toDF("id"), path)
    // forge a legacy (unnumbered) list name for the first commit
    val cp = new org.apache.hadoop.fs.Path(s"$path/_commits")
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(cp).filter(_.getPath.getName.endsWith(".list")).head.getPath
    fs.rename(first, new org.apache.hadoop.fs.Path(cp, "c-legacy.list"))
    Thread.sleep(1100) // HDFS-API modtime granularity is a full second
    ParquetTableIO.appendCommit((4L until 9L).toDF("id"), path)
    val hist = ParquetTableIO.commitHistory(spark, path)
    assert(hist.size == 2)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("id").as[Long].collect().sorted.toSeq
    // legacy lists predate numbering → they sort first: the true
    // append order survives the migration
    assert(ids(ParquetTableIO.readAsOf(spark, path, 0L)) == (0L until 4L))
    assert(ids(ParquetTableIO.readAsOf(spark, path, 1L)) == (0L until 9L))
    assert(ids(ParquetTableIO.readChanges(spark, path, 0L)) == (4L until 9L))
  }

  test("Iceberg implementation satisfies the seam (no catalog in sandbox)") {
    // compile-time: IcebergTableIO IS a TableIO; runtime methods need a
    // configured catalog, so only the catalog-free surface is driven.
    val io: TableIO = IcebergTableIO
    assert(io.snapshotId(spark, "nonexistent_catalog_table") == "empty")
    val e = io.readOrEmpty(spark, "nonexistent_catalog_table",
      ParquetTableIO.checkpointSchema)
    assert(e.count() == 0)
    assert(e.schema == ParquetTableIO.checkpointSchema)
  }
}
