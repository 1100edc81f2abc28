package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** One atomic-append's handle: enough information to re-read EXACTLY
  * the rows that commit added (the Iceberg incremental-scan analog).
  * `token` is implementation-opaque: added data files for parquet, a
  * (start-snapshot, end-snapshot) pair for Iceberg.
  */
final case class Commit(ident: String, token: Seq[String])

/** Storage seam (SURVEY.md §7.2). The production deployment targets
  * Iceberg ([[IcebergTableIO]]: `spark.read.table` /
  * `writeTo(...).append()` with a `bucket(N, url)` hidden-partition
  * transform); NO Iceberg runtime jar exists in this sandbox, so the
  * bench/tests run on [[ParquetTableIO]] with an explicit append
  * layout. The seam keeps the pipeline code identical between the two.
  */
trait TableIO {
  def readPages(spark: SparkSession, ident: String): DataFrame
  def append(df: DataFrame, ident: String): Unit
  def readOrEmpty(spark: SparkSession, ident: String, schema: StructType): DataFrame

  /** Append and return a [[Commit]] handle for the rows just added.
    * The production job aggregates its checkpoint metrics from
    * [[readCommit]] of this handle (columnar read of the small metric
    * columns) instead of re-executing the producing plan — the
    * single-pass contract.
    */
  def appendCommit(df: DataFrame, ident: String): Commit

  /** Rows added by `commit` and nothing else. */
  def readCommit(spark: SparkSession, commit: Commit): DataFrame

  /** Opaque snapshot id of the current table state for C3 lineage:
    * Iceberg's currentSnapshot().snapshotId() on a real lake; a
    * deterministic fingerprint of the data-file manifest (names +
    * lengths, no data read) in the parquet sandbox.
    */
  def snapshotId(spark: SparkSession, ident: String): String

  /** Delete data files a CRASHED append left behind — files physically
    * present but not recorded by any completed [[appendCommit]].
    * Without this a crash mid-append makes every part_id of the run
    * look committed with only PARTIAL rows, and resume silently loses
    * data. No-op where appends are atomic (Iceberg) or where no commit
    * log exists yet (legacy tables). Single-writer protocol. Returns
    * the deleted file names.
    */
  def reconcileOrphanFiles(spark: SparkSession, ident: String): Seq[String] = Seq.empty
}

object ParquetTableIO extends TableIO {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  val checkpointSchema: StructType = StructType(Seq(
    StructField("part_id", IntegerType),
    StructField("n_docs", LongType),
    StructField("n_blocks", LongType),
    StructField("n_kept", LongType),
    StructField("bytes_in", LongType),
    StructField("bytes_out", LongType),
    StructField("url_hash_lo", LongType),
    StructField("url_hash_hi", LongType),
    StructField("attempt", IntegerType),
    StructField("job_id", StringType),
    StructField("wall_ms", LongType),
    StructField("committed_ts", TimestampType),
    // input snapshot id (Iceberg snapshot on a real lake; the manifest
    // fingerprint of the input path in the parquet sandbox) — C3 lineage
    StructField("input_snapshot", StringType)
  ))

  override def readPages(spark: SparkSession, ident: String): DataFrame =
    spark.read.schema(pageSchema).parquet(ident)

  /** Write settings measured on the 500k-page corpus (CodecProbe,
    * BENCH.md): zstd shrinks the extracted output 1.7x vs snappy
    * (urls/text barely snappy-compressible) for ~2% pipeline wall — at
    * 100 TB that is 41% fewer bytes for every downstream scan.
    * Dictionary encoding stays OFF: url/text values are unique, the
    * dictionary is pure overhead (BENCH.md optimization log).
    */
  override def append(df: DataFrame, ident: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .parquet(ident)

  /** Read a table that may not exist yet (first run: no checkpoint). */
  override def readOrEmpty(spark: SparkSession, ident: String, schema: StructType): DataFrame = {
    if (exists(spark, ident)) spark.read.schema(schema).parquet(ident)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def listDataFiles(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.toSeq
  }

  // ---- commit log (_commits/*.list): which data files belong to a
  // COMPLETED append. The list is written (temp + atomic rename) only
  // AFTER the parquet append finishes, so a crash mid-append leaves its
  // files unlisted and reconcileOrphanFiles removes them on the next
  // run — closing the partial-append resume hole. Iceberg makes this
  // whole mechanism a snapshot commit.

  private def commitsPath(ident: String) = new org.apache.hadoop.fs.Path(s"$ident/_commits")

  /** Data-file names recorded by completed appends; None when the
    * table predates the commit log (legacy: trust the directory).
    */
  def committedNames(spark: SparkSession, ident: String): Option[Set[String]] = {
    val cp = commitsPath(ident)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cp)) None
    else Some(fs.listStatus(cp).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      .filter(_.nonEmpty).toSet)
  }

  private def writeCommitList(spark: SparkSession, ident: String,
                              names: Seq[String]): Unit = {
    if (names.isEmpty) return
    val cp = commitsPath(ident)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(cp)
    // monotone sequence number in the name (count of existing lists —
    // sound under the documented single-writer protocol): gives the
    // commit log a total ORDER, which readAsOf/readChanges time travel
    // rides. Legacy unnumbered lists order by modification time.
    val seq = fs.listStatus(cp).count(st =>
      st.isFile && st.getPath.getName.endsWith(".list"))
    val id = java.util.UUID.randomUUID().toString
    val tmp = new org.apache.hadoop.fs.Path(cp, s".tmp-$id")
    val fin = new org.apache.hadoop.fs.Path(cp, f"c-$seq%08d-$id.list")
    val out = fs.create(tmp, true)
    try out.write((names.sorted.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.rename(tmp, fin)
  }

  private val SeqName = """c-(\d{8})-.*\.list""".r

  /** Ordered commit history: one (seq, data-file names) entry per
    * completed append, oldest first. Seq numbers come from the list
    * names; legacy unnumbered lists (pre-time-travel tables) order by
    * modification time and are assigned their position. Empty when the
    * table predates the commit log entirely.
    */
  private def orderedCommitLists(spark: SparkSession, ident: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val cp = commitsPath(ident)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cp)) return Seq.empty
    val lists = fs.listStatus(cp).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
      .toSeq
    // legacy (unnumbered) lists predate the numbering scheme, so they
    // sort FIRST — among themselves by modification time — then the
    // numbered lists by their sequence
    lists.sortBy { st =>
      st.getPath.getName match {
        case SeqName(s) => (1, s.toLong, st.getModificationTime)
        case _          => (0, 0L, st.getModificationTime)
      }
    }
  }

  def commitHistory(spark: SparkSession, ident: String): Seq[(Long, Seq[String])] = {
    val cp = commitsPath(ident)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    orderedCommitLists(spark, ident).zipWithIndex.map { case (st, i) =>
      val in = fs.open(st.getPath)
      val names =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      (i.toLong, names)
    }
  }

  /** Identity of the commit log's FIRST (oldest) list — changes iff
    * the log was reset (CompactJob / DeleteJob swap) and a fresh
    * genesis was adopted. CDC consumers checkpoint this next to their
    * last-seen seq so a log reset is detected (seqs restart at 0) and
    * they fall back to an idempotent full replay instead of silently
    * skipping post-reset commits. Empty string when no log exists.
    */
  def commitLogId(spark: SparkSession, ident: String): String =
    orderedCommitLists(spark, ident).headOption
      .map(_.getPath.getName).getOrElse("")

  /** Snapshot-as-of read: the table as it stood after commit `seq`
    * (inclusive; seqs from [[commitHistory]]). Reads ONLY the files
    * those commits listed — later appends are invisible. NOTE:
    * CompactJob / DeleteJob reset the commit log at their atomic swap,
    * collapsing history to a fresh genesis — time travel spans
    * appends, not rewrites (the documented contract; Iceberg snapshots
    * are the full-fidelity variant of this seam).
    */
  def readAsOf(spark: SparkSession, ident: String, seq: Long): DataFrame = {
    val files = commitHistory(spark, ident)
      .filter(_._1 <= seq).flatMap(_._2)
      .map(n => s"$ident/$n")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** CDC feed: rows ADDED by commits in (fromSeq, toSeq] — on an
    * append-only table the new files ARE the change set, so an
    * incremental consumer reads exactly the delta (no diff join, no
    * full-table scan). toSeq = Long.MaxValue tails the whole log.
    */
  def readChanges(spark: SparkSession, ident: String,
                  fromSeq: Long, toSeq: Long = Long.MaxValue): DataFrame = {
    val files = commitHistory(spark, ident)
      .filter { case (s, _) => s > fromSeq && s <= toSeq }.flatMap(_._2)
      .map(n => s"$ident/$n")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  override def reconcileOrphanFiles(spark: SparkSession, ident: String): Seq[String] =
    committedNames(spark, ident) match {
      case None => Seq.empty
      case Some(ok) =>
        val debris = listDataFiles(spark, ident)
          .filterNot(st => ok.contains(st.getPath.getName))
        val fs = new org.apache.hadoop.fs.Path(ident)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        debris.foreach(st => fs.delete(st.getPath, false))
        debris.map(_.getPath.getName)
    }

  /** Directory-listing diff around the append (single-writer protocol,
    * as documented in ExtractJob); Iceberg replaces this with the
    * commit snapshot's added files — no listing at all. Pre-existing
    * files of a table that predates the commit log are adopted into a
    * genesis list first, so reconciliation never deletes legacy data.
    */
  override def appendCommit(df: DataFrame, ident: String): Commit = {
    val spark = df.sparkSession
    val beforeSt = listDataFiles(spark, ident)
    val before = beforeSt.map(_.getPath.toString).toSet
    val needGenesis = beforeSt.nonEmpty && committedNames(spark, ident).isEmpty
    if (needGenesis) writeCommitList(spark, ident, beforeSt.map(_.getPath.getName))
    // the (possibly empty) _commits dir must exist BEFORE the append:
    // a crash mid-FIRST-append then leaves unlisted files next to an
    // empty log, which reconciliation recognizes as debris
    val cp = commitsPath(ident)
    cp.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(cp)
    append(df, ident)
    val added = listDataFiles(spark, ident).map(_.getPath.toString)
      .filterNot(before.contains).sorted
    writeCommitList(spark, ident, added.map(p => new org.apache.hadoop.fs.Path(p).getName))
    Commit(ident, added)
  }

  override def readCommit(spark: SparkSession, commit: Commit): DataFrame =
    if (commit.token.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(commit.token: _*)

  /** Manifest fingerprint: FNV-1a over sorted (name, length) pairs —
    * changes iff the committed file set changes, computed from a pure
    * listing (no data read).
    */
  override def snapshotId(spark: SparkSession, ident: String): String = {
    val files = listDataFiles(spark, ident)
      .map(st => st.getPath.getName + ":" + st.getLen).sorted
    var h = 0xcbf29ce484222325L
    files.foreach { f =>
      f.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        h ^= (b & 0xffL); h *= 0x100000001b3L
      }
    }
    java.lang.Long.toHexString(h)
  }
}

/** The deployment-target implementation (SURVEY.md §7.2): identifiers
  * are catalog table names (`lake.crawl.pages`), not paths. Compiles
  * against pure Spark APIs — DataFrameWriterV2 and string read options
  * — so the SAME jar runs here and on a cluster with
  * `spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog`
  * configured; only then do the calls resolve to Iceberg commits.
  *
  * Mapping of the seam:
  *   - appendCommit  → `writeTo(t).append()` (one atomic snapshot);
  *     the token is the (start, end) snapshot-id pair bracketing it.
  *   - readCommit    → incremental scan via the public
  *     `start-snapshot-id`/`end-snapshot-id` read options.
  *   - snapshotId    → newest row of the `<t>.snapshots` metadata table.
  *   - output clustering → `bucket(N, url)` hidden partitioning via
  *     [[createPagesExtracted]]; Iceberg routes appended rows without
  *     any explicit repartition column in the data.
  *
  * The non-atomic two-append window ExtractJob documents for parquet
  * disappears here: each append IS a snapshot, and the orphan
  * reconciliation read (`part_id`s present in output) comes from
  * manifest metadata, not a data scan.
  */
object IcebergTableIO extends TableIO {

  override def readPages(spark: SparkSession, ident: String): DataFrame =
    spark.read.table(ident)

  override def append(df: DataFrame, ident: String): Unit =
    df.writeTo(ident).append()

  override def readOrEmpty(spark: SparkSession, ident: String, schema: StructType): DataFrame =
    if (spark.catalog.tableExists(ident)) spark.read.table(ident)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  override def appendCommit(df: DataFrame, ident: String): Commit = {
    val spark = df.sparkSession
    val before = currentSnapshot(spark, ident)
    df.writeTo(ident).append()
    Commit(ident, Seq(before.getOrElse(""), currentSnapshot(spark, ident).getOrElse("")))
  }

  override def readCommit(spark: SparkSession, commit: Commit): DataFrame = {
    val Seq(start, end) = commit.token
    val r = spark.read.option("end-snapshot-id", end)
    (if (start.isEmpty) r else r.option("start-snapshot-id", start)).table(commit.ident)
  }

  private def currentSnapshot(spark: SparkSession, ident: String): Option[String] =
    if (!spark.catalog.tableExists(ident)) None
    else spark.sql(
        s"SELECT snapshot_id FROM $ident.snapshots ORDER BY committed_at DESC LIMIT 1")
      .collect().headOption.map(_.getLong(0).toString)

  override def snapshotId(spark: SparkSession, ident: String): String =
    currentSnapshot(spark, ident).getOrElse("empty")

  /** DDL for the output table: url-bucketed hidden partitioning — the
    * Iceberg-native form of ExtractPipeline.dedupAndCluster's
    * url_hash clustering (SURVEY.md §2.8 R1).
    */
  def createPagesExtracted(spark: SparkSession, ident: String, buckets: Int): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $ident (
         |  url STRING, warc_ts TIMESTAMP, text STRING,
         |  span_starts ARRAY<INT>, span_ends ARRAY<INT>,
         |  span_block_ids ARRAY<INT>, span_scores ARRAY<FLOAT>,
         |  n_blocks INT, n_kept INT, bytes_in BIGINT, bytes_out BIGINT,
         |  part_id INT)
         |USING iceberg
         |PARTITIONED BY (bucket($buckets, url))""".stripMargin)
}
