package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Storage seam (SURVEY.md §7.2). The production deployment targets
  * Iceberg (`spark.read.table` / `writeTo(...).append()` with a
  * `bucket(N, url)` hidden-partition transform); NO Iceberg runtime jar
  * exists in this sandbox, so the bench/tests run on this parquet
  * implementation with an explicit append layout. The seam keeps the
  * pipeline code identical between the two.
  */
trait TableIO {
  def readPages(spark: SparkSession, path: String): DataFrame
  def append(df: DataFrame, path: String): Unit
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame
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
    // input snapshot id (Iceberg snapshot on a real lake; the input
    // path fingerprint in the parquet sandbox) — C3 lineage
    StructField("input_snapshot", StringType)
  ))

  override def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pageSchema).parquet(path)

  override def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Read a table that may not exist yet (first run: no checkpoint). */
  override def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
  }
}
