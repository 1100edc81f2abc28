package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque BINARY payload + typed metadata,
  * processed in BATCHES through `mapPartitions` (the Scala analog of the
  * Pandas-UDF/mapInPandas batch shape — no image/audio libraries exist
  * in this container, so the DECODE step is a clearly-marked
  * deterministic STUB; everything Spark-side — schema, binary column
  * handling, batch iteration, partitioning — is real and tested).
  */
object Multimodal {

  /** Typed metadata the "decoder" emits per asset. */
  final case class AssetMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String
  )

  /** STUB decode: a real deployment would decode the binary here
    * (image/video codec). This fake derives metadata deterministically
    * from the payload size and id — mirrorable in SQL so the batch
    * plumbing itself is oracle-checked.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): AssetMeta = {
    val n = if (payload == null) 0L else payload.length.toLong
    AssetMeta(
      doc_id = docId,
      n_bytes = n,
      width = (64L + n % 512L).toInt,
      height = (64L + docId % 512L).toInt,
      n_frames = (1L + n % 10L).toInt,
      format = if (docId % 2 == 0) "png" else "jpeg"
    )
  }

  /** Build a BINARY asset column from the documents table (payload =
    * UTF-8 text bytes standing in for image bytes) and run the batched
    * decode. Binary column → mapPartitions → typed metadata rows.
    */
  def decodeAssets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val assets = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"),
        encode(col("text"), "UTF-8").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    assets.mapPartitions { batch =>
      // batch-shaped processing: the iterator IS the batch; a real
      // decoder would be initialized once here, per partition.
      batch.map { case (id, payload) => decodeStub(id, payload) }
    }.toDF()
      .select("doc_id", "n_bytes", "width", "height", "n_frames", "format")
      .orderBy("doc_id")
  }
}
