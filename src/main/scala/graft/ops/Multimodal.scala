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

  /** Aspect-preserving resize plan (integer-exact): downscale so the
    * longest side is `maxDim`, never upscale — the preprocessing math a
    * real image pipeline schedules per asset; here it runs on the
    * stub-decoded dims so the whole plan is oracle-checkable.
    */
  def resizePlan(width: Int, height: Int, maxDim: Int): (Int, Int) =
    if (width <= maxDim && height <= maxDim) (width, height)
    else if (width >= height)
      (maxDim, math.max(1, (height.toLong * maxDim / width).toInt))
    else
      (math.max(1, (width.toLong * maxDim / height).toInt), maxDim)

  /** STUB feature extraction: a real deployment would run an encoder
    * over the decoded asset; this fake derives a small deterministic
    * feature vector from the payload bytes (FNV-1a → per-slot
    * splitmix64, unsigned mod 1000) — exactly mirrorable in SQL, so
    * the batch shape (binary in, fixed-width vector out) is
    * oracle-checked end to end.
    */
  def featureStub(payload: Array[Byte], dim: Int): Array[Long] = {
    var h = 0xcbf29ce484222325L
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        h ^= (payload(i) & 0xffL); h *= 0x100000001b3L
        i += 1
      }
    }
    Array.tabulate(dim) { j =>
      java.lang.Long.remainderUnsigned(
        graft.sources.PageSource.splitmix64(h ^ j.toLong), 1000L)
    }
  }

  /** Build a BINARY asset column from the documents table (payload =
    * UTF-8 text bytes standing in for image bytes) and run the batched
    * decode. Binary column → mapPartitions → typed metadata rows.
    */
  private def decodedFrame(spark: SparkSession, sfDir: String): DataFrame = {
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
  }

  def decodeAssets(spark: SparkSession, sfDir: String): DataFrame =
    decodedFrame(spark, sfDir).orderBy("doc_id")

  /** Resize plan per asset over the stub-decoded dims (pure Column
    * exprs would also work; kept typed for symmetry with the decode
    * batch shape). Consumes the UNSORTED decode frame — the
    * presentation orderBy is applied once at the end, never under the
    * opaque typed map (a range-sort there costs a sampling pass plus a
    * full shuffle the optimizer cannot remove).
    */
  def resizeAssets(spark: SparkSession, sfDir: String, maxDim: Int = 256): DataFrame = {
    import spark.implicits._
    decodedFrame(spark, sfDir)
      .select(col("doc_id"), col("width"), col("height"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) =>
        val (ow, oh) = resizePlan(w, h, maxDim)
        (id, w, h, ow, oh)
      })
      .toDF("doc_id", "width", "height", "out_w", "out_h")
      .orderBy("doc_id")
  }

  /** Audio-analog segmentation: stub duration from the payload size,
    * then OVERLAPPING fixed windows (window > stride — the ASR
    * preprocessing shape, distinct from mm_frames' disjoint fan-out):
    * starts at i·stride, i < 1 + ceil((duration-window)/stride), each
    * window clamped to the asset end. Pure Column exprs (explode over
    * sequence) — integer-exact, embarrassingly parallel.
    */
  def segmentAssets(spark: SparkSession, sfDir: String,
                    windowMs: Long = 10000L, strideMs: Long = 5000L): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        (lit(1000L) + length(col("text")).cast("long") % 60000L).as("duration_ms"))
      .withColumn("n_segments",
        lit(1L) + greatest(lit(0L),
          expr(s"(duration_ms - ${windowMs}L + ${strideMs}L - 1) DIV ${strideMs}L")))
      .select(col("doc_id"), col("duration_ms"),
        posexplode(expr("sequence(0L, n_segments - 1)")).as(Seq("seg_idx", "_s")))
      .select(col("doc_id"),
        col("seg_idx").cast("int").as("seg_idx"),
        (col("_s") * strideMs).as("start_ms"),
        least(col("_s") * strideMs + windowMs, col("duration_ms")).as("end_ms"))
      .orderBy("doc_id", "seg_idx")

  /** Batched feature extraction over the binary column (stubbed
    * encoder, real plumbing): one fixed-width vector per asset,
    * emitted as columns for the oracle.
    */
  def embedAssets(spark: SparkSession, sfDir: String, dim: Int = 4): DataFrame = {
    import spark.implicits._
    require(dim >= 1, "dim must be positive")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"),
        encode(col("text"), "UTF-8").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, featureStub(payload, dim).toSeq)
      })
      .toDF("doc_id", "f")
      // one column per feature, honoring dim (a hardcoded f0..f3 would
      // crash for dim<4 and silently truncate for dim>4)
      .select(col("doc_id") +: (0 until dim).map(i => col("f")(i).as(s"f$i")): _*)
      .orderBy("doc_id")
  }
}
