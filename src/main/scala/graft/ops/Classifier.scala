package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps.fnv1a64
import graft.sources.PageSource.splitmix64

/** TRAINED quality classifier — the supervised-training step the
  * hashing-trick inference stub (TextOps.qualityClassify) points at,
  * kept integer-exact so the DuckDB oracle replays training
  * bit-for-bit (the k-means discipline applied to supervised
  * learning):
  *
  *  - features: hashed unigram PRESENCE — bucket = fnv1a64(word)
  *    unsigned mod [[NBuckets]] (the fastText hashing trick: no
  *    vocabulary table, the bucket id is the feature id);
  *  - labels: a PLANTED lexicon rule (doc positive iff it contains a
  *    word with splitmix64(fnv1a64(w)) mod 17 == 0), so training has
  *    a ground truth whose recovery is measurable; a real deployment
  *    swaps in human labels and nothing else changes;
  *  - training: one-pass purity induction on the EVEN-doc_id half —
  *    a bucket joins the model iff its positive doc-frequency clears
  *    minSupport and its class-purity odds clear purityFactor
  *    (pd·Nneg > nd·Npos·F, all integers). This is the
  *    Naive-Bayes-flavored feature induction shallow quality filters
  *    actually use; unlike a full-batch perceptron it cannot
  *    oscillate, and the learned model is exactly interpretable (the
  *    selected buckets);
  *  - evaluation: the ODD half is held out — the returned view
  *    carries a `holdout` flag so the caller can measure
  *    generalization, not memorization (minSupport already blocks
  *    single-doc memorized buckets from entering the model).
  *
  * Scale shape: per-doc distinct-bucket vectors are built in one
  * row-local map (no shuffle), the class census is one bucket-keyed
  * aggregate (<= NBuckets+1 groups after map-side combine), the model
  * collected to the driver is <= NBuckets ints (the broadcast-weights
  * serving shape), and scoring is one more row-local map. Two corpus
  * passes, zero doc-keyed shuffles.
  */
object Classifier {

  /** Feature-hash buckets (power of two keeps the SQL mirror's mod cheap). */
  val NBuckets: Int = 4096

  def bucketOf(w: String): Int =
    java.lang.Long.remainderUnsigned(fnv1a64(w), NBuckets.toLong).toInt

  /** Planted supervision: w is a "lexicon" word iff
    * splitmix64(fnv1a64(w)) mod 17 == 0.
    */
  def inLexicon(w: String): Boolean =
    java.lang.Long.remainderUnsigned(splitmix64(fnv1a64(w)), 17L) == 0L

  /** Per-doc (sorted distinct buckets, planted label) — one row-local
    * map, no shuffle.
    */
  private def features(spark: SparkSession, docs: DataFrame) = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(' ').filter(_.nonEmpty)
        val y = if (words.exists(inLexicon)) 1L else -1L
        (id, words.map(bucketOf).distinct.sorted, y)
      }
      .toDF("doc_id", "buckets", "y")
  }

  /** Induce the model (selected bucket ids, sorted) from the even-half
    * of `docs` — <= NBuckets ints to the driver, the broadcast-weights
    * serving shape.
    */
  def trainModel(spark: SparkSession, docs: DataFrame,
                 purityFactor: Long = 5L, minSupport: Long = 2L): Array[Int] = {
    import spark.implicits._
    val train = features(spark, docs).filter(col("doc_id") % 2 === 0).persist()
    val totRow = train.agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
      sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nn")).collect()(0)
    val (np, nn) = (totRow.getLong(0), totRow.getLong(1))
    // census collected to the driver (<= NBuckets rows) and the purity
    // odds compared in BigInt: pd·nn and nd·np·F are products of DOC
    // COUNTS, which overflow Long (and THROW under ANSI) on a
    // 10^10-doc corpus if left as SQL arithmetic. The DuckDB mirror
    // casts the same products to HUGEINT for the same reason.
    val census = train
      .select(explode(col("buckets")).as("bucket"), col("y"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pd"),
        sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nd"))
      .collect()
    val selected = census.iterator
      .filter { r =>
        val (pd, nd) = (r.getLong(1), r.getLong(2))
        pd >= minSupport &&
          BigInt(pd) * BigInt(nn) > BigInt(nd) * BigInt(np) * BigInt(purityFactor)
      }
      .map(_.getInt(0)).toArray.sorted
    train.unpersist()
    selected
  }

  /** Score every doc under a model: (doc_id, label ±1, n_hits =
    * selected buckets present, pred = n_hits>0, holdout = odd id),
    * ordered by doc_id.
    */
  def scoreWith(spark: SparkSession, docs: DataFrame, model: Array[Int]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    features(spark, docs).as[(Long, Seq[Int], Long)]
      .map { case (id, buckets, y) =>
        val sel = bc.value
        val hits = buckets.count(b => java.util.Arrays.binarySearch(sel, b) >= 0).toLong
        (id, y, hits, hits > 0L, id % 2 == 1L)
      }
      .toDF("doc_id", "label", "n_hits", "pred", "holdout")
      .orderBy("doc_id")
  }

  /** Train on the even-doc_id half of `docs` (doc_id, text) and score
    * every doc under the learned model. Deterministic — same docs,
    * same result, any partitioning.
    */
  def qualityTrain(spark: SparkSession, docs: DataFrame,
                   purityFactor: Long = 5L, minSupport: Long = 2L): DataFrame =
    scoreWith(spark, docs, trainModel(spark, docs, purityFactor, minSupport))

  /** Holdout evaluation of the induced model — the ONE row a filtering
    * team actually reads: confusion counts and integer-exact
    * precision/recall/accuracy permille over the ODD-doc_id half
    * (never seen by training). Denominator-zero cases report 0 (an
    * empty-model run must yield a row, not a division error).
    */
  def qualityEval(spark: SparkSession, docs: DataFrame,
                  purityFactor: Long = 5L, minSupport: Long = 2L): DataFrame =
    qualityTrain(spark, docs, purityFactor, minSupport)
      .filter(col("holdout"))
      .agg(
        count(lit(1)).cast("long").as("n_holdout"),
        sum(when(col("label") === 1L && col("pred"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === -1L && col("pred"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1L && !col("pred"), 1L).otherwise(0L)).as("fn"),
        sum(when(col("label") === -1L && !col("pred"), 1L).otherwise(0L)).as("tn"))
      .select(col("n_holdout"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000 DIV (tp + fp) END")
          .cast("long").as("precision_permille"),
        expr("CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000 DIV (tp + fn) END")
          .cast("long").as("recall_permille"),
        expr("CASE WHEN tp + fp + fn + tn = 0 THEN 0 ELSE (tp + tn) * 1000 DIV (tp + fp + fn + tn) END")
          .cast("long").as("accuracy_permille"))

  /** Persist a trained model (train/serve split, same lifecycle as
    * ops.AnnIndex): one tiny parquet of selected bucket ids. A serving
    * job [[loadModel]]s it and runs [[scoreWith]] — no training pass.
    */
  def saveModel(spark: SparkSession, model: Array[Int], modelDir: String): Unit = {
    import spark.implicits._
    model.toSeq.toDF("bucket").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(modelDir)
  }

  def loadModel(spark: SparkSession, modelDir: String): Array[Int] = {
    import spark.implicits._
    spark.read.parquet(modelDir).select(col("bucket")).as[Int].collect().sorted
  }
}
