package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer induction over the corpus — the byte-pair-encoding
  * trainer (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units") every LLM data pipeline runs before
  * token counting, shard packing, or sequence packing mean anything:
  * the learned merge table IS the tokenizer.
  *
  * Shape (the published trainer's, made Spark-native): BPE training
  * never iterates the corpus — it iterates the WORD-FREQUENCY
  * DICTIONARY. So the corpus-scale work is exactly one map-side-
  * combined word census (the same shuffle ngram_census already pays),
  * capped at the top `VocabCap` word types (count desc, word asc —
  * deterministic; the cap bounds driver state the way Classifier's
  * ≤4096-bucket census does). The merge loop then runs on the driver
  * over ≤cap rows — O(cap · merges) integer work, independent of
  * corpus size, which is why tokenizer training is cheap at 100 TB
  * while token COUNTING is not.
  *
  * Determinism contract (the DuckDB oracle unrolls the loop): pair
  * counts are adjacent-position counts weighted by word frequency;
  * the winning pair minimizes (-count, left, right) — ASCII-ordinal
  * ties; merge application is greedy left-to-right non-overlapping,
  * which over a run of consecutive match positions (possible only
  * when left == right) keeps exactly the even offsets — the
  * "run-parity" form the SQL mirror computes relationally.
  */
object Bpe {

  /** Word-census cap (public: the oracle embeds it). */
  val VocabCap = 512

  /** Learned merges per training run (public: the oracle unrolls
    * exactly this many iterations).
    */
  val Merges = 6

  /** Greedy left-to-right merge of one symbol sequence: scan, merge
    * (l, r) at the first match, resume AFTER the merged pair.
    * Equal to the run-parity rule the SQL mirror uses.
    */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The driver-side merge loop over a (word, count) census. Returns
    * (step, left, right, merged, pair_count) — fails loud if the
    * census runs out of pairs before `merges` steps (a corpus too
    * small to train on should not silently yield a shorter table than
    * the oracle recomputes).
    */
  def trainMerges(census: Seq[(String, Long)],
                  merges: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Seq[(Array[String], Long)] =
      census.map { case (w, c) => (w.toCharArray.map(_.toString), c) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 0
    while (step < merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      require(pc.nonEmpty, s"BPE census exhausted at step $step (< $merges merges)")
      val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
      out += ((step.toLong, l, r, l + r, cnt))
      vocab = vocab.map { case (syms, c) => (applyMerge(syms, l, r), c) }
      step += 1
    }
    out.result()
  }

  /** The capped word census — the one corpus-scale pass. */
  def wordCensus(docs: DataFrame, cap: Int = VocabCap): Seq[(String, Long)] =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(cap)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  /** The bpe_train query: census → driver merge loop → the K-row merge
    * table (the tokenizer artifact itself).
    */
  def bpeTrain(spark: SparkSession, docs: DataFrame,
               merges: Int = Merges, cap: Int = VocabCap): DataFrame = {
    val rows = trainMerges(wordCensus(docs, cap), merges)
      .map { case (s, l, r, m, c) => Row(s, l, r, m, c) }
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("pair_left", StringType, nullable = false),
      StructField("pair_right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).orderBy(col("step"))
  }

  /** Encode one word with a learned merge list (applied in learned
    * order — the classic BPE encoder). Driver/test utility; the
    * corpus-wide form is a per-row map over a broadcast merge table.
    */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] =
    merges.foldLeft(word.toCharArray.map(_.toString)) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }

  /** Persist a trained merge table (the tokenizer artifact —
    * Classifier.saveModel's convention): a tiny step-ordered parquet
    * that travels with the corpus it tokenizes.
    */
  def saveMerges(spark: SparkSession, dir: String,
                 merges: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    merges.toDF("step", "pair_left", "pair_right", "merged", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a stored merge table in learned order — encoding under the
    * loaded table is spec-pinned equal to train-time encoding.
    */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(dir)
      .select(col("step"), col("pair_left"), col("pair_right"))
      .orderBy(col("step"))
      .collect().toSeq.map(r => (r.getString(1), r.getString(2)))

  /** Corpus-wide token counting under the TRAINED tokenizer — the
    * number token budgeting, shard packing and mixture math should
    * use (whitespace counts over-estimate tokens for common words and
    * under-estimate for rare ones). Trains first (one census pass),
    * then one per-row encode pass: the ≤merges-row merge table rides
    * the task closure, and a per-partition memo caches each distinct
    * word's token count — Zipf makes the cache hit rate ~1 at web
    * scale, so the encode cost is O(distinct words per partition),
    * not O(corpus tokens). Zero shuffles on the encode pass.
    */
  /** Per-partition memo bound for [[bpeTokenCount]] — a partition of
    * unique junk tokens (random ids, base64 blobs) must not grow the
    * memo without limit; past the cap, words are encoded directly.
    */
  val MemoCap = 1 << 16

  def bpeTokenCount(spark: SparkSession, docs: DataFrame,
                    merges: Int = Merges, cap: Int = VocabCap): DataFrame =
    bpeTokenCountWith(spark, docs,
      trainMerges(wordCensus(docs, cap), merges)
        .map { case (_, l, r, _, _) => (l, r) })

  /** [[bpeTokenCount]] under an ALREADY-trained (or loaded) merge
    * table — the serving form (TokenizerJob trains once, then counts;
    * a stored tokenizer counts without retraining).
    */
  def bpeTokenCountWith(spark: SparkSession, docs: DataFrame,
                        table: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.Map.empty[String, Long]
        def tokensOf(w: String): Long = memo.get(w) match {
          case Some(n) => n
          case None =>
            val n = encode(w, table).length.toLong
            if (memo.size < MemoCap) memo.update(w, n)
            n
        }
        it.map { case (id, text) =>
          val words = text.split(' ').filter(_.nonEmpty)
          var toks = 0L
          words.foreach { w => toks += tokensOf(w) }
          (id, words.length.toLong, toks)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens")
      .orderBy(col("doc_id"))
  }
}
