package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SearchOps, TextOps}

/** Lexical retrieval guarantees: the distributed BM25-variant scorer
  * equals a sequential brute-force reference bit-for-bit (same Long
  * truncating arithmetic), and the plan keeps the corpus-side token
  * stream behind a broadcast semi-join (only matched postings
  * shuffle).
  */
class SearchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-search-ops-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: identical integer-exact BM25 variant. */
  private def reference(
      docs: Seq[(Long, Array[String])],
      queries: Seq[(Long, Seq[String])],
      k: Int): Seq[(Long, Long, Long, Long)] = {
    val n = docs.size.toLong
    val sdl = docs.map(_._2.length.toLong).sum
    val avgdlMilli = sdl * 1000L / n
    val dfOf = scala.collection.mutable.Map.empty[String, Long]
    val allQTerms = queries.flatMap(_._2).toSet
    for ((_, ws) <- docs; t <- ws.toSet if allQTerms.contains(t))
      dfOf(t) = dfOf.getOrElse(t, 0L) + 1L
    queries.flatMap { case (qid, terms) =>
      val scored = docs.flatMap { case (did, ws) =>
        val score = terms.map { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0L) 0L
          else {
            val dl = ws.length.toLong
            val dlnorm = (dl * 1000000L) / avgdlMilli
            val denom = tf * 1000L +
              (SearchOps.K1Milli * (250L + (SearchOps.BMilli * dlnorm) / 1000L)) / 1000L
            val tfpart = (tf * 2200L * 1000000L) / denom
            val idf = math.min(n * 1000L / dfOf(t), SearchOps.IdfClampMilli)
            (idf * tfpart) / 1000L
          }
        }.sum
        if (score > 0L) Some((did, score)) else None
      }
      scored.sortBy { case (did, s) => (-s, did) }
        .take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, (i + 1).toLong, did, s) }
    }
  }

  test("bm25Search equals the sequential integer reference") {
    val raw = TextOps.readDocs(spark, sfDir)
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .toSeq.sortBy(_._1)
    val queries = raw.filter(_._1 % 101 == 0)
      .map { case (id, ws) => (id, ws.slice(1, 6).distinct.toSeq) }
    val want = reference(raw, queries, k = 10)
    val got = Queries.bm25SearchQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(queries.nonEmpty && got.nonEmpty)
    assert(got == want)
    // structural: each query emits ranks 1..k with non-increasing
    // scores (the fixture vocabulary is ~30 template words, so "own
    // doc first" does NOT hold — every term is near-ubiquitous and
    // ranking is dominated by length normalization; the differential
    // check above is the semantic guarantee)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size.toLong))
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }

  test("bm25Search plan: token stream is gated by a broadcast semi-join") {
    val plan = Queries.bm25SearchQ(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("bm25Search handles an empty query relation") {
    val sp = spark; import sp.implicits._
    val docs = TextOps.readDocs(spark, sfDir)
    val empty = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(SearchOps.bm25Search(docs, empty).count() == 0L)
  }
}
