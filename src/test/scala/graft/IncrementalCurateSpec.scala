package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Daily-drop incremental curation: new content admits, every
  * duplicate class against prior drops rejects (url revisit, exact
  * copy, near-dup, transitive chains through the drop), re-ingesting
  * a drop is a no-op, and the final canonical corpus is dup-free by
  * the batch operators' own judgment.
  */
class IncrementalCurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-inc-curate-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // >= 16 distinct words so the near-dup mutation (drop last word)
  // keeps Jaccard well above the 700-milli verify threshold
  private def textOf(tag: String): String =
    (0 until 16).map(k => s"${tag}w$k").mkString(" ")
  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
  private def write(rows: Seq[(String, String)], dir: String): Unit = {
    val sp = spark; import sp.implicits._
    rows.toDF("url", "text").write.mode("overwrite").parquet(dir)
  }

  test("drops dedup against state: url revisits, exact, near, transitive chains; idempotent re-drop") {
    val state = tmp("inc-state")

    // drop 1: ten fresh docs — all admit
    val d1 = (0 until 10).map(i => (s"https://inc.example/p/$i", textOf(s"a$i")))
    val d1Dir = tmp("inc-d1"); write(d1, d1Dir)
    val r1 = IncrementalCurate.ingestDrop(spark, d1Dir, state)
    assert(r1.nDrop == 10 && r1.nNewUrls == 10 && r1.nGated == 10)
    assert(r1.nStateLinked == 0 && r1.nAdmitted == 10 && r1.nCanonicalTotal == 10)

    // drop 2: 3 fresh docs + every duplicate class against drop 1:
    //  - url revisit (same url_norm, any text) -> filtered by urls
    //  - exact copy of a1 under a new url     -> sha edge to state
    //  - near-dup of a2 (last word dropped)   -> band edge to state
    //  - transitive chain: fresh text n1, its near-dup n1' (within
    //    drop), and n1'' = near-dup of BOTH n1' and old a3 — wait, keep
    //    it planted simply: chainA ~ chainB within the drop, and
    //    chainB ~ a3's text near-dup — so chainA must reject through
    //    the chain even though chainA itself never touches state
    val a3near = textOf("a3").split(' ').dropRight(1).mkString(" ")
    val d2 = Seq(
      ("https://inc.example/q/0", textOf("b0")),
      ("https://inc.example/q/1", textOf("b1")),
      ("https://inc.example/q/2", textOf("b2")),
      ("https://inc.example/p/4#frag", textOf("zz")), // url revisit of p/4
      ("https://inc.example/q/exact", textOf("a1")), // exact copy of a1
      ("https://inc.example/q/near", textOf("a2").split(' ').dropRight(1).mkString(" ")),
      ("https://inc.example/q/chainB", a3near), // near-dups a3 AND chainA
      ("https://inc.example/q/chainA", a3near.split(' ').dropRight(1).mkString(" "))
    )
    val d2Dir = tmp("inc-d2"); write(d2, d2Dir)
    val r2 = IncrementalCurate.ingestDrop(spark, d2Dir, state)
    assert(r2.nDrop == 8)
    assert(r2.nNewUrls == 7, "the p/4 revisit is already-processed by url_norm")
    assert(r2.nGated == 7)
    assert(r2.nAdmitted == 3, s"only b0,b1,b2 are new content, got ${r2.nAdmitted}")
    assert(r2.nStateLinked == 4, "exact + near + both chain members link to state")
    assert(r2.nCanonicalTotal == 13)
    val canon = spark.read.parquet(s"$state/canonical")
    val urls = canon.select("url_norm").collect().map(_.getString(0)).toSet
    assert(Seq("q/0", "q/1", "q/2").forall(q => urls.exists(_.contains(q))))
    assert(!urls.exists(_.contains("chain")) && !urls.exists(_.contains("q/exact")))

    // re-ingesting drop 2 is a no-op (url idempotence)
    val r2b = IncrementalCurate.ingestDrop(spark, d2Dir, state)
    assert(r2b.nNewUrls == 0 && r2b.nAdmitted == 0 && r2b.nCanonicalTotal == 13)

    // the final canonical corpus is dup-free by the BATCH operators'
    // own judgment: no exact edges, no verified near-dup edges
    val docs = canon.select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    assert(TextOps.exactDupEdges(docs).count() == 0L)
    assert(TextOps.dedupMinhashEdges(spark, docs).count() == 0L)

    // determinism: replay both drops into a fresh state -> same corpus
    val state2 = tmp("inc-state2")
    IncrementalCurate.ingestDrop(spark, d1Dir, state2)
    IncrementalCurate.ingestDrop(spark, d2Dir, state2)
    val urls2 = spark.read.parquet(s"$state2/canonical")
      .select("url_norm").collect().map(_.getString(0)).toSet
    assert(urls2 == urls)
  }
}
