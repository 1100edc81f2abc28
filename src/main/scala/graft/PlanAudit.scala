package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.extract.ExtractorConfig
import graft.pipeline.ExtractPipeline

/** Dev tool: dump `explain(formatted)` for the plans that matter at
  * 100 TB — the production pipeline and the most expensive operators.
  * Curated excerpts + commentary live in PLANS.md; re-run this after
  * touching any of them and re-check the properties listed there.
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val which = if (args.isEmpty) Set.empty[String] else args.toSet
    def dump(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      if (which.isEmpty || which(name)) {
        println(s"\n===== $name =====")
        println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      }

    // the production write path (scan → gate → extract expression →
    // ONE exchange dedup+cluster), exactly as ExtractJob plans it
    dump("production_pipeline") {
      val pages = Queries.pages(spark, sfDir).toDF()
      ExtractPipeline.dedupAndCluster(
        ExtractPipeline.withPartId(
          ExtractPipeline.extractExpr(
            ExtractPipeline.inputGate(pages)
              .select(col("url"), col("warc_ts"), col("html")),
            ExtractorConfig.spaceJoined), 256), 8)
    }
    dump("dedup_minhash")(Queries.dedupMinhash(spark, sfDir))
    dump("shard_pack")(Queries.shardPack(spark, sfDir))
    dump("strat_sample")(Queries.stratSample(spark, sfDir))
    dump("ann_cosine")(Queries.annCosine(spark, sfDir))
    dump("salted_join")(Queries.saltedJoin(spark, sfDir))
    dump("rep_ratio")(Queries.repRatio(spark, sfDir))
    dump("ann_lsh_serve")(Queries.annLshServe(spark, sfDir))
    dump("quality_train")(Queries.qualityTrainQ(spark, sfDir))
    spark.stop()
  }
}
