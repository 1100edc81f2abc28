package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.sources.PageSource

/** One-shot seed-fixed corpus generator (dev tool): writes N synthetic
  * pages to a parquet dir for bench/scaling runs. Not part of the
  * driver contract.
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val n = sys.env.getOrElse("SPARK_GRAFT_GEN", "500000").toLong
    val parts = sys.env.getOrElse("SPARK_GRAFT_GEN_PARTS", "256").toInt
    val wordScale = sys.env.getOrElse("SPARK_GRAFT_WORD_SCALE", "1").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PageSource.genPages(spark, n, parts, wordScale).toDF()
      .write.mode(SaveMode.Overwrite).parquet(dir)
    println(s"""{"generated":$n,"dir":"$dir","parts":$parts}""")
    spark.stop()
  }
}
