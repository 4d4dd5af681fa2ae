package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for headline queries so plan
  * regressions (lost pushdown, missing broadcast, surprise cartesian) are
  * visible. `sbt "runMain graft.Plans [sfDir] [query...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q01_scan_filter_project", "q03_agg_group", "q11_join3_agg",
        "q14_merge_upsert", "q30_ann_topk", "q39_minhash_bands")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
