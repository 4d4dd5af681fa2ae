package graft

import org.apache.spark.sql.SparkSession

/** Focused profiling main: time (warmup + timed noop-sink pass) only the
  * queries named on the command line — the iterate-fast complement to
  * [[Bench]] (which runs the whole suite). Also prints the formatted plan
  * when SPARK_GRAFT_EXPLAIN=1.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    args.foreach { n =>
      if (explain) SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      val w0 = System.nanoTime()
      materialize(n)
      val w = (System.nanoTime() - w0) / 1e9
      val t0 = System.nanoTime()
      materialize(n)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"BENCHONE $n%-28s warm=$w%8.3f timed=$t%8.3f")
    }
    spark.stop()
  }
}
