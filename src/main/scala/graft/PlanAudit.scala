package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for named queries (builder tool, not driver contract):
  * `sbt "runMain graft.PlanAudit <sfDir> <query...>"` prints each query's
  * formatted physical plan — the .explain review loop the build rules ask
  * for after every operator lands. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (n, fn) =>
      println(s"===== $n =====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
