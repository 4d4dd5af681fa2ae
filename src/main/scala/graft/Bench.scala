package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per query: one unmeasured warmup pass (session/codegen
  * warmup otherwise lands on whichever query runs first), then one timed pass
  * forced through the noop sink — full materialization of every projected
  * column, so Catalyst can't prune the very expressions a query exists to
  * measure (a bare .count() lets it). Failures are reported in the JSON
  * (never swallowed into a fast fake timing). The JSON line is printed to
  * stdout AND written to SPARK_GRAFT_BENCH_OUT (default BENCH.json) so the
  * driver can parse it out of sbt log noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
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

    // optional args = subset of query names (local profiling); default all
    val names0 = SparkEntry.allQueries.map(_.name)
    val names = if (args.nonEmpty) names0.filter(args.contains) else names0
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // warmup: one full pass (also JIT/codegen-warms every operator)
    names.foreach { n =>
      try materialize(n)
      catch { case e: Throwable => errors(n) = String.valueOf(e.getMessage) }
    }
    val times = names.filterNot(errors.contains).map { n =>
      val t0 = System.nanoTime()
      try materialize(n)
      catch { case e: Throwable => errors(n) = String.valueOf(e.getMessage) }
      n -> (System.nanoTime() - t0) / 1e9
    }.filterNot { case (n, _) => errors.contains(n) }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_ok":${times.size},"n_err":${errors.size},"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    if (errors.nonEmpty) System.err.println(s"[bench] FAILURES: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
