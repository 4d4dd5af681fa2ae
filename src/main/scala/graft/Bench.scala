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
  *
  * CONTAMINATION TELEMETRY (round-3 lesson: a driver bench polluted by a
  * concurrent process recorded 86s for a 2s query, and nothing in the
  * artifact said so): the JSON now carries `/proc/loadavg` at start/end,
  * total JVM GC seconds across the run, per-query warmup wall times, and a
  * `remeasured` map — any query whose timed pass exceeded 3x its own warmup
  * (and 1s absolute) is automatically re-measured once and the minimum is
  * reported, with both raw values preserved. A contaminated run is now
  * self-evident from the artifact instead of needing a manual re-run.
  */
object Bench {
  private def loadavg(): String =
    scala.util.Try(Files.readString(Paths.get("/proc/loadavg")).trim)
      .getOrElse("unavailable")

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

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

    val loadStart = loadavg()
    val gcStart = gcMillis()

    // optional args = subset of query names (local profiling); default all
    val names0 = SparkEntry.allQueries.map(_.name)
    val names = if (args.nonEmpty) names0.filter(args.contains) else names0
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // warmup: one full timed pass (also JIT/codegen-warms every operator)
    val warmups = names.flatMap { n =>
      val t0 = System.nanoTime()
      try { materialize(n); Some(n -> (System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable => errors(n) = String.valueOf(e.getMessage); None
      }
    }.toMap
    val remeasured =
      scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val times = names.filterNot(errors.contains).map { n =>
      def pass(): Double = {
        val t0 = System.nanoTime()
        materialize(n)
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val t = pass()
        // timed >> its own warmup ⇒ something else was eating the machine
        // during the timed pass — re-measure once, report the minimum
        val finalT =
          if (t > 3 * warmups(n) && t > 1.0) {
            val t2 = pass()
            remeasured(n) = (t, t2)
            math.min(t, t2)
          } else t
        Some(n -> finalT)
      } catch {
        case e: Throwable =>
          errors(n) = String.valueOf(e.getMessage); None
      }
    }.collect { case Some(kv) => kv }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val qs = jmap(times.map { case (k, v) => k -> v.toString })
    val ws = jmap(times.map { case (k, _) => k -> warmups(k).toString })
    val rs = jmap(remeasured.map { case (k, (a, b)) => k -> s"[$a,$b]" })
    val errs = jmap(errors.map { case (k, v) => k -> jstr(v) })
    val total = times.map(_._2).sum
    val gcSec = (gcMillis() - gcStart) / 1e3
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup":$ws,"remeasured":$rs,"errors":$errs,"n_ok":${times.size},"n_err":${errors.size},"loadavg_start":${jstr(loadStart)},"loadavg_end":${jstr(loadavg())},"gc_sec":$gcSec,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    if (errors.nonEmpty) System.err.println(s"[bench] FAILURES: ${errors.keys.mkString(", ")}")
    if (remeasured.nonEmpty) System.err.println(
      s"[bench] REMEASURED (timed >3x warmup — contention suspected): " +
        remeasured.map { case (k, (a, b)) => f"$k $a%.2f->$b%.2f" }
          .mkString(", "))
    spark.stop()
  }
}
