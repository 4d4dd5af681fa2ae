package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.{CowTable, TableConfig}

/** Empirical 100×-posture probe (VERDICT r7 ask #8): build COW tables at
  * three scales from the SAME driver testdata (sf0.01 lineitem, sf0.1
  * lineitem, and sf0.1 replicated 8× with shifted keys) and measure the
  * storage-heavy operations whose cost must track CHANGED FILES, not table
  * size: small-batch upsert, small-batch delete, and a tail change-feed
  * read. Flat latency across the three scales is the empirical evidence
  * that the design notes claim ("O(changed-files) scaling").
  *
  * Run manually (NOT part of the driver contract):
  * {{{
  * SPARK_GRAFT_SF01=/root/testdata/sf0.01 SPARK_GRAFT_SF1=/root/testdata/sf0.1 \
  *   sbt "runMain graft.ScaleProbe /tmp/scaleprobe"
  * }}}
  * Prints one JSON line per (scale, op) with seconds + file counts.
  */
object ScaleProbe {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/scaleprobe")
    val spark = SparkSession.builder()
      .appName("graft-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sf001 = sys.env.getOrElse("SPARK_GRAFT_SF01", "/root/testdata/sf0.01")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF1", "/root/testdata/sf0.1")

    // key = l_orderkey (first col) — composite stats cover (orderkey, line#)
    def lineitem(dir: String) = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")

    // 8× replication with DISJOINT key ranges (shifted orderkeys): the same
    // key distribution at 8× the files/rows — a scale-up, not a skew change
    def rep8(dir: String) = (0 until 8).map { i =>
      lineitem(dir).withColumn("l_orderkey",
        $"l_orderkey" + lit(i.toLong * 100000000L))
    }.reduce(_ unionByName _)

    // (label, data, target file count) — file count GROWS with the data
    // (as it would on a real lake); the probe claim is that small-batch
    // mutation latency does NOT
    val scales = Seq(
      ("sf0.01", () => lineitem(sf001), 8),
      ("sf0.1", () => lineitem(sf01), 32),
      ("sf0.1x8", () => rep8(sf01), 256))

    for ((name, mk, nParts) <- scales) {
      val root = s"$out/$name"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
      val t = CowTable(spark, s"$root/li",
        TableConfig("li", Seq("l_orderkey", "l_linenumber")))
      val df = mk()
      val (_, tCreate) = time {
        t.create(df.repartitionByRange(nParts, $"l_orderkey"))
      }
      val nFiles = t.manifest(t.currentVersion).files.size
      val rows = t.manifest(t.currentVersion).rowCount

      // small-batch upsert: a contiguous ~2000-orderkey slice (a realistic
      // CDC batch: hot recent keys), pruning to a few files at any scale
      val batch = df.filter($"l_orderkey".between(3000, 5000))
        .limit(1000)
        .withColumn("l_quantity", $"l_quantity" + 1).cache()
      batch.count()
      val (_, tUpsert) = time { t.upsert(batch) }
      val touched = {
        val m = t.manifest(t.currentVersion)
        val prev = t.manifest(t.currentVersion - 1).files.map(_.path).toSet
        m.files.count(f => !prev(f.path))
      }

      // tail change-feed read of that upsert commit
      val vu = t.currentVersion
      val (nChanges, tFeed) = time {
        t.readChangeFeed(vu - 1, vu).count()
      }

      // small-batch delete, same locality
      val dk = df.filter($"l_orderkey".between(8000, 9000))
        .select("l_orderkey", "l_linenumber").limit(500).cache()
      dk.count()
      val (_, tDelete) = time { t.delete(dk) }

      println(s"""{"probe":"$name","rows":$rows,"files":$nFiles,""" +
        s""""create_sec":${f"$tCreate%.2f"},""" +
        s""""upsert_sec":${f"$tUpsert%.2f"},"upsert_files":$touched,""" +
        s""""delete_sec":${f"$tDelete%.2f"},""" +
        s""""feed_sec":${f"$tFeed%.2f"},"feed_rows":$nChanges}""")
      batch.unpersist(); dk.unpersist()
    }
    spark.stop()
  }
}
