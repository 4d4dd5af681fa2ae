package graft.sources

import graft.SparkSpec
import graft.storage.{ColRange, CowTable, FileEntry, TableConfig}
import org.apache.spark.sql.functions._

/** TopN / LIMIT pushdown: manifest-level file pruning must never change
  * results (the scan stays a superset source under a kept global sort),
  * and must actually skip files when stats certify a threshold. */
class TopNPruneSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- unit

  /** Differential property: for random per-file row populations (nulls,
    * deletion vectors, statless files included), every row that ANY
    * tiebreak could place in the top-k — strictly-better-than-boundary
    * rows plus the whole boundary value class — must live in a kept file,
    * across all four direction/null-ordering variants. */
  test("pruneTopN keeps every possible top-k row (differential sweep)") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 120) {
      val nFiles = 1 + rnd.nextInt(8)
      // per file: full row population (None = null), deleted subset
      val pops: Seq[(Seq[Option[Long]], Set[Int])] = (0 until nFiles).map { _ =>
        val n = 1 + rnd.nextInt(12)
        val vals = Seq.fill(n)(
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toLong))
        val deleted = (0 until n).filter(_ => rnd.nextInt(6) == 0).toSet
        (vals, deleted)
      }
      val statless = (0 until nFiles).filter(_ => rnd.nextInt(6) == 0).toSet
      val nullsUnknown = (0 until nFiles).filter(_ => rnd.nextInt(4) == 0).toSet
      val files = pops.zipWithIndex.map { case ((vals, del), i) =>
        val nonNull = vals.flatten
        FileEntry(s"f$i.parquet", vals.size.toLong,
          minKey = None, maxKey = None,
          extra =
            if (statless(i) || nonNull.isEmpty) Map.empty
            else Map("v" -> ColRange(
              Some(nonNull.min.toString), Some(nonNull.max.toString))),
          nulls =
            if (nullsUnknown(i)) Map.empty
            else Map("v" -> vals.count(_.isEmpty).toLong),
          dvPath = if (del.nonEmpty) Some(s"dv$i") else None,
          dvRows = del.size.toLong)
      }
      val live: Seq[(Int, Option[Long])] = pops.zipWithIndex.flatMap {
        case ((vals, del), i) =>
          vals.zipWithIndex.collect { case (v, r) if !del(r) => (i, v) }
      }
      for {
        desc <- Seq(true, false)
        nullsFirst <- Seq(true, false)
        k <- Seq(1, 3, 1 + rnd.nextInt(20))
      } {
        val t = GraftTopN("v", "v", isPk = false, numeric = true,
          desc = desc, nullsFirst = nullsFirst, limit = k)
        val keptIdx = TopNFilePrune.pruneTopN(files, t)
          .map(_.path.stripPrefix("f").stripSuffix(".parquet").toInt).toSet
        // rank class: nulls placed per variant, values per direction
        def cls(v: Option[Long]): Long = v match {
          case None => if (nullsFirst) Long.MinValue else Long.MaxValue
          case Some(x) => if (desc) -x else x
        }
        val sorted = live.map { case (i, v) => (cls(v), i) }.sortBy(_._1)
        if (sorted.size >= k) {
          val boundary = sorted(k - 1)._1
          val required = sorted.filter(_._1 <= boundary)
          val missing = required.filterNot(r => keptIdx(r._2))
          assert(missing.isEmpty,
            s"trial $trial desc=$desc nullsFirst=$nullsFirst k=$k: " +
              s"dropped files ${missing.map(_._2).distinct} hold " +
              s"possible top-$k rows; kept=$keptIdx\n" +
              files.mkString("\n"))
        } else
          assert(keptIdx == files.indices.toSet,
            s"fewer than k live rows must disable pruning (trial $trial)")
      }
    }
  }

  test("pruneTopN lexical variant keeps possible top-k rows") {
    val words = Vector("ant", "bee", "cat", "dog", "eel", "fox", "gnu")
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 40) {
      val pops: Seq[Seq[String]] = (0 until 5).map(_ =>
        Seq.fill(1 + rnd.nextInt(6))(words(rnd.nextInt(words.size))))
      val files = pops.zipWithIndex.map { case (vals, i) =>
        FileEntry(s"f$i.parquet", vals.size.toLong, None, None,
          extra = Map("w" -> ColRange(Some(vals.min), Some(vals.max))),
          nulls = Map("w" -> 0L))
      }
      for (desc <- Seq(true, false); k <- Seq(1, 2, 5)) {
        val t = GraftTopN("w", "w", isPk = false, numeric = false,
          desc = desc, nullsFirst = !desc, limit = k)
        val keptIdx = TopNFilePrune.pruneTopN(files, t)
          .map(_.path.stripPrefix("f").stripSuffix(".parquet").toInt).toSet
        val live = pops.zipWithIndex.flatMap { case (vs, i) => vs.map(i -> _) }
        val sorted =
          if (desc) live.sortBy(_._2)(Ordering[String].reverse)
          else live.sortBy(_._2)
        if (sorted.size >= k) {
          val b = sorted(k - 1)._2
          val required = sorted.filter(r =>
            if (desc) r._2 >= b else r._2 <= b)
          assert(required.forall(r => keptIdx(r._1)),
            s"trial $trial desc=$desc k=$k kept=$keptIdx files=$files")
        }
      }
    }
  }

  test("pruneLimit covers the limit in exact live rows") {
    val files = (0 until 6).map(i => FileEntry(s"f$i", 10L, None, None,
      dvPath = if (i == 0) Some("dv") else None, dvRows = if (i == 0) 4L else 0L))
    assert(TopNFilePrune.pruneLimit(files, 5).map(_.path) == Seq("f0"))
    // f0 has only 6 live rows — limit 7 must keep two files
    assert(TopNFilePrune.pruneLimit(files, 7).map(_.path) == Seq("f0", "f1"))
    assert(TopNFilePrune.pruneLimit(files, 1000) == files)
  }

  // ---------------------------------------------------------- end-to-end

  test("ORDER BY key DESC LIMIT k prunes files and stays exact") {
    val dir = tmpDir("topn")
    val rows = (1L to 400L).map(i => (i, s"n$i"))
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true)).create(
      rows.toDF("id", "name").repartition(4))
    val top = spark.read.format("graft").load(dir + "/t")
      .orderBy($"id".desc).limit(7)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=id DESC LIMIT 7"), plan)
    // clustered layout: the top 7 ids live in one of four files
    assert(plan.contains("files=1/4"), plan)
    assert(top.as[(Long, String)].collect().toSeq ==
      (400L to 394L by -1).map(i => (i, s"n$i")))
    // ASC mirror reads the other tail
    val bottom = spark.read.format("graft").load(dir + "/t")
      .orderBy($"id".asc).limit(7)
    assert(bottom.queryExecution.executedPlan.toString.contains("files=1/4"))
    assert(bottom.as[(Long, String)].collect().toSeq ==
      (1L to 7L).map(i => (i, s"n$i")))
  }

  test("TopN over a stats column with nulls: ASC NULLS FIRST keeps null files") {
    val dir = tmpDir("topn")
    // file A: v in [100, 149]; file B: v in [200, 249]; file C: all-null v
    val df = ((1L to 50L).map(i => (i, Some(i + 99L))) ++
      (51L to 100L).map(i => (i, Some(i + 149L))) ++
      (101L to 110L).map(i => (i, None: Option[Long])))
      .toDF("id", "v")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, maxRecordsPerFile = 50,
      statsColumns = Seq("v"))).create(df.repartitionByRange(3, $"id"))
    val g = spark.read.format("graft").load(dir + "/t")
    // ASC: Spark default is NULLS FIRST — the all-null file must be kept
    // and the nulls returned first
    val asc = g.orderBy($"v".asc, $"id").limit(12)
    val got = asc.as[(Long, Option[Long])].collect().toSeq
    assert(got.take(10).forall(_._2.isEmpty), got)
    assert(got.drop(10).map(_._2) == Seq(Some(100L), Some(101L)), got)
    // DESC NULLS LAST: nulls lose; the low file prunes
    val desc = g.orderBy($"v".desc, $"id").limit(5)
    val dPlan = desc.queryExecution.executedPlan.toString
    assert(dPlan.contains("pushedTopN=v DESC LIMIT 5"), dPlan)
    assert(desc.as[(Long, Option[Long])].collect().map(_._2).toSeq ==
      (249L to 245L by -1).map(Some(_)))
  }

  test("TopN guarantee respects deletion vectors") {
    val dir = tmpDir("topn")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, changeDataFeed = true, deletionVectors = true))
    t.create((1L to 200L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2))
    // delete most of the top file's rows: the guarantee must shrink to the
    // LIVE count, so the second file is kept when needed
    t.delete((150L to 200L).toDF("id"))
    val top = spark.read.format("graft").load(dir + "/t")
      .orderBy($"id".desc).limit(60)
    assert(top.as[(Long, String)].collect().toSeq ==
      (149L to 90L by -1).map(i => (i, s"n$i")))
  }

  test("TopN on a transform source column prunes from day-dir intervals") {
    val dir = tmpDir("topn")
    // day(ts)-partitioned, NO statsColumns: bounds must come from the
    // partition-dir intervals (the hidden-partitioning evidence path)
    def ts(d: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 1, d, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val rows = for (d <- 1 to 20; i <- 1 to 10)
      yield (d * 100L + i, ts(d, i % 10))
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)"))).create(rows.toDF("id", "ts"))
    val top = spark.read.format("graft").load(dir + "/t")
      .select("id", "ts").orderBy($"ts".desc, $"id").limit(15)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=ts DESC LIMIT 15"), plan)
    // top 15 rows live in the two newest day dirs
    assert(plan.contains("files=2/20"), plan)
    val expected = rows.sortBy { case (id, t) => (-t.getTime, id) }.take(15)
    assert(top.as[(Long, java.sql.Timestamp)].collect().toSeq == expected)
  }

  test("TopN composes with a CONSUMED partition filter") {
    val dir = tmpDir("topn")
    // hive partitioning + key clustering: seg equality is consumed exactly
    // (no residual Filter node), so Spark still pushes the TopN — pruning
    // then runs over the partition-pruned file set
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = Some("seg"), clusterByKey = true,
      maxRecordsPerFile = 50)).create(
      (1L to 200L).map(i => (i, if (i % 2 == 0) "A" else "B", s"n$i"))
        .toDF("id", "seg", "name"))
    val top = spark.read.format("graft").load(dir + "/t")
      .filter($"seg" === "A").orderBy($"id".desc).limit(5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=id DESC LIMIT 5"), plan)
    assert(top.as[(Long, String, String)].collect().toSeq ==
      (200L to 192L by -2).map(i => (i, "A", s"n$i")))
  }

  test("bare LIMIT prunes to a live-row-covering prefix") {
    val dir = tmpDir("topn")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"))).create(
      (1L to 400L).map(i => (i, s"n$i")).toDF("id", "name").repartition(4))
    val lim = spark.read.format("graft").load(dir + "/t").limit(50)
    val plan = lim.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=50"), plan)
    assert(plan.contains("files=1/4"), plan)
    assert(lim.count() == 50L)
  }

  test("unstatted sort column declines the push, results exact") {
    val dir = tmpDir("topn")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true)).create(
      (1L to 100L).map(i => (i, s"n${100 - i}")).toDF("id", "name")
        .repartition(2))
    val top = spark.read.format("graft").load(dir + "/t")
      .orderBy($"name".desc).limit(3)
    assert(!top.queryExecution.executedPlan.toString.contains("pushedTopN"),
      top.queryExecution.executedPlan.toString)
    assert(top.as[(Long, String)].collect().toSeq ==
      Seq((1L, "n99"), (2L, "n98"), (3L, "n97")))
  }
}
