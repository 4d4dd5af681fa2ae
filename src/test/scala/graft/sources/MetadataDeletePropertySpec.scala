package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** DIFFERENTIAL PROPERTY TEST for [[MetadataDelete.coveredFiles]] — the
  * safety contract a metadata-only DELETE rests on: whenever the
  * evaluator ACCEPTS (returns Some(covered)), the covered set must be
  * row-exact — every row of every covered file satisfies the predicate
  * and no row of any surviving file does. A wrong `All` silently keeps
  * deleted rows out of the drop set's complement (rows the user deleted
  * survive); a wrong `No` silently deletes live rows — at 100 TB both
  * are unrecoverable, so the accept path is checked against a
  * brute-force row evaluation of the same predicate over `_file`-tagged
  * rows. A None (decline) is always safe by construction (the statement
  * falls back to the row-level rewrite) and is not asserted beyond
  * occurring where expected.
  *
  * A seeded sweep (deterministic, no flaky generators) crosses four
  * layouts — day(ts) transform, hour(ts) transform, identity partition
  * with nulls, key-clustered flat — with a predicate battery of aligned
  * and unaligned cuts, ranges, IN/equality/null tests, and conjunctions.
  */
class MetadataDeletePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def rows(n: Int): DataFrame = (1 to n).map { i =>
    val user = if (i % 13 == 0) null else s"u${i % 7}"
    (i.toLong, user,
      java.sql.Timestamp.valueOf(
        f"2024-02-${1 + (i % 6)}%02d ${i % 24}%02d:${(i * 7) % 60}%02d:00"),
      i * 1.5)
  }.toDF("id", "user", "ts", "v")

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  /** (sql form for the brute-force row filter, Filter form for the
    * evaluator) — semantically identical by construction. */
  private def battery: Seq[(String, Filter)] = {
    val cuts = Seq(
      "2024-02-03 00:00:00", "2024-02-03 12:00:00", "2024-02-03 12:30:00",
      "2024-02-01 00:00:00", "2024-02-07 00:00:00", "2024-02-04 17:00:00")
    val tsPreds = cuts.flatMap { c =>
      Seq(
        (s"ts < TIMESTAMP '$c'", LessThan("ts", ts(c)): Filter),
        (s"ts >= TIMESTAMP '$c'", GreaterThanOrEqual("ts", ts(c)): Filter))
    }
    val idPreds = Seq(25L, 100L, 347L, 1000L).flatMap { k =>
      Seq(
        (s"id <= $k", LessThanOrEqual("id", k): Filter),
        (s"id > $k", GreaterThan("id", k): Filter))
    }
    val userPreds = Seq(
      ("user = 'u1'", EqualTo("user", "u1"): Filter),
      ("user IN ('u2', 'u5')", In("user", Array("u2", "u5")): Filter),
      ("user IS NULL", IsNull("user"): Filter),
      ("user IS NOT NULL", IsNotNull("user"): Filter))
    val base = tsPreds ++ idPreds ++ userPreds
    // seeded conjunctions of two distinct base predicates
    val conj = (1 to 12).map { _ =>
      val a = base(rnd.nextInt(base.size))
      val b = base(rnd.nextInt(base.size))
      (s"(${a._1}) AND (${b._1})", And(a._2, b._2): Filter)
    }
    base ++ conj
  }

  /** The property: accept ⇒ exact file partition under brute force. */
  private def check(dir: String, t: CowTable): (Int, Int) = {
    val m = t.manifest(t.currentVersion)
    val schema = CowTable.structFromJson(m.schemaJson)
    val df = spark.read.format("graft").load(dir)
      .select(col("*"), col("_file")).localCheckpoint()
    val totals = df.groupBy("_file").count()
      .as[(String, Long)].collect().toMap
    var accepted, declined = 0
    battery.foreach { case (sql, f) =>
      MetadataDelete.coveredFiles(m, schema, IndexedSeq(f)) match {
        case Some(covered) =>
          accepted += 1
          val cov = covered.map(_.path).toSet
          val matches = df.filter(expr(sql)).groupBy("_file").count()
            .as[(String, Long)].collect().toMap
          totals.foreach { case (abs, total) =>
            val isCovered = cov.exists(rel => abs.endsWith("/" + rel))
            val matched = matches.getOrElse(abs, 0L)
            if (isCovered)
              assert(matched == total,
                s"'$sql': covered file $abs has $matched/$total " +
                  "matching rows — a NOT-ALL file accepted (silent keep)")
            else
              assert(matched == 0L,
                s"'$sql': surviving file $abs has $matched matching " +
                  "rows — a SOME file survived (silent delete)")
          }
        case None => declined += 1
      }
    }
    (accepted, declined)
  }

  test("day(ts) layout: every accepted predicate partitions files exactly") {
    val dir = tmpDir("mdp") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t.create(rows(400))
    val (acc, dec) = check(dir, t)
    // aligned day cuts and partition-interval ranges must convert
    assert(acc >= 4, s"expected aligned cuts to accept, got $acc/$dec")
  }

  test("hour(ts) layout: every accepted predicate partitions files exactly") {
    val dir = tmpDir("mdp") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("hour(ts)")))
    t.create(rows(300))
    val (acc, _) = check(dir, t)
    assert(acc >= 6, "hour-aligned cuts must accept")
  }

  test("identity partition with nulls: every accepted predicate " +
      "partitions files exactly") {
    val dir = tmpDir("mdp") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionKey = Some("user")))
    t.create(rows(400))
    val (acc, _) = check(dir, t)
    // user equality / IN / IS NULL decide from partition paths alone
    assert(acc >= 4, "partition-path predicates must accept")
  }

  test("evolved day(ts) -> hour(ts) table: era-mixed files partition " +
      "exactly; old-era-aligned cuts accept, straddling cuts decline") {
    val dir = tmpDir("mdp") + "/t"
    val t0 = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(rows(200)) // old era: ts_day=... paths
    val t = t0.alterPartitionSpec(Some("hour(ts)"))
    t.upsert(rows(500).filter(col("id") > 200)) // new era: ts_hour=... only
    val m = t.manifest(t.currentVersion)
    assert(m.priorSpecs == Seq("day(ts)"))
    assert(m.files.exists(_.path.contains("ts_day=")) &&
      m.files.exists(_.path.contains("ts_hour=")),
      "fixture must be era-mixed")
    // the full battery property holds over the mixed-era manifest
    val (acc, _) = check(dir, t)
    assert(acc >= 4, "aligned cuts must still accept on the evolved table")
    val schema = CowTable.structFromJson(m.schemaJson)
    // a DAY-aligned retention cut is hour-aligned too: BOTH eras decide
    // their own files — the whole statement stays metadata-only
    val dayCut = MetadataDelete.coveredFiles(m, schema,
      IndexedSeq(LessThan("ts", ts("2024-02-03 00:00:00"))))
    assert(dayCut.isDefined,
      "day-aligned cut must stay metadata-only across the evolution")
    assert(dayCut.get.exists(_.path.contains("ts_day=")) &&
      dayCut.get.exists(_.path.contains("ts_hour=")),
      s"cut must cover files of BOTH eras, got ${dayCut.get.map(_.path)}")
    // an HOUR-aligned (not day-aligned) cut straddles old-era day files:
    // those can be neither All nor No — the statement must DECLINE
    val hourCut = MetadataDelete.coveredFiles(m, schema,
      IndexedSeq(LessThan("ts", ts("2024-02-03 12:00:00"))))
    assert(hourCut.isEmpty,
      "an hour cut straddling a day-era file must decline to rewrite")
  }

  test("key-clustered flat layout: every accepted predicate partitions " +
      "files exactly") {
    val dir = tmpDir("mdp") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      clusterByKey = true))
    t.create(rows(400).repartitionByRange(4, col("id")))
    val m1 = t.manifest(1)
    val (acc, _) = check(dir, t)
    // file-boundary id cuts decide from footer min/max stats
    val boundary = m1.files.flatMap(_.maxKey).map(_.toLong).min
    val covered = MetadataDelete.coveredFiles(m1,
      CowTable.structFromJson(m1.schemaJson),
      IndexedSeq(LessThanOrEqual("id", boundary)))
    assert(covered.exists(_.nonEmpty), "a boundary cut must accept")
    assert(acc >= 1)
  }
}
