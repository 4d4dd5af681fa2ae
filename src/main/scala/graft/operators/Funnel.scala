package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (signup → click → purchase): for each key, the
  * first time each stage was reached AFTER the previous stage's reach
  * time — the MATCH_RECOGNIZE-lite shape product analytics runs
  * constantly.
  *
  * Plan shape: stage-k reach time is a per-key window MIN of
  * `when(type = stage_k && ts >= t_{k-1}, ts)` — k chained Window ops
  * over the SAME `partitionBy(key)` spec, so Catalyst plans ONE hash
  * shuffle on the key and no per-stage sort (the windows are unordered
  * whole-partition frames); the stage count rollup is a single
  * map-side-combinable aggregate over the per-key stage times. No
  * self-joins, no per-stage pass over the event log.
  *
  * Semantics: stage times are INCLUSIVE of ties (an event at exactly the
  * previous stage's reach time counts — the same instant can satisfy two
  * stages), matching the SQL replay `e.ts >= prev.t`. With `maxGapSeconds`
  * the match is FIRST-TOUCH (each stage anchors at its earliest valid
  * time — the Amplitude/GA convention): a user whose EARLIEST signup's
  * window expired is not re-anchored to a later signup, deliberately.
  */
object Funnel {

  /** Per-key stage-reach times: (key, t_1 .. t_k), t_i null once the
    * funnel broke. Rows = distinct keys with at least stage-1.
    * `maxGapSeconds` bounds each step: stage k must happen within that
    * many seconds of stage k-1's reach time (the "converted within 7
    * days" form), compared in exact int64 micros. */
  def stageTimes(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(keyCol)
    val tsUs = EventTime.micros(events, tsCol)
    val staged = stages.zipWithIndex.foldLeft(
      events.withColumn("__us", tsUs)) {
      case (df, (stage, i)) =>
        val afterPrev =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage &&
            col(s"__t$i").isNotNull && col(tsCol) >= col(s"__t$i")
        val cond = maxGapSeconds match {
          case Some(g) if i > 0 =>
            afterPrev && col("__us") - col(s"__u$i") <= g * 1000000L
          case _ => afterPrev
        }
        df.withColumn(s"__t${i + 1}",
            min(when(cond, col(tsCol))).over(w))
          .withColumn(s"__u${i + 1}",
            min(when(cond, col("__us"))).over(w))
    }
    staged
      .groupBy(col(keyCol))
      .agg(first(col("__t1")).as("t_1"),
        (2 to stages.size).map(i =>
          first(col(s"__t$i")).as(s"t_$i")): _*)
      .filter(col("t_1").isNotNull)
  }

  /** Funnel rollup: one row per stage with how many keys reached it (in
    * order), plus the stage index for stable ordering. */
  def counts(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = stageTimes(events, keyCol, tsCol, typeCol, stages,
      maxGapSeconds)
    val agg = times.agg(
      count(when(col("t_1").isNotNull, 1)).as("n_1"),
      (2 to stages.size).map(i =>
        count(when(col(s"t_$i").isNotNull, 1)).as(s"n_$i")): _*)
    // single-row explode, not one select per stage (which would re-run
    // the whole funnel plan per stage)
    agg.select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
        struct(lit(i + 1).cast("long").as("step_idx"),
          lit(stage).as("step"), col(s"n_${i + 1}").as("n_users"))
      }: _*)).as("r"))
      .select("r.*")
  }

  // ---- SQL-surface aggregate form --------------------------------------

  private def insertSorted(a: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(a, v)
    if (i >= 0) a // distinct: duplicates never change a min-above query
    else {
      val ip = -i - 1
      val out = new Array[Long](a.length + 1)
      System.arraycopy(a, 0, out, 0, ip)
      out(ip) = v
      System.arraycopy(a, ip, out, ip + 1, a.length - ip)
      out
    }
  }

  private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var n = 0
    while (i < a.length || j < b.length) {
      val take =
        if (j >= b.length) a(i)
        else if (i >= a.length) b(j)
        else math.min(a(i), b(j))
      if (i < a.length && a(i) == take) i += 1
      if (j < b.length && b(j) == take) j += 1
      out(n) = take; n += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Per-key stage-reach times as a MERGEABLE typed aggregate — the SQL
    * surface of [[stageTimes]] (`funnel_stages(ts, type, 'signup', ...)`):
    * state is one sorted distinct-micros array PER STAGE, so partials
    * combine map-side and merge order-independently; the dependent walk
    * t_i = min stage-i time >= t_{i-1} (within the optional gap) runs once
    * at finish. Identical semantics to the window form (inclusive ties,
    * first-touch anchoring); state is O(the key's distinct stage-event
    * times) — the same rows the window shape shuffles to the key's
    * partition. */
  final class StageTimesAgg(stages: Seq[String], maxGapUs: Option[Long])
      extends Aggregator[(Long, String), Array[Array[Long]],
        Seq[Option[Long]]] {
    private val idx: Map[String, Int] = stages.zipWithIndex.toMap

    override def zero: Array[Array[Long]] =
      Array.fill(stages.size)(Array.empty[Long])

    override def reduce(buf: Array[Array[Long]],
        in: (Long, String)): Array[Array[Long]] = {
      if (in._1 == Long.MinValue) return buf // null-ts sentinel: skip
      idx.get(in._2).foreach(i => buf(i) = insertSorted(buf(i), in._1))
      buf
    }

    override def merge(a: Array[Array[Long]],
        b: Array[Array[Long]]): Array[Array[Long]] =
      a.indices.toArray.map(i => mergeSorted(a(i), b(i)))

    override def finish(buf: Array[Array[Long]]): Seq[Option[Long]] = {
      var prev: Option[Long] = None
      stages.indices.map { i =>
        val t: Option[Long] =
          if (i == 0) buf(0).headOption
          else prev.flatMap { p =>
            val arr = buf(i)
            val j0 = java.util.Arrays.binarySearch(arr, p)
            val j = if (j0 >= 0) j0 else -j0 - 1 // min element >= p
            if (j >= arr.length) None
            else maxGapUs match {
              case Some(g) if arr(j) - p > g => None
              case _ => Some(arr(j))
            }
          }
        prev = t
        t
      }
    }

    override def bufferEncoder: Encoder[Array[Array[Long]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Long]]]()
    override def outputEncoder: Encoder[Seq[Option[Long]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Option[Long]]]()
  }

  /** Column form: ARRAY<TIMESTAMP> of stage-reach times (null from the
    * first broken stage on) — `GROUP BY key` + this aggregate replays
    * [[stageTimes]] without the window. Null ts/type rows are skipped. */
  def stageTimesAgg(ts: Column, tpe: Column, stages: Seq[String],
      maxGapSeconds: Option[Long] = None): Column = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got ${stages.mkString(", ")}")
    val agg = udaf(new StageTimesAgg(stages, maxGapSeconds.map(_ * 1000000L)))
    val us = coalesce(
      unix_micros(ts.cast(org.apache.spark.sql.types.TimestampType)),
      lit(Long.MinValue))
    transform(agg(us, coalesce(tpe, lit(""))), u => timestamp_micros(u))
  }
}

/** Weekly cohort retention as ONE mergeable aggregate: per key, the week
  * of the first event (the cohort) plus the distinct week offsets the key
  * was active — `cohort_weeks(ts)` grouped by user collapses q156's
  * two-aggregate-plus-join shape into a single hash aggregate (one
  * shuffle of the event log, state O(distinct active weeks per key)). */
object Cohort {
  final case class Result(cohort_week: java.sql.Date, offsets: Seq[Long])

  final class WeeksAgg
      extends Aggregator[java.sql.Date, Array[Int], Result] {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils

    private def insertSorted(a: Array[Int], v: Int): Array[Int] = {
      val i = java.util.Arrays.binarySearch(a, v)
      if (i >= 0) a
      else {
        val ip = -i - 1
        val out = new Array[Int](a.length + 1)
        System.arraycopy(a, 0, out, 0, ip)
        out(ip) = v
        System.arraycopy(a, ip, out, ip + 1, a.length - ip)
        out
      }
    }

    override def zero: Array[Int] = Array.empty

    override def reduce(buf: Array[Int], d: java.sql.Date): Array[Int] =
      if (d == null) buf else insertSorted(buf, DateTimeUtils.fromJavaDate(d))

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] =
      b.foldLeft(a)(insertSorted)

    override def finish(buf: Array[Int]): Result =
      if (buf.isEmpty) Result(null, Nil)
      else Result(DateTimeUtils.toJavaDate(buf(0)),
        buf.toSeq.map(d => ((d - buf(0)) / 7).toLong))

    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Result] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Result]()
  }

  /** Column form: struct<cohort_week DATE, offsets ARRAY<BIGINT>> — the
    * input timestamp is week-truncated here, so callers pass the raw
    * event time. */
  def cohortWeeks(ts: Column): Column = {
    val agg = udaf(new WeeksAgg)
    agg(date_trunc("week",
      ts.cast(org.apache.spark.sql.types.TimestampType)).cast("date"))
  }
}
