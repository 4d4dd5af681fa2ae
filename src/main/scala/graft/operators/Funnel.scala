package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
}
