package graft.operators

import graft.storage.CowTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS with QUARANTINE routing — the Delta Live
  * Tables `expect_or_drop` shape, complementing the storage layer's
  * fail-loud CHECK constraints ([[graft.storage.TableConfig]]
  * checkConstraints): instead of rejecting a whole write because one row
  * is bad, rows failing any named rule are routed to a quarantine frame
  * carrying WHICH rules they failed, and clean rows flow on. The standard
  * ingest discipline for a 100 TB document pipeline, where "one malformed
  * row aborts the load" is not an option but silently dropping rows
  * unaudited isn't either.
  *
  * Semantics match CHECK constraints: a rule passes only when its SQL
  * boolean evaluates TRUE — false or NULL fails (so `n_chars >= 100`
  * quarantines a NULL n_chars rather than waving it through).
  *
  * Plan shape: ONE shuffle-free projection tags every row with its
  * failed-rule list (plan-asserted in the spec); the two output frames
  * are filters over it. No second scan of the input per rule, no
  * shuffle, fully codegen-friendly.
  */
object Expectations {

  val FailedColumn = "_failed_expectations"

  /** Tag each row with the (rule-order) list of failed expectations. */
  def tag(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "Expectations.tag: no rules")
    require(rules.map(_._1).distinct == rules.map(_._1),
      s"Expectations.tag: duplicate rule names in ${rules.map(_._1)}")
    val flags = rules.map { case (name, sql) =>
      when(!coalesce(expr(sql).cast("boolean"), lit(false)), lit(name))
    }
    df.withColumn(FailedColumn,
      filter(array(flags: _*), x => x.isNotNull))
  }

  /** (clean rows, quarantined rows with [[FailedColumn]]): a partition of
    * the input — every row lands in exactly one side. */
  def split(df: DataFrame, rules: Seq[(String, String)])
      : (DataFrame, DataFrame) = {
    val tagged = tag(df, rules)
    (tagged.filter(size(col(FailedColumn)) === 0).drop(FailedColumn),
      tagged.filter(size(col(FailedColumn)) > 0))
  }

  /** The DEPLOYMENT form — expectations-gated lake ingest: the batch's
    * clean rows land in `main`, failing rows land in `quarantine` with
    * their failed-rule audit trail (`failed_rules`, comma-joined in rule
    * order) — both as ordinary upserts, so re-delivered batches stay
    * idempotent, and a row repaired upstream MOVES on re-ingest: it
    * upserts into main AND its stale quarantine row is deleted, so triage
    * reads the quarantine table's CURRENT state, never a fixed row's
    * ghost. Exactly one pass over the batch tags rows; the writes consume
    * disjoint filters of it.
    *
    * @return (clean rows written, quarantined rows written) */
  def quarantineIngest(
      main: CowTable, quarantine: CowTable, batch: DataFrame,
      rules: Seq[(String, String)]): (Long, Long) = {
    val (clean, bad) = split(batch, rules)
    val badAudited = bad
      .withColumn("failed_rules", array_join(col(FailedColumn), ","))
      .drop(FailedColumn)
    def land(tbl: CowTable, rows: DataFrame): Long = {
      val n = rows.count()
      if (n > 0) {
        if (tbl.currentVersion == 0) tbl.create(rows) else tbl.upsert(rows)
      }
      n
    }
    val written = (land(main, clean), land(quarantine, badAudited))
    // repaired rows: now clean, previously quarantined — retire the ghost
    // (merge-style key pruning bounds this to the touched files)
    if (written._1 > 0 && quarantine.currentVersion > 0)
      quarantine.delete(
        clean.select(quarantine.config.primaryKey.map(col): _*)): Unit
    written
  }

  /** Per-rule audit counters (the DLT event-log numbers): one row per rule
    * in declaration order — rows failing it, rows passing, and how many of
    * its failures were the row's ONLY failure (`sole_failed` — "how many
    * rows would this rule alone quarantine", the triage number that says
    * which rule to fix first). ONE aggregate pass over the input (every
    * counter a conditional sum in the same projection), then a constant
    * `rules.length`-row driver-side pivot — no per-rule rescan, no
    * shuffle beyond the single global agg. */
  def metrics(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val tagged = tag(df, rules)
    val counters = rules.flatMap { case (name, _) =>
      val failed = array_contains(col(FailedColumn), name)
      Seq(
        sum(when(failed, 1L).otherwise(0L)).as(s"__f_$name"),
        sum(when(failed && size(col(FailedColumn)) === 1, 1L)
          .otherwise(0L)).as(s"__s_$name"))
    }
    tagged.agg(count(lit(1)).as("__n"), counters: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(
          lit(name).as("rule"),
          coalesce(col(s"__f_$name"), lit(0L)).as("failed"),
          (col("__n") - coalesce(col(s"__f_$name"), lit(0L))).as("passed"),
          coalesce(col(s"__s_$name"), lit(0L)).as("sole_failed"))
      }: _*)).as("m"))
      .select("m.*")
  }
}
