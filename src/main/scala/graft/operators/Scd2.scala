package graft.operators

import graft.storage.CowTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 materialization of a CDC change log:
  * every change event becomes a versioned history row with
  * `[valid_from, valid_to)` interval columns and an `is_current` flag —
  * the audit/history complement of the reference's latest-state MERGE
  * (`/root/reference/src/delta/delta-cdc-load.py:121–141` keeps only the
  * final row per key; SCD2 keeps them all, the standard warehouse shape
  * for "what did this row look like on date X").
  *
  * Semantics (deterministic, engine-replayable):
  *   - events of one key are ordered by (`tsCol`, tieBreak...);
  *   - each event's `valid_to` is the NEXT event's timestamp (any op,
  *     including a delete), `null` if none — intervals are half-open and
  *     contiguous until a gap created by a delete;
  *   - `'D'` events are tombstones: they close the previous version's
  *     interval but emit no history row themselves;
  *   - `is_current` ⇔ `valid_to IS NULL` (a key whose last event is a
  *     delete therefore has NO current row — convergent with the MERGE
  *     path's delete semantics).
  *
  * Plan shape: ONE hash shuffle on the key + per-key sort; `lead` needs a
  * 1-row frame, so WindowExec state is O(1) per row. At 100 TB this is the
  * minimal possible cost for interval construction — no self-join, no
  * second shuffle. Skewed keys bound the frame only by that key's version
  * count (versions-per-entity is naturally small in CDC workloads).
  */
object Scd2 {

  /** Full-log materialization: change log (op + event time + full row
    * image, DMS envelope per SURVEY.md §1.1) → type-2 history frame.
    * Output = payload columns with `tsCol` renamed `valid_from`, plus
    * `valid_to` and `is_current`; tombstone rows are dropped AFTER closing
    * their predecessors' intervals.
    */
  def history(
      changes: DataFrame, keyCols: Seq[String], tsCol: String,
      opCol: String, tieBreak: Seq[String]): DataFrame = {
    val order = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(order))
      .filter(col(opCol) =!= lit("D"))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
      .drop(opCol)
  }

  /** INCREMENTAL SCD2 against a lake table — the CDC-loop deployment shape
    * (apply each hourly batch, never rescan the full log). The table stores
    * EVERY event as one row — including `'D'` tombstones, with `op`
    * retained — keyed on (key..., tieBreak...), so a key's stored rows ARE
    * its change log and any batch (even late/out-of-order events) is
    * applied by replaying only the AFFECTED keys' history:
    *
    *   1. restrict the table to the batch's keys (semi-join; merge-style
    *      file pruning bounds the IO to touched files),
    *   2. union the batch's events,
    *   3. recompute `valid_to`/`is_current` with the same lead-window,
    *   4. upsert the recomputed rows (O(affected keys' history), bounded
    *      by the batch's key fan-out — never O(table)).
    *
    * The final state is a pure function of the event SET — independent of
    * batch boundaries and arrival order (convergence spec-checked), the
    * property that makes an incremental ingest oracle-checkable against
    * the one-shot [[history]] replay.
    *
    * Batch rows must be unique on (key..., tieBreak...) across the whole
    * log (re-delivery of the same event is idempotent by upsert).
    *
    * @return the history VIEW of the table after the apply (tombstones
    *         dropped, `op` removed — the [[history]] shape)
    */
  def applyBatch(
      tbl: CowTable, batch: DataFrame, keyCols: Seq[String], tsCol: String,
      opCol: String, tieBreak: Seq[String]): DataFrame = {
    val asRows = batch
      .withColumnRenamed(tsCol, "valid_from")
      .withColumnRenamed(opCol, "op")
    val fresh = tbl.currentVersion == 0
    val replayed = if (fresh) asRows else {
      val affectedKeys = asRows.select(keyCols.map(col): _*).distinct()
      tbl.read()
        .join(broadcast(affectedKeys), keyCols, "left_semi")
        .select(asRows.columns.map(col).toIndexedSeq: _*)
        .unionByName(asRows)
        // re-delivered events (already stored, delivered again) collapse to
        // one row by identity — idempotent apply
        .dropDuplicates(keyCols ++ tieBreak)
    }
    val order = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(("valid_from" +: tieBreak).map(col): _*)
    val recomputed = replayed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(order))
      .withColumn("is_current",
        col("valid_to").isNull && col("op") =!= lit("D"))
    if (fresh) tbl.create(recomputed) else tbl.upsert(recomputed)
    historyView(tbl)
  }

  /** The [[history]]-shaped view of an incremental SCD2 table. */
  def historyView(tbl: CowTable): DataFrame =
    tbl.read().filter(col("op") =!= lit("D")).drop("op")

  /** POINT-IN-TIME snapshot from a [[history]] frame: the row version of
    * each key that was valid at business time `asOf` — `valid_from <= t <
    * valid_to` over half-open intervals (a key deleted before `t`, or
    * born after it, has no row). This is the "what did the dimension look
    * like on date X" read SCD2 exists to answer — a pure FILTER over the
    * history (no window, no join; interval columns carry the answer), so
    * at 100 TB it rides whatever pruning the history's storage gives. */
  def snapshotAsOf(history: DataFrame, asOf: Column): DataFrame =
    history
      .filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .drop("valid_to", "is_current")
      .withColumnRenamed("valid_from", "as_of_version_start")

  /** POINT-IN-TIME-CORRECT fact enrichment: attach to every fact row the
    * dimension version valid at the fact's OWN timestamp —
    * `valid_from <= fact_ts < valid_to` — the temporal join SCD2 history
    * exists to feed (training-feature attribution: "the profile as the
    * user had it when the event happened", never leaking a later version).
    * Left-join semantics: a fact whose key was deleted before, born after,
    * or never existed gets NULL payload columns.
    *
    * Plan shape (the [[AsOfJoin]] pattern, not a range join): tag both
    * sides, union, ONE window pass per key carrying the latest
    * `valid_from <= ts` version forward, then a validity check against its
    * `valid_to` nulls out versions closed before the fact (the delete
    * gap). A single hash shuffle on the key — no interval-join row
    * explosion, no broadcast of either side — so a 100 TB fact log joins a
    * billion-row dimension history at window-dedup cost. At equal
    * `valid_from` (zero-width versions from same-instant changes) the
    * surviving interval wins, matching the half-open-interval SQL replay
    * row for row.
    *
    * @param payload history columns to carry, as (histCol -> outputCol);
    *                output names must not collide with fact columns.
    */
  def factJoin(
      facts: DataFrame, history: DataFrame, keyCols: Seq[String],
      factTsCol: String, payload: Seq[(String, String)]): DataFrame = {
    val payCols = payload.map { case (in, out) => col(in).as(out) }
    // carried as ONE struct (see AsOfJoin: per-column carry could tear
    // fields of different versions together); __vto rides along for the
    // validity check
    val dimType = org.apache.spark.sql.types.StructType(
      history.select(payCols :+ col("valid_to").as("__vto"): _*)
        .schema.fields)
    val f = facts.withColumn("__tag", lit(1))
      .withColumn("__dim", lit(null).cast(dimType))
    val h = history.select(
      keyCols.map(col) :+ col("valid_from").as(factTsCol) :+
        struct(payCols :+ col("valid_to").as("__vto"): _*).as("__dim"): _*)
      .withColumn("__tag", lit(0))
    val u = f.unionByName(h, allowMissingColumns = true)
    // history before facts at equal ts (valid_from <= ts is INCLUSIVE);
    // among versions sharing a valid_from, the open/longest interval last
    // so the carry picks the one the half-open semantics keep alive
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(factTsCol).asc, col("__tag").asc,
        col("__dim").getField("__vto").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u
      .withColumn("__dim", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val valid = col("__dim").isNotNull &&
      (col("__dim").getField("__vto").isNull ||
        col("__dim").getField("__vto") > col(factTsCol))
    payload.foldLeft(carried) { case (df, (_, out)) =>
      df.withColumn(out, when(valid, col("__dim").getField(out)))
    }.drop("__tag", "__dim")
  }
}
