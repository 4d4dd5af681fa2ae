package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Incrementally-maintained additive-aggregate materialized view over a
  * [[CowTable]] base: `GROUP BY groupCols` with `COUNT(*)` + exact
  * `SUM(measure)`s, kept current by applying the base's change feed as
  * SIGNED deltas — insert/update_postimage count +, delete/update_preimage
  * count − — so a refresh costs O(changed rows) + O(view groups), never a
  * base rescan. The additive class (count/sum, and means as sum/count at
  * read time) is exactly what's incrementally maintainable under deletes
  * without auxiliary state. MIN/MAX (`minMaxCols`) ship the standard MV
  * compromise for the classically non-incremental pair: inserts fold in
  * via least/greatest (clean, no rescan); a batch whose deleted values
  * reach a group's candidate extremum marks the group DIRTY, and ONLY
  * dirty groups re-aggregate from the base snapshot (semi-join-restricted
  * scan) — a refresh that retracts no extremum still never rescans.
  *
  * Sums are carried as DECIMAL(28,10), so the incrementally-maintained
  * state is BIT-EQUAL to a from-scratch recompute regardless of how many
  * refreshes (and in what grouping order) produced it — what makes the MV
  * oracle-checkable, and what double sums could never guarantee. The
  * file-granularity pre/post churn of a COW rewrite cancels exactly for
  * the same reason.
  *
  * Crash discipline (refresh = MV commit(s) THEN bookmark write, two
  * non-atomic steps): the bookmark records the (baseVersion, mvVersion)
  * pair they agreed on. A refresh that died between the two leaves
  * `table.currentVersion != bookmarked mvVersion`; the next refresh heals
  * by ROLLING THE VIEW BACK to the bookmarked version (metadata-only) and
  * re-applying the feed from the bookmarked base version — exactly-once
  * maintenance on top of at-least-once execution.
  *
  * Beyond-reference lakehouse capability (SURVEY.md §2.6 fence): the
  * reference recomputes its Athena aggregates per query; Delta/Databricks
  * ship this as materialized views over the change feed.
  */
final class MatView private (
    spark: SparkSession,
    val table: CowTable,
    base: CowTable,
    groupCols: Seq[String],
    sumCols: Seq[String],
    minMaxCols: Seq[String],
    root: Path) {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)
  private val bookmarkPath = root.resolve("_mv_bookmark")

  private def sumName(c: String) = s"sum_$c"
  private def minName(c: String) = s"min_$c"
  private def maxName(c: String) = s"max_$c"
  private def dec(c: Column) = c.cast("decimal(28,10)")

  import MatView.Mark
  private def mark: Mark =
    if (Files.exists(bookmarkPath))
      Serialization.read[Mark](Files.readString(bookmarkPath))
    else Mark(0, 0)
  private def writeMark(m: Mark): Unit = {
    Files.createDirectories(root)
    val tmp = bookmarkPath.resolveSibling("_mv_bookmark.tmp")
    Files.writeString(tmp, Serialization.write(m))
    Files.move(tmp, bookmarkPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Current view contents: groupCols + n_rows + sum_<c>... [+ min_<c> +
    * max_<c>...]. */
  def read(): DataFrame = table.read()
    .select((groupCols.map(col) :+ col("n_rows")) ++
      sumCols.map(c => col(sumName(c))) ++
      minMaxCols.flatMap(c =>
        Seq(col(minName(c)), col(maxName(c)))): _*)

  /** Apply all base versions committed since the last refresh. Returns the
    * number of base versions applied (0 = already current). */
  def refresh(): Int = {
    val m0 = mark
    // crash healing: MV commits that never made it into the bookmark are
    // undone, then re-derived from the feed
    if (table.currentVersion != m0.mvVersion) {
      if (m0.mvVersion > 0) {
        table.rollbackTo(m0.mvVersion) // metadata-only restore
        writeMark(Mark(m0.baseVersion, table.currentVersion))
      } else {
        // bootstrap crashed after create but before the first bookmark:
        // wipe the half-born view and re-bootstrap from the feed. The
        // durable definition ([[MatView.createInLake]] writes it into the
        // same root) must SURVIVE the wipe, or openInLake/refresh_matview
        // fail forever after a heal.
        val defPath = root.resolve("_mv_def.json")
        val defBytes =
          if (Files.exists(defPath)) Some(Files.readAllBytes(defPath))
          else None
        CowTable.deleteRecursively(root)
        defBytes.foreach { b =>
          Files.createDirectories(root)
          Files.write(defPath, b)
        }
      }
    }
    val healed = mark
    val to = base.currentVersion
    if (to == healed.baseVersion) return 0

    val feed = base.readChangeFeed(healed.baseVersion, to)
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(
        lit("matview: unknown change type "), col("_change_type"))))
    // per-group min/max of the batch's INSERTED and DELETED values — the
    // inputs of the rescan-on-retract rule below
    val mmDeltaAggs = minMaxCols.flatMap(c => Seq(
      min(when(sign === 1L, col(c))).as(s"__ins_min_$c"),
      max(when(sign === 1L, col(c))).as(s"__ins_max_$c"),
      min(when(sign === -1L, col(c))).as(s"__del_min_$c"),
      max(when(sign === -1L, col(c))).as(s"__del_max_$c")))
    val deltas = feed
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("__d_n"),
        sumCols.map(c => sum(dec(col(c)) * sign).as(s"__d_$c")) ++
          mmDeltaAggs: _*)

    def baseMm(keys: Option[DataFrame]): DataFrame = {
      // re-aggregate min/max from the base SNAPSHOT AT `to` (the version
      // this refresh applies up to — base may advance concurrently),
      // restricted to `keys` when given
      val snap = base.readVersion(to)
      val scoped = keys.fold(snap)(k => snap.join(k, groupCols, "left_semi"))
      val aggs = minMaxCols.flatMap(c => Seq(
        min(col(c)).as(s"__rs_min_$c"), max(col(c)).as(s"__rs_max_$c")))
      scoped.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    if (table.currentVersion == 0) {
      // bootstrap: the feed from version 0 IS the full initial aggregate
      // (counts/sums); min/max come from one base-snapshot aggregate —
      // the expected full-scan cost of a bootstrap
      val boot0 = deltas.select(
        (groupCols.map(col) :+ col("__d_n").as("n_rows")) ++
          sumCols.map(c =>
            coalesce(col(s"__d_$c"), dec(lit(0))).as(sumName(c))): _*)
        .filter(col("n_rows") > 0)
      val booted =
        if (minMaxCols.isEmpty) boot0
        else boot0.join(baseMm(None), groupCols, "left")
          .select((boot0.columns.toSeq.map(col) ++
            minMaxCols.flatMap(c => Seq(
              col(s"__rs_min_$c").as(minName(c)),
              col(s"__rs_max_$c").as(maxName(c))))): _*)
      table.create(booted)
    } else {
      val state = table.read()
      // incremental min/max: inserts fold in via least/greatest (clean);
      // a batch whose DELETED values reach the candidate extremum marks
      // the group DIRTY — only dirty groups re-aggregate from the base.
      // The <= / >= (not =) guards the insert-then-delete-in-one-batch
      // case: a value inserted and retracted in the same feed range would
      // otherwise fold in as a min/max that no longer exists.
      val mmJoinCols = minMaxCols.flatMap { c =>
        val candMin = least(col(minName(c)), col(s"__ins_min_$c"))
        val candMax = greatest(col(maxName(c)), col(s"__ins_max_$c"))
        Seq(candMin.as(s"__cand_min_$c"), candMax.as(s"__cand_max_$c"))
      }
      val dirtyExpr =
        if (minMaxCols.isEmpty) lit(false)
        else minMaxCols.map { c =>
          coalesce(
            (col(s"__del_min_$c").isNotNull &&
              col(s"__del_min_$c") <=
                least(col(minName(c)), col(s"__ins_min_$c"))) ||
            (col(s"__del_max_$c").isNotNull &&
              col(s"__del_max_$c") >=
                greatest(col(maxName(c)), col(s"__ins_max_$c"))),
            lit(false))
        }.reduce(_ || _)
      val joined = deltas.join(state, groupCols, "left")
        .select(((groupCols.map(col) :+
          (coalesce(col("n_rows"), lit(0L)) + col("__d_n")).as("n_rows")) ++
          sumCols.map(c =>
            (coalesce(col(sumName(c)), dec(lit(0))) +
              coalesce(col(s"__d_$c"), dec(lit(0)))).as(sumName(c))) ++
          mmJoinCols) :+ dirtyExpr.as("__dirty"): _*)
        .withColumn("n_rows",
          when(col("n_rows") >= 0, col("n_rows"))
            .otherwise(raise_error(
              lit("matview: negative group count — feed out of order"))))
        .localCheckpoint() // one evaluation; feeds both upsert and delete
      val dead = joined.filter(col("n_rows") === 0).select(
        groupCols.map(col): _*)
      val live = joined.filter(col("n_rows") > 0)
      val upFrame =
        if (minMaxCols.isEmpty) live.drop("__dirty")
        else {
          val dirtyKeys = live.filter(col("__dirty"))
            .select(groupCols.map(col): _*)
          live.join(baseMm(Some(dirtyKeys)), groupCols, "left")
            .select((groupCols.map(col) :+ col("n_rows")) ++
              sumCols.map(c => col(sumName(c))) ++
              minMaxCols.flatMap(c => Seq(
                when(col("__dirty"), col(s"__rs_min_$c"))
                  .otherwise(col(s"__cand_min_$c")).as(minName(c)),
                when(col("__dirty"), col(s"__rs_max_$c"))
                  .otherwise(col(s"__cand_max_$c")).as(maxName(c)))): _*)
        }
      table.upsert(upFrame)
      if (!dead.isEmpty) table.delete(dead)
    }
    writeMark(Mark(to, table.currentVersion))
    to - healed.baseVersion
  }
}

object MatView {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  /** Durable refresh bookmark: the (base, view) version pair the last
    * completed refresh agreed on. */
  private final case class Mark(baseVersion: Int, mvVersion: Int)

  /** Durable MV definition, stored at `<root>/_mv_def.json` so a fresh
    * session can refresh the view knowing only its name. */
  final case class Def(base: String, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Nil)

  /** Create a NAMED materialized view in a lake: definition persisted at
    * the view root, state table registered in the lake catalog (readable
    * as `lake.default.<name>`), bootstrapped with an initial refresh. */
  def createInLake(
      spark: SparkSession, warehouse: String, name: String, baseTable: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): MatView = {
    require(!graft.storage.LakeRegistry.entries(warehouse)
      .exists(_.table_name == name),
      s"matview: table $name already exists in the lake catalog")
    val root = Paths.get(warehouse).resolve(name)
    Files.createDirectories(root)
    Files.writeString(root.resolve("_mv_def.json"),
      Serialization.write(Def(baseTable, groupCols, sumCols, minMaxCols)))
    val mv = openInLake(spark, warehouse, name)
    mv.refresh()
    graft.storage.LakeRegistry.register(warehouse,
      mv.table.config.copy(tableName = name), root.toString)
    mv
  }

  /** Open a named MV created by [[createInLake]] (fresh-session capable:
    * everything needed is on disk). */
  def openInLake(
      spark: SparkSession, warehouse: String, name: String): MatView = {
    val root = Paths.get(warehouse).resolve(name)
    val defPath = root.resolve("_mv_def.json")
    require(Files.exists(defPath), s"matview: no definition at $defPath")
    val d = Serialization.read[Def](Files.readString(defPath))
    val base = graft.storage.LakeRegistry.open(spark, warehouse, d.base)
    apply(spark, root.toString, base, d.groupCols, d.sumCols, d.minMaxCols)
  }

  /** Open (or lazily bootstrap on first refresh) an MV rooted at `root`,
    * grouping `base` by `groupCols` with COUNT(*) + SUM over `sumCols`
    * [+ MIN/MAX over `minMaxCols`, maintained incrementally on inserts
    * and by a dirty-group base re-aggregate when a delete/update retracts
    * an extremum — the standard MV compromise for the classically
    * non-incremental pair]. */
  def apply(
      spark: SparkSession, root: String, base: CowTable,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): MatView = {
    require(groupCols.nonEmpty, "matview needs at least one group column")
    val cfg = TableConfig(
      tableName = s"mv_${base.config.tableName}", primaryKey = groupCols)
    val rootPath = Paths.get(root)
    new MatView(spark, CowTable(spark, root, cfg), base, groupCols, sumCols,
      minMaxCols, rootPath)
  }
}
