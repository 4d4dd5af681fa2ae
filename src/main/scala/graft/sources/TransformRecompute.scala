package graft.sources

import graft.storage.PartitionTransform
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.Metadata

/** Installs the graft session rules into sessions built WITHOUT
  * `GraftExtensions` (idempotent; the extension-injected instances guard
  * against double work themselves). Called at graft TABLE RESOLUTION —
  * analysis time — so the optimizer batch list built afterwards for the
  * same statement already carries the rules. */
object GraftSessionRules {
  def ensureInstalled(spark: SparkSession): Unit = spark match {
    case classic: org.apache.spark.sql.classic.SparkSession =>
      classic.experimental.synchronized {
        val cur = classic.experimental.extraOptimizations
        val add = Seq(
          if (cur.exists(_.isInstanceOf[MergeSourcePrune])) None
          else Some(new MergeSourcePrune(classic)),
          if (cur.exists(_.isInstanceOf[TransformRecompute])) None
          else Some(new TransformRecompute(classic))).flatten
        if (add.nonEmpty)
          classic.experimental.extraOptimizations = cur ++ add
      }
    case _ => ()
  }
}

/** GENERATED-COLUMN recompute for SQL/connector writes on hidden-
  * partitioning tables (Iceberg `PARTITIONED BY (days(ts))` re-expressed as
  * a Delta generated partition column — [[PartitionTransform]]).
  *
  * The CowTable API funnel recomputes the generated column inside
  * `writeVersion`, so API writers can never drift it from its source. SQL
  * row-level commands (MERGE/UPDATE/DELETE through [[GraftRowLevel]]) and
  * connector batch writes (INSERT / INSERT OVERWRITE through
  * [[GraftWrite]]) bypass that funnel — this rule restores the invariant at
  * the PLAN level: every `V2WriteCommand` against a transform-partitioned
  * graft table gets a projection that re-derives the generated column from
  * its source column, exprId-preserving, so the write's distribution/
  * ordering requirements and projections are untouched. Iceberg mutations
  * on transform-partitioned tables keep working for exactly this reason —
  * partition values are always derived, never trusted from the writer
  * (reference surface: iceberg-initial-load.py's partitioned CREATE plus
  * the CDC MERGE of iceberg-cdc-load.py:130-150).
  *
  * An UPDATE that moves `ts` across a day boundary therefore MOVES the row
  * to the new `ts_day=` hive directory, and an INSERT carrying a wrong
  * (or null) generated value is silently corrected — Delta's generated-
  * column semantics, with recompute-in-the-engine instead of reject.
  *
  * The resolve trick: the transform's Column expression is analyzed against
  * a [[LocalRelation]] REUSING the write query's output attributes, so the
  * resolved expression references them by exprId with all implicit casts
  * and session-timezone bindings the SQL funnel would apply — one code path
  * ([[PartitionTransform.expr]]) defines the transform everywhere.
  */
final class TransformRecompute(session: SparkSession)
  extends Rule[LogicalPlan] {

  private val GeneratedTag = "__graft_generated"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case w: V2WriteCommand => specOf(w) match {
      case Some(t) => inject(w, t)
      case None => w
    }
  }

  private def specOf(w: V2WriteCommand): Option[PartitionTransform] =
    w.table match {
      case r: DataSourceV2Relation =>
        ColumnBridge.unwrapRowLevelTable(r.table) match {
          case g: GraftTable => g.transformSpec
          case _ => None
        }
      case _ => None
    }

  private def inject(w: V2WriteCommand, t: PartitionTransform)
      : LogicalPlan = {
    val q = w.query
    if (!q.resolved) return w
    val resolver = session.sessionState.conf.resolver
    val genAttr = q.output.find(a => resolver(a.name, t.name)).getOrElse {
      // a DELTA-path DELETE writes no rows — its plan carries only the
      // operation + row-id (_file, _pos) columns, so there is nothing to
      // recompute and no generated column to find
      val deltaDeleteShape =
        w.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical
          .WriteDelta] && q.output.forall(a => !resolver(a.name, t.source))
      if (deltaDeleteShape) return w
      // defensive: a write aligned to the table schema always carries the
      // generated column; anything else must not silently skip the funnel
      throw new IllegalStateException(
        s"graft: write on a ${t.spec}-partitioned table lacks the " +
          s"generated column ${t.name} — cannot guarantee the " +
          "generated-column invariant")
    }
    // idempotency across fixed-point iterations: the injected alias is
    // metadata-tagged; its presence in the top projection means this write
    // is already funneled
    val already = q match {
      case p: Project => p.projectList.exists {
        case al: Alias => al.exprId == genAttr.exprId &&
          al.metadata.contains(GeneratedTag)
        case _ => false
      }
      case _ => false
    }
    if (already) return w
    val srcAttr = q.output.find(a => resolver(a.name, t.source)).getOrElse(
      throw new IllegalStateException(
        s"graft: write on a ${t.spec}-partitioned table lacks the " +
          s"transform source column ${t.source}"))
    // analyze the transform Column against the query's OWN attributes
    val probe = ColumnBridge.ofRows(session,
      LocalRelation(q.output)).select(t.expr.as("__graft_gen"))
    val analyzedGen = probe.queryExecution.analyzed match {
      case Project(Seq(al: Alias), _) => al.child
      case other => throw new IllegalStateException(
        s"graft: unexpected transform analysis shape: $other")
    }
    // this rule runs AFTER the optimizer's ReplaceExpressions pass, so
    // RuntimeReplaceable nodes (to_date → ParseToDate, ...) must be
    // replaced here or they reach codegen unevaluable
    val resolvedGen = analyzedGen.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }
    require(resolvedGen.references.subsetOf(
      org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(srcAttr))),
      s"graft: transform ${t.spec} resolved against unexpected columns")
    val cast =
      if (resolvedGen.dataType == genAttr.dataType) resolvedGen
      else Cast(resolvedGen, genAttr.dataType,
        Some(session.sessionState.conf.sessionLocalTimeZone))
    val newList: Seq[NamedExpression] = q.output.map { a =>
      if (a.exprId == genAttr.exprId)
        Alias(cast, a.name)(exprId = a.exprId,
          explicitMetadata = Some(Metadata.fromJson(
            s"""{"$GeneratedTag":true}""")))
      else a
    }
    w.withNewQuery(Project(newList, q))
  }
}
