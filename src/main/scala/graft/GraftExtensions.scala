package graft

import graft.functions.{AffineMinHashSig, Bpe, BpeEncode, BpeVocab, ByteHistogram, DotProductLong, KmvSketch, QuantileSketch, RepetitionProfile, RollingHashWindows, ShingleHash48, SimHash48, TextProfile, TokenHash48, WinnowMins}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Session-extension hook — the engine's analog of the reference's
  * `spark.sql.extensions` injection (Hudi/Iceberg/Delta all install one,
  * e.g. src/hudi/hudi-cdc-load.py:43-44). Registers the native expressions
  * for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // then:
  * spark.sql("SELECT simhash48(hs), byte_histogram(content, 16) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Proper analysis errors for bad calls (wrong arity / non-literal int
    * args) instead of opaque builder exceptions. Raised as a USER error
    * class (INVALID_PARAMETER_VALUE), not INTERNAL_ERROR — a typo in a SQL
    * call is bad input, and callers must be able to tell it apart from an
    * engine bug. */
  private def require(
      cond: Boolean, name: String, signature: String): Unit =
    if (!cond) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map(
        "parameter" -> "arguments",
        "functionName" -> s"`$name`",
        "value" -> s"expected $name($signature)"))

  private def arity(
      es: Seq[Expression], n: Int, name: String, sig: String): Unit =
    require(es.length == n, name, sig)

  private def boolArg(e: Expression, name: String, sig: String): Boolean = {
    require(e.foldable &&
      e.dataType == org.apache.spark.sql.types.BooleanType, name, sig)
    e.eval().asInstanceOf[Boolean]
  }

  private def doubleArg(e: Expression, name: String, sig: String): Double = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType}
    // SQL fractional literals parse as DecimalType — accept them
    require(e.foldable &&
      (e.dataType.isInstanceOf[DecimalType] ||
        Seq(DoubleType, FloatType, IntegerType, LongType)
          .contains(e.dataType)),
      name, sig)
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => require(false, name, sig); sys.error(s"unreachable $other")
    }
  }

  private def stringArg(e: Expression, name: String, sig: String): String = {
    require(e.foldable &&
      e.dataType == org.apache.spark.sql.types.StringType, name, sig)
    val v = e.eval()
    require(v != null, name, sig)
    v.toString
  }

  private def intArg(e: Expression, name: String, sig: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(e.foldable &&
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType),
      name, sig)
    val v = e.eval().asInstanceOf[Number].longValue()
    // no silent Int truncation — a LongType literal out of Int range would
    // otherwise run with a wrapped value instead of erroring
    require(v >= Int.MinValue && v <= Int.MaxValue, name, sig)
    v.toInt
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(
        name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))

    // PERSISTED-VIEW resolution: expand `FROM <graftCatalog>.default.<v>`
    // (or `<graftCatalog>.<v>`) into the stored definition — the read-side
    // half of CALL lake.create_view (vanilla Spark 4.1 routes neither view
    // DDL nor reads to a DSv2 ViewCatalog; the public lake engines install
    // the same kind of rule). Nested views expand across fixed-point
    // iterations; a later-created reference cycle fails the analyzer's
    // max-iteration guard instead of looping. Unqualified names are left
    // alone — qualification is what scopes the lookup to a graft catalog.
    ext.injectResolutionRule { session =>
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(
            plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
            : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
          plan.resolveOperatorsUp {
            case u: org.apache.spark.sql.catalyst.analysis
                .UnresolvedRelation =>
              val parts = u.multipartIdentifier
              val catAndName = parts match {
                case Seq(c, ns, n) if ns.equalsIgnoreCase("default") =>
                  Some((c, n))
                case Seq(c, n) => Some((c, n))
                case _ => None
              }
              catAndName.flatMap { case (c, n) =>
                scala.util.Try(
                  session.sessionState.catalogManager.catalog(c)).toOption
                  .collect { case g: graft.sources.GraftCatalog => g }
                  .flatMap(_.viewSql(n))
                  .map(sql => org.apache.spark.sql.catalyst.plans.logical
                    .SubqueryAlias(n,
                      session.sessionState.sqlParser.parsePlan(sql)))
              }.getOrElse(u)
          }
      }
    }

    // ---- table-valued CHANGE-FEED access (Delta's `table_changes` TVF) --
    // SELECT * FROM table_changes('lake.default.t', 2, 5)       -- versions
    // SELECT * FROM table_changes('lake.t', '2024-01-02 00:00:00')  -- ts
    // SELECT * FROM table_changes('/abs/table/root', 3)
    // Window bounds are INCLUSIVE commit versions (Delta parity; integer
    // literal = version, string literal = commit timestamp); a missing `to`
    // reads through the current version. Expands at ANALYSIS time into the
    // same DSv2 CDF relation `option("readChangeFeed","true")` plans — one
    // manifest-ranged scan, O(changed commits), never a snapshot diff.
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft", "table_changes"),
      { es: Seq[Expression] =>
        val sig = "table STRING literal, from INT version | STRING " +
          "timestamp [, to INT version | STRING timestamp]"
        require(es.length == 2 || es.length == 3, "table_changes", sig)
        val session = org.apache.spark.sql.SparkSession.active
        val ref = stringArg(es.head, "table_changes", sig)
        // a path is used as-is; `catalog.[default.]name` resolves through
        // the registered GraftCatalog's lake registry
        val path =
          if (ref.contains("/")) ref
          else {
            // a BARE name (the common Delta usage: table_changes('t', 2))
            // resolves through the session's CURRENT catalog when that is
            // a GraftCatalog — same resolution a plain `FROM t` gets
            def notFound(): Nothing =
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "TABLE_OR_VIEW_NOT_FOUND",
                messageParameters = Map("relationName" -> s"`$ref`"))
            val (catOpt, name) = ref.split('.') match {
              case Array(c, ns, n) if ns.equalsIgnoreCase("default") =>
                (Some(c), n)
              case Array(c, n) => (Some(c), n)
              case Array(n) => (None, n)
              case _ =>
                require(false, "table_changes", sig); sys.error("unreachable")
            }
            val cat = catOpt match {
              case Some(c) => scala.util.Try(
                session.sessionState.catalogManager.catalog(c)).toOption
                .collect { case g: graft.sources.GraftCatalog => g }
              case None => Some(session.sessionState.catalogManager
                .currentCatalog)
                .collect { case g: graft.sources.GraftCatalog => g }
            }
            cat.flatMap(_.tableRoot(name)).getOrElse(notFound())
          }
        def bound(e: Expression, side: String)
            : (String, String) = e.dataType match {
          case org.apache.spark.sql.types.StringType =>
            (s"${side}Timestamp", stringArg(e, "table_changes", sig))
          case _ =>
            (s"${side}Version",
              intArg(e, "table_changes", sig).toString)
        }
        var reader = session.read.format("graft")
          .option("readChangeFeed", "true")
        val (k1, v1) = bound(es(1), "starting")
        reader = reader.option(k1, v1)
        if (es.length == 3) {
          val (k2, v2) = bound(es(2), "ending")
          reader = reader.option(k2, v2)
        }
        reader.load(path).queryExecution.analyzed
      }))

    // SQL MERGE: bound the group-discovery subquery by the source's keys
    // (see MergeSourcePrune) — the SQL path's analog of the API upsert's
    // candidate-file pruning.
    ext.injectOptimizerRule(session =>
      new graft.sources.MergeSourcePrune(session))
    // hidden-partitioning writes: re-derive the generated partition column
    // inside SQL/connector write plans (see TransformRecompute)
    ext.injectOptimizerRule(session =>
      new graft.sources.TransformRecompute(session))

    register("byte_histogram", { es =>
      val sig = "BINARY, INT literal"
      arity(es, 2, "byte_histogram", sig)
      ByteHistogram(es.head, intArg(es(1), "byte_histogram", sig))
    })
    register("affine_minhash_sig", { es =>
      val sig = "ARRAY<BIGINT>, INT literal"
      arity(es, 2, "affine_minhash_sig", sig)
      AffineMinHashSig(es.head, intArg(es(1), "affine_minhash_sig", sig))
    })
    register("simhash48", { es =>
      arity(es, 1, "simhash48", "ARRAY<BIGINT>")
      SimHash48(es.head)
    })
    register("winnow_mins", { es =>
      val sig = "ARRAY<BIGINT>, INT literal"
      arity(es, 2, "winnow_mins", sig)
      WinnowMins(es.head, intArg(es(1), "winnow_mins", sig))
    })
    register("dot_long", { es =>
      arity(es, 2, "dot_long", "ARRAY<BIGINT>, ARRAY<BIGINT>")
      DotProductLong(es.head, es(1))
    })
    register("rolling_hash_windows", { es =>
      val sig = "STRING, INT literal, INT literal"
      arity(es, 3, "rolling_hash_windows", sig)
      RollingHashWindows(es.head,
        intArg(es(1), "rolling_hash_windows", sig),
        intArg(es(2), "rolling_hash_windows", sig))
    })

    // ---- fused text expressions ----------------------------------------
    register("token_hash48", { es =>
      arity(es, 1, "token_hash48", "STRING")
      TokenHash48(es.head)
    })
    register("shingle_hash48", { es =>
      val sig = "STRING, INT literal [, BOOLEAN literal distinct]"
      require(es.length == 2 || es.length == 3, "shingle_hash48", sig)
      ShingleHash48(es.head, intArg(es(1), "shingle_hash48", sig),
        distinct = es.length == 3 && boolArg(es(2), "shingle_hash48", sig))
    })
    register("text_profile", { es =>
      arity(es, 1, "text_profile", "STRING")
      TextProfile(es.head)
    })
    register("repetition_profile", { es =>
      arity(es, 1, "repetition_profile", "STRING")
      RepetitionProfile(es.head)
    })
    register("bpe_encode", { es =>
      arity(es, 1, "bpe_encode", "STRING")
      BpeEncode(es.head, BpeVocab.demo)
    })

    // ---- library operators whose core is a scalar column ---------------
    // Builders may compose the public Column API and return the resulting
    // (still unresolved) expression tree — same analysis path as any
    // hand-built expression.
    def colOf(e: Expression) = ColumnBridge.toColumn(e)

    register("token_chunks", { es =>
      val sig = "STRING, INT literal window, INT literal stride"
      arity(es, 3, "token_chunks", sig)
      ColumnBridge.toResolvableExpression(graft.text.Chunker.chunkStructs(
        colOf(es.head),
        intArg(es(1), "token_chunks", sig),
        intArg(es(2), "token_chunks", sig)))
    })
    register("rate_keep", { es =>
      arity(es, 2, "rate_keep", "id ANY, rate DOUBLE")
      ColumnBridge.toResolvableExpression(
        graft.text.Sampling.rateKeep(colOf(es.head), colOf(es(1))))
    })
    register("frame_energies", { es =>
      val sig = "samples ARRAY<INT>, frame INT literal"
      arity(es, 2, "frame_energies", sig)
      ColumnBridge.toResolvableExpression(
        graft.multimodal.Multimodal.frameEnergies(
          colOf(es.head), intArg(es(1), "frame_energies", sig)))
    })

    // ---- temporal-analytics aggregates ---------------------------------
    register("funnel_stages", { es =>
      val sig = "ts TIMESTAMP, event_type STRING, stage STRING literal... " +
        "[, max_gap_seconds INT literal]"
      require(es.length >= 3, "funnel_stages", sig)
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val gapLast = es.length >= 4 && es.last.foldable &&
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(es.last.dataType)
      val (stageEs, gap) =
        if (gapLast)
          (es.drop(2).dropRight(1),
            Some(intArg(es.last, "funnel_stages", sig).toLong))
        else (es.drop(2), None)
      val stages = stageEs.map(stringArg(_, "funnel_stages", sig))
      ColumnBridge.toResolvableExpression(
        graft.operators.Funnel.stageTimesAgg(
          colOf(es.head), colOf(es(1)), stages, gap))
    })
    register("cohort_weeks", { es =>
      arity(es, 1, "cohort_weeks", "ts TIMESTAMP")
      ColumnBridge.toResolvableExpression(
        graft.operators.Cohort.cohortWeeks(colOf(es.head)))
    })

    // ---- sketch aggregates (typed Aggregators surfaced in SQL) ---------
    register("kmv_distinct", { es =>
      val sig = "hash48 BIGINT, k INT literal"
      arity(es, 2, "kmv_distinct", sig)
      ColumnBridge.toResolvableExpression(KmvSketch.kmvDistinct(
        colOf(es.head), intArg(es(1), "kmv_distinct", sig)))
    })
    register("quantile_sketch", { es =>
      val sig =
        "hash48 BIGINT, value DOUBLE, k INT literal, p DOUBLE literal..."
      require(es.length >= 4, "quantile_sketch", sig)
      val ps = es.drop(3).map(doubleArg(_, "quantile_sketch", sig))
      ColumnBridge.toResolvableExpression(QuantileSketch.sketchQuantiles(
        colOf(es.head), colOf(es(1)),
        intArg(es(2), "quantile_sketch", sig), ps))
    })
    register("top_tokens", { es =>
      val sig = "token STRING, cap INT literal"
      arity(es, 2, "top_tokens", sig)
      ColumnBridge.toResolvableExpression(
        graft.functions.SpaceSaving.topTokens(
          colOf(es.head), intArg(es(1), "top_tokens", sig)))
    })
  }
}
