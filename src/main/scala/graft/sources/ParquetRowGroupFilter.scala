package graft.sources

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate, Operators}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.sources._

/** Pushed-filter → parquet [[FilterPredicate]] conversion for ROW-GROUP
  * skipping inside a data file — the granularity below manifest file-level
  * pruning. At 100 TB a 128 MB file holds several row groups; a selective
  * predicate on a clustered column should read one of them, not all.
  *
  * STRICTLY pruning-only: graft keeps every pushed filter residual, so
  * Spark re-applies the full predicate above the scan — dropping an
  * unconvertible (sub)filter here only reads MORE, never wrong rows. The
  * parquet side evaluates stats-only (row-group min/max/null counts via
  * the reader's `filterRowGroups`; record-level filtering stays off in the
  * vectorized path).
  *
  * Conversion is PER FILE against the file's own footer schema: a column
  * converts only when physically present with the exact primitive+logical
  * type the literal's runtime class implies. A file narrower than the
  * table column (pre-widening INT32 under a BIGINT predicate) simply
  * declines — parquet's own SchemaCompatibilityValidator would otherwise
  * throw at read time. Conjuncts convert independently; inside one filter,
  * `And` keeps any convertible side (superset), `Or` needs both sides,
  * negations never convert (the complement of a superset is not safe). */
private[sources] object ParquetRowGroupFilter {

  /** AND of every convertible pushed conjunct, None when nothing converts.
    * `names` maps LOGICAL filter columns to the file's physical names. */
  def predicateFor(fileSchema: MessageType, filters: Seq[Filter],
      names: Map[String, String] = Map.empty): Option[FilterPredicate] = {
    val byName: Map[String, PrimitiveType] =
      fileSchema.getFields.toArray.collect {
        case t: org.apache.parquet.schema.Type if t.isPrimitive =>
          t.getName -> t.asPrimitiveType()
      }.toMap
    def field(logical: String): Option[(String, PrimitiveType)] = {
      val phys = names.getOrElse(logical, logical)
      byName.get(phys).map(phys -> _)
    }

    // value-typed leaf builders: Some(pred) only on an exact type match
    def leaf(logical: String, v: Any,
        op: String): Option[FilterPredicate] = field(logical).flatMap {
      case (c, pt) =>
        val ann = pt.getLogicalTypeAnnotation
        def intAnnOk(bits: Int): Boolean = ann match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
            i.getBitWidth == bits && i.isSigned
          case _ => false
        }
        (v, pt.getPrimitiveTypeName) match {
          case (i: java.lang.Integer, INT32) if intAnnOk(32) =>
            Some(cmp(FilterApi.intColumn(c), i, op))
          case (l: java.lang.Long, INT64) if intAnnOk(64) =>
            Some(cmp(FilterApi.longColumn(c), l, op))
          case (f: java.lang.Float, FLOAT) =>
            Some(cmp(FilterApi.floatColumn(c), f, op))
          case (d: java.lang.Double, DOUBLE) =>
            Some(cmp(FilterApi.doubleColumn(c), d, op))
          case (s: String, BINARY)
              if ann.isInstanceOf[
                LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            Some(cmp(FilterApi.binaryColumn(c), Binary.fromString(s), op))
          case (b: java.lang.Boolean, BOOLEAN) if op == "eq" =>
            Some(FilterApi.eq(FilterApi.booleanColumn(c), b))
          case (ts, INT64) if ann.isInstanceOf[
              LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] =>
            val unit = ann.asInstanceOf[
              LogicalTypeAnnotation.TimestampLogicalTypeAnnotation].getUnit
            val micros: Option[Long] = ts match {
              case t: java.sql.Timestamp => Some(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaTimestamp(t))
              case i: java.time.Instant => Some(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .instantToMicros(i))
              case l: java.time.LocalDateTime => Some(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .localDateTimeToMicros(l))
              case _ => None
            }
            micros.flatMap { us =>
              unit match {
                case LogicalTypeAnnotation.TimeUnit.MICROS =>
                  Some(cmp(FilterApi.longColumn(c),
                    java.lang.Long.valueOf(us), op))
                case LogicalTypeAnnotation.TimeUnit.MILLIS
                    if us % 1000L == 0L =>
                  // an off-grid micros bound under a MILLIS file would need
                  // op-dependent rounding — decline, pruning stays optional
                  Some(cmp(FilterApi.longColumn(c),
                    java.lang.Long.valueOf(us / 1000L), op))
                case _ => None
              }
            }
          case (d, INT32) if ann.isInstanceOf[
              LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
            val days: Option[Int] = d match {
              case x: java.sql.Date => Some(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaDate(x))
              case x: java.time.LocalDate => Some(x.toEpochDay.toInt)
              case _ => None
            }
            days.map(dd => cmp(FilterApi.intColumn(c),
              java.lang.Integer.valueOf(dd), op))
          case _ => None
        }
    }

    def convert(f: Filter): Option[FilterPredicate] = f match {
      case EqualTo(c, v) if v != null => leaf(c, v, "eq")
      case GreaterThan(c, v) if v != null => leaf(c, v, "gt")
      case GreaterThanOrEqual(c, v) if v != null => leaf(c, v, "gtEq")
      case LessThan(c, v) if v != null => leaf(c, v, "lt")
      case LessThanOrEqual(c, v) if v != null => leaf(c, v, "ltEq")
      case In(c, vs) if vs != null && vs.nonEmpty && vs.length <= 20 &&
          !vs.contains(null) =>
        val legs = vs.toSeq.map(v => leaf(c, v, "eq"))
        if (legs.forall(_.isDefined)) // one unmappable value ⇒ whole IN out
          Some(legs.flatten.reduce(FilterApi.or))
        else None
      case And(l, r) => // superset: either convertible side alone is safe
        (convert(l), convert(r)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) => // both sides or nothing — a partial OR under-reads
        for { a <- convert(l); b <- convert(r) } yield FilterApi.or(a, b)
      case _ => None // Not / IsNull / string matchers: never converted
    }

    filters.flatMap(f => convert(f)).reduceOption(FilterApi.and)
  }

  /** Surviving CONTIGUOUS row-group runs under the pushed predicate:
    * (first row index, byte range lo, byte range hi) per run — None when
    * no predicate converts (caller reads the whole file). Block selection
    * replays parquet's own stats-only row-group filter against the footer
    * blocks; reading each run through an explicit byte range (the midpoint
    * rule selects exactly the run's blocks) lets BOTH reader modes
    * reconstruct global row positions EXACTLY from the footer's per-block
    * row counts — what keeps DV subtraction and `_pos` correct under
    * skipping. Shared by the row and columnar readers. */
  def survivingRuns(fileSchema: MessageType,
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
      filters: Seq[Filter], names: Map[String, String])
      : Option[Vector[(Long, Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    predicateFor(fileSchema, filters, names).map { pred =>
      val keep: Set[Int] = {
        @annotation.nowarn("cat=deprecation")
        val kept = org.apache.parquet.filter2.compat.RowGroupFilter
          .filterRowGroups(
            org.apache.parquet.filter2.compat.FilterCompat.get(pred),
            blocks.asJava, fileSchema).asScala
        kept.map(b => blocks.indexWhere(_ eq b)).toSet
      }
      val starts: Seq[Long] =
        blocks.scanLeft(0L)(_ + _.getRowCount).dropRight(1)
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      var i = 0
      while (i < blocks.size) {
        if (keep(i)) {
          var j = i
          while (j + 1 < blocks.size && keep(j + 1)) j += 1
          runs += ((starts(i), blocks(i).getStartingPos,
            blocks(j).getStartingPos + blocks(j).getCompressedSize))
          i = j + 1
        } else i += 1
      }
      runs.toVector
    }
  }

  /** Typed comparison dispatch (parquet's builders are per-column-type). */
  private def cmp[T <: Comparable[T],
      C <: Operators.Column[T] with Operators.SupportsLtGt
        with Operators.SupportsEqNotEq](
      col: C, v: T, op: String): FilterPredicate = op match {
    case "eq" => FilterApi.eq(col, v)
    case "gt" => FilterApi.gt(col, v)
    case "gtEq" => FilterApi.gtEq(col, v)
    case "lt" => FilterApi.lt(col, v)
    case "ltEq" => FilterApi.ltEq(col, v)
  }
}
