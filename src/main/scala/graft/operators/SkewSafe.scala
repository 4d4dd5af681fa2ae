package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe aggregation shapes. Plain sum/count skew is already absorbed by
  * Spark's partial aggregation; the shape that actually melts a reducer at
  * 100 TB is per-key DISTINCT over a hot key (the partial state is the
  * distinct set itself). The fix: salt by a hash of the VALUE, so one hot
  * key's distinct set is partitioned across `salts` reducers, each counts
  * its disjoint shard exactly, and the partials sum — identical result to a
  * direct count_distinct (value-hash partitioning ⇒ no double counting),
  * checked against the direct form by oracle (q50) and spec.
  */
object SkewSafe {

  /** Exact per-key distinct-value count via two-stage value-salted
    * aggregation. */
  def saltedDistinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 32): DataFrame = {
    val keyed = keyCols.map(col)
    df.groupBy(keyed :+ pmod(xxhash64(col(valueCol)), lit(salts.toLong))
        .as("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keyed: _*)
      .agg(sum(col("__partial")).as("n_distinct"))
  }

  /** Skew-safe equi-join: salt the big side's rows across `salts` sub-keys
    * and replicate the small side once per sub-key, so one hot join key
    * spreads over `salts` reducers instead of melting one. Result is
    * row-identical to the plain inner join (each big row joins the full
    * small-side key group exactly once, under exactly one salt). The manual
    * form of what AQE's skew-join split does at runtime — for when the skew
    * is known ahead (e.g. a power-law entity id) or AQE's per-partition
    * thresholds can't see it. Shuffle cost: big side unchanged, small side
    * ×salts — keep `salts` modest. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keyCols: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be positive")
    // The salt must be DETERMINISTIC per row: monotonically_increasing_id/
    // rand re-salt rows differently when a lost map task is recomputed, so
    // reducers that already fetched the old copies see rows twice or never
    // (the SPARK-23207 failure class — worst exactly in the retry-heavy
    // regime this operator targets). Hash the full row instead: stable under
    // recomputation; only EXACT duplicate rows share a salt (they carry
    // identical join output anyway, and such duplicates concentrate only if
    // the hot key's rows are byte-identical).
    // xxhash64 rejects MAP-typed inputs — hash only the hashable columns
    // (dropping a map column just coarsens salt spread, never correctness)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = big.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    val saltedBig = big.withColumn(
      "__salt",
      if (hashCols.nonEmpty)
        pmod(xxhash64(struct(hashCols.toIndexedSeq: _*)), lit(salts.toLong))
      else lit(0L))
    val saltedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, keyCols :+ "__salt").drop("__salt")
  }
}
