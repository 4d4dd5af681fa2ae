package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-stratum z-score outlier detection over an INTEGER metric (length,
  * token count, …) — the corpus-anomaly screen of a data-quality pass —
  * with the outlier TEST done entirely in integer arithmetic:
  *
  *   z = (x − μ)/σ with population σ rewrites to
  *   z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²),
  *
  * so `|z| > t  ⟺  (n·x − Σx)² > t²·(n·Σx² − (Σx)²)` — an EXACT integer
  * comparison (no float threshold wobble at the boundary), and the
  * reported z itself is one correctly-rounded division over one
  * correctly-rounded sqrt of integers: bit-identical on any engine.
  *
  * Scale shape: one map-side-combinable aggregate for the per-stratum
  * moments (a tiny table — strata count rows), broadcast back onto the
  * corpus as a projection + filter. No window, no second shuffle of the
  * data. A stratum with zero variance emits nothing (every numerator is
  * 0), so the z division never sees a zero denominator.
  *
  * Overflow bound: values must satisfy n·Σx² < 2^63 — holds for any
  * per-stratum row count × value² product under ~9e18 (e.g. 1e9 rows of
  * values up to ~3e4); assert upstream when profiling wilder metrics.
  */
object Outliers {

  /** Rows whose `valueCol` is more than `tNum/tDen` population standard
    * deviations from their stratum's mean, with the exact z attached.
    * The rational threshold keeps the boundary test integral:
    * `|z| > p/q ⟺ q²·(n·x − Σx)² > p²·(n·Σx² − (Σx)²)`. */
  def zOutliers(df: DataFrame, strataCol: String, valueCol: String,
      tNum: Int, tDen: Int = 1): DataFrame = {
    require(tNum > 0 && tDen > 0,
      s"zOutliers: threshold must be positive, got $tNum/$tDen")
    val x = col(valueCol).cast("long")
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("__n"),
      sum(x).as("__s"),
      sum(x * x).as("__ss"))
    val num = col("__n") * x - col("__s")
    val den2 = col("__n") * col("__ss") - col("__s") * col("__s")
    df.join(broadcast(stats), strataCol)
      .filter(num * num * lit(tDen.toLong * tDen) >
        lit(tNum.toLong * tNum) * den2)
      .withColumn("z",
        num.cast("double") / sqrt(den2.cast("double")))
      .drop("__n", "__s", "__ss")
  }
}
