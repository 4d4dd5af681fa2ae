package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training pipelines. Every
  * assignment derives from a content hash of the ID — NO RNG state: the
  * same row lands in the same split on any cluster, any partitioning, any
  * rerun, and adding data never reshuffles existing assignments (the
  * property `randomSplit` lacks — its sampling is seed+partition dependent,
  * so a repartition silently reassigns rows).
  */
object Sampling {

  /** 0..99 deterministic bucket of an id column: the first 6 hex digits of
    * its md5, mod 100 — engine-portable (DuckDB: `('0x' ||
    * substr(md5(x),1,6))::BIGINT % 100`), uniform enough for split ratios.
    */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 6), 16, 10)
      .cast("long") % 100).cast("int")

  /** Assign `train`/`val`/`test` by cumulative percentage thresholds
    * (e.g. 80/10/10 ⇒ `trainPct = 80, valPct = 10`). Pure projection —
    * no shuffle, codegen throughout. */
  def assignSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: $trainPct/$valPct")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      // a NULL id must fail loud: both `<` comparisons evaluate to null,
      // so it would otherwise fall through and silently concentrate every
      // malformed row in the test split
      when(col(idCol).isNull, raise_error(lit(
        s"assignSplit: null $idCol cannot be split deterministically — " +
          "filter or repair ids first")).cast("string"))
        .when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified downsample (mixture control): keep the first
    * `cap` rows of each stratum in (md5-of-id, id) order, tagged with their
    * in-stratum rank `rn`. Exact per-stratum counts — the tool for hitting
    * a target domain/source mixture — at the cost of one window partitioned
    * by the stratum key. Strata (sources/domains) number in the thousands
    * against dozens of cores, rank state is O(1) per partition, and rows
    * past `cap` are discarded by the very next filter, so the window is the
    * cheapest exact formulation. (When approximate proportions suffice,
    * prefer a shuffle-free hash-threshold filter: `hashBucket(id) < pct`.)
    * The hex-string sort key compares identically in every engine — the
    * DuckDB oracle replays the exact selection. */
  def stratifiedCap(
      df: DataFrame, strataCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"stratifiedCap: cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
  }

  /** Deterministic per-stratum TOKEN-BUDGET cap — the mixture control a
    * training-data release actually runs ("3 GB of web, 1 GB of code"),
    * where [[stratifiedCap]]'s row count is the wrong unit: documents are
    * admitted in (md5-of-id, id) order until the stratum's budget of
    * `weightCol` units (tokens/chars/bytes) is EXHAUSTED — a doc is kept
    * iff the cumulative weight BEFORE it is under the budget, so the doc
    * that crosses the boundary is admitted (fill-until-full; budgets are
    * floors, and a stratum whose first doc exceeds the whole budget still
    * contributes that one doc — never silently empty). Output carries the
    * INCLUSIVE running total `cum_weight`. Same determinism contract as
    * the other samplers: membership is a pure function of (id, weight)
    * set — reruns, repartitions and engine changes replay it exactly
    * (integer prefix sums, hex-string order). One window per stratum key,
    * O(1) rank state, rows past the boundary dropped by the next filter. */
  def tokenBudgetCap(
      df: DataFrame, strataCol: String, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetCap: budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("cum_weight",
        sum(col(weightCol).cast("long")).over(w))
      .filter(col("cum_weight") - col(weightCol) < budget)
  }

  /** TEMPERATURE-flattened mixture resampling — the multilingual-LM
    * sampling rule ("don't let the dominant language/domain swamp the
    * mix"): per-stratum target counts ∝ √n (temperature α = 1/2), scaled
    * to a total `cap`, then the first `target_i` rows of each stratum in
    * the deterministic (md5-of-id, id) order. Integer-exact end to end so
    * an external engine replays the identical selection: weights are
    * `floor(sqrt(n_i))` (IEEE sqrt is correctly rounded in every engine —
    * unlike `pow(n, α)`, whose libm rounding diverges; this is why α is
    * fixed at 1/2 rather than a parameter), targets are
    * `cap * w_i div Σw` in integer arithmetic. Plan: one count aggregate
    * (rows: #strata), a broadcast of targets back onto the corpus, and
    * the stratifiedCap rank window — rows past the target are dropped by
    * the next filter, so state is O(1) per partition. Output keeps `rn`
    * (the in-stratum rank) like [[stratifiedCap]]. */
  def temperatureMix(
      df: DataFrame, strataCol: String, idCol: String, cap: Long): DataFrame = {
    require(cap > 0, s"temperatureMix: cap must be positive, got $cap")
    val weights = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val total = weights.agg(sum(col("__w")).as("__tw"))
    val targets = weights.crossJoin(broadcast(total))
      .select(col(strataCol),
        expr(s"CAST($cap * __w DIV __tw AS BIGINT)").as("__target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(targets), strataCol)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("__target"))
      .drop("__target")
  }

  /** Integer threshold for [[rateSample]]: rate mapped onto the 48-bit hash
    * space, floored ONCE driver-side — the literal long both the Spark
    * filter and an external oracle compare against (no per-row float
    * arithmetic to diverge). */
  def rateThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    math.floor(rate * (1L << 48)).toLong
  }

  /** Scalar keep-predicate of the rate sampler: true iff
    * md5-48(id) < floor(rate · 2^48). The floor runs in the SAME double
    * arithmetic as [[rateThreshold]] (one multiply, one floor), so a
    * literal rate reproduces the driver-side threshold bit-for-bit while a
    * per-row rate column (e.g. a CASE over sources) still works. Also the
    * SQL surface: `rate_keep(id, rate)` via [[graft.GraftExtensions]]. */
  def rateKeep(id: Column, rate: Column): Column =
    TextFunctions.md5Hash48(id.cast("string")) <
      floor(rate * lit((1L << 48).toDouble)).cast("long")

  /** Deterministic WEIGHTED top-k per stratum — priority sampling
    * (Duffield/Lund/Thorup, JACM'07): each row gets priority
    * `w / u` with `u = (md5-48(id)+1) / 2^48` a deterministic uniform on
    * (0, 1], and the k highest-priority rows per stratum survive. Rows
    * with larger weight (e.g. char count — longer documents) win
    * proportionally more often, yet membership is a pure function of the
    * id: reruns, repartitions, and corpus appends never reshuffle the
    * kept set, and an external engine replays the identical arithmetic
    * (one multiply, one divide — both IEEE-correctly-rounded, no
    * `pow`/`ln` whose libm rounding could diverge; this is why the
    * Efraimidis–Spirakis `u^(1/w)` key is NOT used). The window is
    * partitioned by the stratum (thousands of strata vs dozens of cores)
    * with O(1) rank state and rows past k dropped by the next filter. */
  def weightedPriority(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"weightedPriority: k must be positive, got $k")
    val pri = col(weightCol).cast("double") * (1L << 48).toDouble /
      (TextFunctions.md5Hash48(col(idCol).cast("string")).cast("double")
        + 1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("wpri").desc, col(idCol))
    df.withColumn("wpri", pri)
      .withColumn("wrn", row_number().over(w).cast("long"))
      .filter(col("wrn") <= k)
  }

  /** Shuffle-free per-stratum Bernoulli sampling at configured RATES (the
    * temperature-weighted mixture shape: keep source s at rate w_s^α/Z):
    * a row survives iff md5-48(id) < floor(rate_s · 2^48). Deterministic —
    * membership is a pure function of the id, so reruns/repartitions keep
    * the same rows and an external engine replays the exact integer
    * comparison. Pure projection + filter: unlike [[stratifiedCap]] there
    * is no window and no shuffle, which makes this the 100 TB default when
    * proportions (not exact counts) are the target. Strata absent from
    * `rates` are DROPPED (rate 0) — declare every source you keep. */
  def rateSample(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "rateSample: empty rate map")
    val h = TextFunctions.md5Hash48(col(idCol).cast("string"))
    // ONE map-literal lookup, not a folded CASE chain: a corpus mixture can
    // declare thousands of sources, and a depth-N nested CASE would blow
    // whole-stage codegen limits. A missing stratum looks up NULL, and
    // `h < NULL` is NULL ⇒ the filter drops the row (the documented
    // rate-0 default).
    val thresholds = typedLit(rates.map { case (s, r) => s -> rateThreshold(r) })
    df.filter(h < element_at(thresholds, col(strataCol)))
  }
}
