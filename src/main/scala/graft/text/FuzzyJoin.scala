package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FUZZY (edit-distance) join — entity matching / near-key linking: every
  * pair of rows whose strings are within Levenshtein distance `k`, found
  * EXACTLY but never all-pairs (Gravano et al. q-gram joins, VLDB'01 +
  * ED-Join prefix filtering, VLDB'08).
  *
  * Algorithm (exact, integer-only pruning):
  *  1. positional q-GRAMS as a tagged multiset — gram text + its
  *     occurrence index within the string, so tagged-set intersection IS
  *     multiset intersection; `k` edits destroy at most `k·q` grams, so
  *     ED ≤ k ⇒ shared grams ≥ max(g₁,g₂) − k·q;
  *  2. PREFIX filter: under a global rarest-first (frequency, gram, occ)
  *     order, a pair sharing ≥ c grams shares one within each side's
  *     (g − c + 1)-prefix — here length min(g, k·q + 1). Rarest-first is
  *     what keeps candidate buckets small when strings share a template
  *     prefix (e.g. "Customer#0000…"): the template grams are FREQUENT
  *     and never enter prefixes;
  *  3. LENGTH filter |len₁ − len₂| ≤ k everywhere;
  *  4. strings too short for the gram argument (max(len) < q·(k+1) —
  *     then the shared-gram bound can be 0) pair inside a SHORT bucket by
  *     brute length-banded join, size-guarded LOUD;
  *  5. candidates verify with exact `levenshtein` — pruning affects cost,
  *     never the answer.
  */
object FuzzyJoin {

  /** (id_1, id_2, dist) for every pair with levenshtein ≤ maxDist,
    * id_1 < id_2. `idCol` must be unique. */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3,
      maxBucket: Long = 1L << 20,
      maxShortBucket: Long = 1L << 22): DataFrame = {
    require(maxDist >= 0 && q >= 1,
      s"FuzzyJoin: need maxDist >= 0 and q >= 1 (got $maxDist, $q)")
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__len", length(col("__s")))
    val prefixLen = maxDist * q + 1
    val shortMax = q * (maxDist + 1) - 1 // max(len) below ⇒ gram bound void

    // tagged q-grams: (gram, occurrence-within-string)
    val grams = base.filter(col("__len") >= q)
      .select(col("__id"), col("__len"), col("__s"),
        posexplode(sequence(lit(1), col("__len") - (q - 1)))
          .as(Seq("__p", "__pos")))
      .withColumn("__g", expr(s"substring(__s, __pos, $q)"))
      .withColumn("__occ", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__id"), col("__g")).orderBy(col("__pos"))))
      .select(col("__id"), col("__len"), col("__g"), col("__occ"))
    // global rarest-first order on (frequency, gram, occ)
    val freq = grams.groupBy("__g", "__occ").agg(count(lit(1)).as("__f"))
    val pre = grams.join(freq, Seq("__g", "__occ"))
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
          .orderBy(col("__f"), col("__g"), col("__occ"))))
      .filter(col("__rank") <= prefixLen)
      .select(col("__id"), col("__len"), col("__g"), col("__occ"))

    // LOUD guard on the hottest prefix gram before the self-join
    val worst = pre.groupBy("__g", "__occ").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).orderBy(col("__n").desc).head(1)
    require(worst.isEmpty,
      s"FuzzyJoin: prefix gram ${worst.headOption.fold("")(_.toString)} " +
        s"indexes more than maxBucket=$maxBucket strings — the candidate " +
        "join would go quadratic on one reducer. Dedup exact duplicates " +
        "first, raise q, or raise maxBucket.")

    val a = pre.select(col("__id").as("id_1"), col("__len").as("__l1"),
      col("__g"), col("__occ"))
    val b = pre.select(col("__id").as("id_2"), col("__len").as("__l2"),
      col("__g"), col("__occ"))
    val gramCands = a.join(b, Seq("__g", "__occ"))
      .filter(col("id_1") < col("id_2") &&
        abs(col("__l1") - col("__l2")) <= maxDist)
      .select("id_1", "id_2")

    // SHORT bucket: both strings ≤ shortMax — brute within a LOUD size
    // guard (length band applied in the verify step like everywhere else)
    val short = base.filter(col("__len") <= shortMax)
    val nShort = short.count()
    require(nShort * nShort <= maxShortBucket,
      s"FuzzyJoin: $nShort strings are shorter than q*(maxDist+1)=" +
        s"${shortMax + 1} chars — their brute pairing exceeds " +
        s"maxShortBucket=$maxShortBucket; lower q or pre-bucket them")
    val shortCands = short.select(col("__id").as("id_1"),
        col("__len").as("__l1"))
      .crossJoin(short.select(col("__id").as("id_2"),
        col("__len").as("__l2")))
      .filter(col("id_1") < col("id_2") &&
        abs(col("__l1") - col("__l2")) <= maxDist)
      .select("id_1", "id_2")

    gramCands.union(shortCands).distinct()
      .join(base.select(col("__id").as("id_1"), col("__s").as("__s1")),
        "id_1")
      .join(base.select(col("__id").as("id_2"), col("__s").as("__s2")),
        "id_2")
      .withColumn("dist",
        levenshtein(col("__s1"), col("__s2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_1", "id_2", "dist")
  }

  /** Two-sided variant — entity RESOLUTION of a probe set against a master
    * list: (probe_id, master_id, dist) for every cross-side pair within
    * `maxDist`. Runs the same prefix-filtered machinery over the tagged
    * union (one index, not probe×master), keeping only cross-side
    * survivors — ids may collide between the two inputs (tags
    * disambiguate). */
  def editDistanceLookup(probe: DataFrame, probeId: String, probeStr: String,
      master: DataFrame, masterId: String, masterStr: String,
      maxDist: Int, q: Int = 3,
      maxBucket: Long = 1L << 20,
      maxShortBucket: Long = 1L << 22): DataFrame = {
    val p = probe.select(
      concat(lit("p:"), col(probeId).cast("string")).as("__tid"),
      col(probeStr).as("__str"))
    val m = master.select(
      concat(lit("m:"), col(masterId).cast("string")).as("__tid"),
      col(masterStr).as("__str"))
    val pairs = editDistanceJoin(p.unionAll(m), "__tid", "__str",
      maxDist, q, maxBucket, maxShortBucket)
    // normalize so probe is always the left side, then strip tags
    val oriented = pairs
      .select(col("id_1").as("a"), col("id_2").as("b"), col("dist"))
      .filter(substring(col("a"), 1, 2) =!= substring(col("b"), 1, 2))
      .select(
        when(col("a").startsWith("p:"), col("a")).otherwise(col("b"))
          .as("pt"),
        when(col("a").startsWith("p:"), col("b")).otherwise(col("a"))
          .as("mt"),
        col("dist"))
    oriented.select(
      expr("substring(pt, 3)").as("probe_id"),
      expr("substring(mt, 3)").as("master_id"), col("dist"))
  }
}
