package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (Bayardo et al.
  * "Scaling Up All Pairs Similarity Search", WWW'07 / PPJoin, ICDE'08) —
  * the deterministic complement of [[TextDedup]]'s MinHash-LSH: no recall
  * loss, every pair with word-set Jaccard ≥ t is found, still never
  * all-pairs.
  *
  * Algorithm (all exact integer math; threshold is the RATIONAL tn/td so
  * boundary cases can't float-wobble):
  *  1. per-doc DISTINCT lowercased whitespace tokens; global token order
  *     = ascending (document frequency, token) — rarest first;
  *  2. a doc with n tokens emits only its PREFIX, the first
  *     L = n − ⌈tn·n/td⌉ + 1 tokens: J(A,B) ≥ t implies
  *     |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets with overlap ≥ α must
  *     share a token within their (n−α+1)-prefixes under ANY global
  *     order — so candidates = pairs sharing ≥1 prefix token;
  *  3. length filter td·|B| ≥ tn·|A| (and symmetric) prunes pairs whose
  *     sizes alone cap Jaccard below t;
  *  4. candidates verify with the exact intersection
  *     (`array_intersect` over the distinct token arrays) and the
  *     integer-exact test inter·td ≥ tn·(|A|+|B|−inter).
  *
  * Scale shape: prefixes are explode→self-join on token — linear in
  * Σ prefix lengths, and because the global order puts RARE tokens in
  * prefixes, bucket sizes track token rarity, not corpus size (stopwords
  * sort last and never enter short prefixes). A degenerate corpus (one
  * token rarest-prefix for a huge doc mass) trips the LOUD `maxBucket`
  * guard instead of a quadratic reducer. Verification touches candidate
  * pairs only.
  */
object PrefixJoin {

  /** (id_a, id_b, jaccard) for every pair with word-set Jaccard ≥ tn/td,
    * id_a < id_b. */
  def jaccardJoin(docsDf: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int, maxBucket: Long = 1L << 20): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"PrefixJoin: threshold must be a rational in (0,1] (got $tNum/$tDen)")
    val occ = docsDf
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), lower(col("w")).as("w"))
      .distinct()
    val dfq = occ.groupBy("w").agg(count(lit(1)).as("df"))
    // per-doc token array in global (df, w) order; n; prefix length L
    val toks = occ.join(dfq, "w")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("w"))))
        .as("__sorted"))
      .select(col("doc_id"),
        transform(col("__sorted"), s => s.getField("w")).as("toks"),
        size(col("__sorted")).cast("long").as("n"))
      // ⌈tn·n/td⌉ via floor((tn·n + td−1)/td): the numerator stays far
      // below 2^53, so the one double division is exact-or-safely-inside
      // the floor on every engine (no float ceil at boundaries)
      .withColumn("__L",
        col("n") - floor((col("n") * tNum + lit(tDen - 1)) / lit(tDen))
          .cast("long") + lit(1L))
    // Materialize the tokenize pipeline (explode + lower + DISTINCT + df
    // join + sort-collect — two shuffles) exactly ONCE: everything below —
    // the prefix table, both self-join sides, and both verification
    // join-backs — derives from this cut. Without it the whole stage
    // re-executes ~5× (guard action, a, b, ta-join, tb-join) — at corpus
    // scale the tokenize pass dominates, so the cut is the scale fix, not
    // a micro-optimization. Same discipline as TextDedup.nearDupPairs.
    val toksM = TextDedup.checkpointed(toks)
    val pre = toksM.select(col("doc_id"), col("n"),
      explode(slice(col("toks"), lit(1), col("__L").cast("int"))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = try {
      // LOUD guard on the hottest prefix token before the self-join
      val worst = pre.groupBy("w").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket).orderBy(col("__n").desc).head(1)
      require(worst.isEmpty,
        s"PrefixJoin: prefix token ${worst.headOption.fold("")(_.toString)} " +
          s"indexes more than maxBucket=$maxBucket documents — the prefix " +
          "self-join would go quadratic on one reducer. Raise the threshold, " +
          "dedup exact duplicates first, or raise maxBucket.")

      val a = pre.select(col("doc_id").as("id_a"), col("n").as("na"), col("w"))
      val b = pre.select(col("doc_id").as("id_b"), col("n").as("nb"), col("w"))
      // candidate set materialized eagerly while `pre` is still cached —
      // nothing downstream re-touches the prefix table. Reliable checkpoint
      // when a dir is configured (cluster mode: a lost localCheckpoint
      // partition would kill the remaining verification joins), same
      // discipline as toksM above.
      TextDedup.checkpointed(
        a.join(b, Seq("w"))
          .filter(col("id_a") < col("id_b") &&
            col("nb") * tDen >= col("na") * tNum &&
            col("na") * tDen >= col("nb") * tNum)
          .select("id_a", "id_b").distinct())
    } finally pre.unpersist(blocking = false)

    cands
      .join(toksM.select(col("doc_id").as("id_a"), col("toks").as("ta"),
        col("n").as("na")), "id_a")
      .join(toksM.select(col("doc_id").as("id_b"), col("toks").as("tb"),
        col("n").as("nb")), "id_b")
      .withColumn("__i",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("__i") * tDen >= (col("na") + col("nb") - col("__i")) * tNum)
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (col("na") + col("nb") - col("__i")).cast("double")).as("jaccard"))
  }

  /** DuckDB replay of [[jaccardJoin]] over the `documents` table,
    * optionally restricted by a SQL predicate on the docs. */
  def jaccardJoinSql(tNum: Int, tDen: Int,
      docsWhere: String = "TRUE"): String =
    raw"""WITH occ AS (SELECT DISTINCT doc_id, lower(w) AS w FROM (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         |    FROM documents WHERE $docsWhere) WHERE len(w) > 0),
         |dfq AS (SELECT w, count(*) AS df FROM occ GROUP BY w),
         |tok AS (SELECT doc_id, list(w ORDER BY df, w) AS toks,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM occ JOIN dfq USING (w) GROUP BY doc_id),
         |pre AS (SELECT doc_id, n, unnest(list_slice(toks, 1,
         |    CAST(n - (n * $tNum + ${tDen - 1}) // $tDen + 1 AS INT))) AS w
         |  FROM tok),
         |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pre a JOIN pre b ON a.w = b.w AND a.doc_id < b.doc_id
         |    AND b.n * $tDen >= a.n * $tNum AND a.n * $tDen >= b.n * $tNum)
         |SELECT id_a, id_b,
         |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
         |  CAST(a.n + b.n - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |    AS jaccard
         |FROM cands JOIN tok a ON a.doc_id = id_a
         |           JOIN tok b ON b.doc_id = id_b
         |WHERE len(list_intersect(a.toks, b.toks)) * $tDen >=
         |  (a.n + b.n - len(list_intersect(a.toks, b.toks))) * $tNum
         |""".stripMargin
}
