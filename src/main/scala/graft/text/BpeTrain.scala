package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE vocabulary TRAINING (Sennrich et al., ACL'16 —
  * "Neural Machine Translation of Rare Words with Subword Units"): learn
  * the merge list from the corpus, the other half of the tokenizer story
  * next to [[graft.functions.BpeVocab]]'s fixed-vocab ENCODE (q124). Each
  * round counts adjacent symbol pairs over the DISTINCT-WORD table
  * (weighted by corpus word frequency — the classical reduction: merges
  * only depend on word multiplicities), picks the best pair under a
  * DETERMINISTIC tie-break (count DESC, then pair bytewise ASC), and
  * applies the merge leftmost-greedily to every word.
  *
  * Leftmost-greedy application ("aaaa" + merge (a,a) → [aa, aa], never
  * [aa, a, a]) is made RELATIONAL with the parity rule: adjacent match
  * positions can only chain when the pair is a self-pair (a,a) — for
  * (a,b) with a≠b two consecutive matches would force b=a — so within
  * each gaps-and-islands run of consecutive match positions, exactly the
  * even offsets merge. That turns the per-word sequential scan into two
  * window functions, which is what lets a DuckDB oracle replay the entire
  * training trajectory as unrolled CTEs ([[fitSql]], the q140 k-means
  * discipline) and lets Spark run it with NO driver-side per-word work.
  *
  * Scale shape: one explode + hash agg (map-side partial) for pair counts
  * and one wid-partitioned window pass for the merge, per round, over the
  * distinct-word table (orders of magnitude smaller than the corpus; the
  * corpus itself is read ONCE). Per round the driver receives exactly one
  * (pair, count) row. Each round's result is plan-cut via
  * [[TextDedup.checkpointed]] — k rounds of window lineage would
  * otherwise stack into an un-analyzable plan (same discipline as the
  * near-dup star rounds). The learned merges feed
  * [[graft.functions.BpeVocab]] for deployment-side encode.
  */
object BpeTrain {

  private val OutSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("piece", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Distinct words of the corpus with frequencies and per-CHARACTER
    * initial symbol arrays (whitespace tokenization identical to the rest
    * of the text stack: `split(trim(text), '\s+')`). */
  private[text] def initialWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("wid"))
      .filter(col("wid") =!= "")
      .groupBy("wid").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, char_length(wid)), " +
          "i -> substring(wid, i, 1))"))

  /** One leftmost-greedy merge of (a, b) over every word's symbol array —
    * the parity-rule window pipeline (see class doc). */
  private[text] def applyMerge(words: DataFrame, a: String, b: String)
      : DataFrame = {
    val w = Window.partitionBy("wid").orderBy("pos")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words
      .select(col("wid"), col("freq"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead("sym", 1).over(w))
      .withColumn("m", col("sym") === lit(a) && col("nxt") === lit(b))
      .withColumn("grp", when(col("m"),
        col("pos") - sum(when(col("m"), 1).otherwise(0)).over(cum)))
      .withColumn("start",
        min(when(col("m"), col("pos")))
          .over(Window.partitionBy(col("wid"), col("grp"))))
      .withColumn("domerge",
        col("m") && (col("pos") - col("start")) % 2 === 0)
      .withColumn("outsym", when(col("domerge"), concat(col("sym"), col("nxt")))
        .when(!coalesce(lag("domerge", 1).over(w), lit(false)), col("sym")))
      .filter(col("outsym").isNotNull)
      .groupBy("wid")
      .agg(first("freq").as("freq"),
        expr("transform(array_sort(collect_list(struct(pos, outsym))), " +
          "x -> x.outsym)").as("syms"))
  }

  /** Learn up to `rounds` merges; returns one row per learned merge:
    * (round 1-based, a, b, piece = a||b, cnt = the pair's corpus-weighted
    * count BEFORE the merge). Stops early when no adjacent pair remains. */
  def fit(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64], got $rounds") // k driver round-trips
    val spark = df.sparkSession
    var words = TextDedup.checkpointed(initialWords(df, textCol))
    val merges = Seq.newBuilder[Row]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val best = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      best.headOption match {
        case None => dry = true
        case Some(row) =>
          val (a, b, cnt) =
            (row.getString(0), row.getString(1), row.getLong(2))
          merges += Row(r.toLong, a, b, a + b, cnt)
          words = TextDedup.checkpointed(applyMerge(words, a, b))
          r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1), OutSchema)
  }

  /** The trained vocabulary for [[graft.functions.BpeVocab]]: every
    * initial character of the corpus plus the merge pieces, ids in
    * (chars bytewise, then merge order) — deterministic. */
  def vocabPieces(df: DataFrame, textCol: String, rounds: Int)
      : Seq[String] = {
    val chars = initialWords(df, textCol)
      .select(explode(col("syms")).as("c")).distinct()
      .orderBy("c").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq
    val merged = fit(df, textCol, rounds).orderBy("round")
      .select("piece").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq
    (chars ++ merged).distinct
  }

  /** DuckDB replay of [[fit]] — the whole trajectory as unrolled CTEs:
    * per round, the best pair from a weighted pair count (same tie-break)
    * and the parity-rule merge via the same two window functions. */
  def fitSql(rounds: Int, table: String = "documents",
      textCol: String = "text"): String = {
    def roundCte(i: Int): String = {
      val p = s"r${i - 1}"
      s"""b$i AS (
         |  SELECT a, b, cnt FROM (
         |    SELECT p.u.sym AS a, p.u.nxt AS b, sum(p.freq) AS cnt FROM (
         |      SELECT freq, unnest([{'sym': syms[i], 'nxt': syms[i+1]}
         |        for i in range(1, len(syms))]) AS u
         |      FROM $p) p
         |    GROUP BY 1, 2)
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |f$i AS (
         |  SELECT wid, freq, pos, sym, nxt,
         |    coalesce(sym = b.a AND nxt = b.b, FALSE) AS m
         |  FROM (
         |    SELECT wid, freq, u.pos AS pos, u.sym AS sym, u.nxt AS nxt
         |    FROM (
         |      SELECT wid, freq, unnest([{'pos': i, 'sym': syms[i],
         |        'nxt': CASE WHEN i < len(syms) THEN syms[i+1] END}
         |        for i in range(1, len(syms)+1)]) AS u
         |      FROM $p) q) x
         |  LEFT JOIN b$i b ON TRUE),
         |g$i AS (
         |  SELECT *, CASE WHEN m THEN pos - (sum(CASE WHEN m THEN 1 ELSE 0
         |      END) OVER (PARTITION BY wid ORDER BY pos)) END AS grp
         |  FROM f$i),
         |h$i AS (
         |  SELECT *, CASE WHEN m THEN
         |      (pos - min(pos) OVER (PARTITION BY wid, grp)) % 2 = 0
         |    ELSE FALSE END AS domerge
         |  FROM g$i),
         |r$i AS (
         |  SELECT wid, any_value(freq) AS freq,
         |    list(outsym ORDER BY pos) AS syms
         |  FROM (
         |    SELECT wid, freq, pos,
         |      CASE WHEN domerge THEN sym || nxt
         |           WHEN NOT coalesce(lag(domerge) OVER
         |             (PARTITION BY wid ORDER BY pos), FALSE) THEN sym
         |      END AS outsym
         |    FROM h$i)
         |  WHERE outsym IS NOT NULL
         |  GROUP BY wid)""".stripMargin
    }
    val rs = (1 to rounds).map(roundCte).mkString(",\n")
    val out = (1 to rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, a, b, a || b AS piece, " +
        s"CAST(cnt AS BIGINT) AS cnt FROM b$i").mkString(" UNION ALL ")
    raw"""WITH w AS (SELECT w AS wid, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split_regex(trim($textCol), '\s+'))
         |    AS w FROM $table)
         |  WHERE w <> '' GROUP BY 1),
         |r0 AS (SELECT wid, freq,
         |  [substr(wid, i, 1) for i in range(1, length(wid)+1)] AS syms
         |  FROM w),
         |$rs
         |SELECT * FROM ($out)
         |""".stripMargin
  }
}
