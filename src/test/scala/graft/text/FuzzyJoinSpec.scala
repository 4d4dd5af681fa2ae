package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzzy edit-distance join ≡ brute force on adversarial inputs: template
  * prefixes (the hot-gram case the rarest-first prefix defuses), short
  * strings (below the gram bound — the brute bucket), mixed lengths, and
  * k = 0/1/2. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && lev(s1, s2) <= k
    } yield (i1, i2)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 3)
      : Set[(Long, Long)] =
    FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", k, q)
      .select($"id_1", $"id_2").as[(Long, Long)].collect().toSet

  test("templated strings (hot shared prefix): exact vs brute, k=1") {
    // the adversarial shape: every string shares "Customer#0000"
    val rows = (1L to 120L).map(i => (i, f"Customer#${i % 40}%09d"))
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("short strings below the gram bound go through the brute bucket") {
    val rows = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "ab"),
      (5L, "abcd"), (6L, "zzzz"), (7L, ""), (8L, "a"))
    for (k <- 0 to 2)
      assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("mixed lengths and k=0 (exact duplicates only)") {
    val rows = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown fix"), (4L, "a completely other string"),
      (5L, "the quick brow fox"), (6L, "the quick brown foxes"))
    assert(run(rows, 0) == Set((1L, 2L)))
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("seeded pseudo-random corpus: exact vs brute across k") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    val rows = (1L to 150L).map { i =>
      val len = 4 + rnd.nextInt(8)
      (i, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    for (k <- 0 to 2)
      assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("two-sided lookup: probe vs master, cross-side pairs only") {
    val probe = Seq((1L, "jon smith"), (2L, "jane doe"), (3L, "nobody"))
      .toDF("pid", "name")
    val master = Seq((1L, "john smith"), (2L, "jane roe"), (3L, "jane doe"))
      .toDF("mid", "name")
    val got = FuzzyJoin.editDistanceLookup(
      probe, "pid", "name", master, "mid", "name", maxDist = 1)
      .select($"probe_id", $"master_id", $"dist")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("1", "1", 1L), ("2", "2", 1L), ("2", "3", 0L)))
    // probe-probe and master-master pairs never leak through
    val probeDup = Seq((1L, "aaa"), (2L, "aaa")).toDF("pid", "name")
    val masterOne = Seq((9L, "zzz")).toDF("mid", "name")
    assert(FuzzyJoin.editDistanceLookup(
      probeDup, "pid", "name", masterOne, "mid", "name", 1).count() == 0)
  }

  test("hot-prefix guard trips loud instead of going quadratic") {
    val rows = (1L to 50L).map(i => (i, s"aaaaaaaa$i"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s",
        maxDist = 1, maxBucket = 3).count()
    }
    assert(e.getMessage.contains("maxBucket"))
  }
}
