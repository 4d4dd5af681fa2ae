package graft.storage

import graft.SparkSpec

class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: (Long, String, String, Double)*) =
    r.toSeq.toDF("id", "seg", "region", "v")

  private def fresh(pk: Option[String]): CowTable = {
    val dir = tmpDir("evo")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = pk))
  }

  test("evolution commit is metadata-only: same files, dataChange=false") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0), (2, "B", "us", 2.0)))
    val before = t0.manifest(1).files.map(_.path).toSet
    val t1 = t0.alterPartitionKey(Some("region"))
    assert(t1.currentVersion == 2)
    val m2 = t1.manifest(2)
    assert(!m2.dataChange)
    assert(m2.files.map(_.path).toSet == before)
    assert(m2.partitionKey.contains("region"))
  }

  test("old layout reads back; new writes adopt the new spec") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0), (2, "B", "us", 2.0)))
    val t1 = t0.alterPartitionKey(Some("region"))
    t1.upsert(rows((3, "A", "ap", 3.0), (2, "B", "us", 2.5)))
    val m = t1.manifest(t1.currentVersion)
    // the upsert's fresh files live under the NEW key's dirs
    val freshPaths = m.files.map(_.path).filter(_.startsWith(
      f"v${t1.currentVersion}%05d"))
    assert(freshPaths.nonEmpty && freshPaths.forall(_.contains("region=")))
    assert(freshPaths.forall(!_.contains("seg=")))
    // untouched old-layout file (id=1's) still under the old key's dir
    assert(m.files.exists(_.path.contains("seg=A")))
    // BOTH partition columns read back correctly across both layouts
    assert(t1.read().as[(Long, String, String, Double)].collect().toSet ==
      Set((1L, "A", "eu", 1.0), (2L, "B", "us", 2.5), (3L, "A", "ap", 3.0)))
  }

  test("flat → partitioned and back") {
    val t0 = fresh(None)
    t0.create(rows((1, "A", "eu", 1.0)))
    val t1 = t0.alterPartitionKey(Some("seg"))
    t1.upsert(rows((2, "B", "us", 2.0)))
    assert(t1.manifest(t1.currentVersion).files
      .exists(_.path.contains("seg=B")))
    val t2 = t1.alterPartitionKey(None)
    t2.upsert(rows((3, "A", "ap", 3.0)))
    val freshPaths = t2.manifest(t2.currentVersion).files.map(_.path)
      .filter(_.startsWith(f"v${t2.currentVersion}%05d"))
    assert(freshPaths.nonEmpty && freshPaths.forall(!_.contains("=")))
    assert(t2.read().as[(Long, String, String, Double)].collect().toSet ==
      Set((1L, "A", "eu", 1.0), (2L, "B", "us", 2.0), (3L, "A", "ap", 3.0)))
  }

  test("time travel across the evolution boundary reads the old spec") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0)))
    val t1 = t0.alterPartitionKey(Some("region"))
    t1.upsert(rows((2, "B", "us", 2.0)))
    assert(t1.readVersion(1).as[(Long, String, String, Double)]
      .collect().toSet == Set((1L, "A", "eu", 1.0)))
  }

  test("unknown partition column fails loud") {
    val t0 = fresh(None)
    t0.create(rows((1, "A", "eu", 1.0)))
    val e = intercept[IllegalArgumentException] {
      t0.alterPartitionKey(Some("nope"))
    }
    assert(e.getMessage.contains("not in the table schema"))
  }
}
