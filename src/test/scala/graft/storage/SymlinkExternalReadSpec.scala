package graft.storage

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** CROSS-ENGINE snapshot read proof. The reference provisions a
  * symlink-manifest crawler + second Glue catalog precisely so engines
  * OTHER than the writing Spark job (Athena, Redshift Spectrum) can query
  * the transactional table (reference: cdk_stacks/glue_stack.py:262-279,
  * README.md:51-52). q176 re-reads the manifests through Spark; this spec
  * closes the loop with a genuinely independent reader: the raw
  * parquet-mr record API (`ParquetReader` + `GroupReadSupport`) — no
  * Spark plan, no DataSource, no graft code anywhere on the read path —
  * plus hive-style partition values parsed from directory names, exactly
  * how an external manifest-reading engine attaches them. The external
  * read must hash-match graft's transactional snapshot. */
class SymlinkExternalReadSpec extends SparkSpec {
  import spark.implicits._

  private def readManifestUris(dir: String, rels: Seq[String]): Seq[String] =
    rels.flatMap { rel =>
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir).resolve(rel))
        .split('\n').toSeq.filter(_.nonEmpty)
    }

  /** The external engine: raw parquet-mr records + path-borne partition
    * value. Returns (id, seg, v) rows. */
  private def externalRead(uris: Seq[String]): Vector[(Long, String, Double)] = {
    val conf = new Configuration()
    uris.flatMap { u =>
      val seg = u.split('/').find(_.startsWith("seg=")).map(s =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.drop(4))).getOrElse(
        fail(s"no hive partition dir in manifest uri $u"))
      val rd = ParquetReader
        .builder(new GroupReadSupport(), new Path(u)).withConf(conf).build()
      try Iterator.continually(rd.read()).takeWhile(_ != null).map { g =>
        (g.getLong("id", 0), seg, g.getDouble("v", 0))
      }.toVector
      finally rd.close()
    }.toVector
  }

  private def digest(rows: Vector[(Long, String, Double)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.sorted.foreach { case (i, s, d) =>
      md.update(s"$i|$s|$d\n".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  test("raw parquet-mr read of the symlink manifests hash-matches the " +
      "transactional snapshot") {
    val dir = tmpDir("symx") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionKey = Some("seg")))
    t.create((1L to 300L).map(i => (i, s"s${i % 3}", i * 1.5))
      .toDF("id", "seg", "v"))
    // make sure REPLACED files exist (they must never be listed) and the
    // snapshot is not just the initial load
    t.upsert((1L to 60L).map(i => (i, s"s${i % 3}", i * 2.5))
      .toDF("id", "seg", "v"))
    t.delete(Seq(7L, 8L).map(Tuple1(_)).toDF("id"))
    val manifests = t.generateSymlinkManifest()
    assert(manifests.size >= 3, "one manifest per partition dir")
    val external = externalRead(readManifestUris(dir, manifests))
    val snapshot = t.read().select("id", "seg", "v")
      .as[(Long, String, Double)].collect().toVector
    assert(external.size == snapshot.size)
    assert(digest(external) == digest(snapshot),
      "external raw-parquet read must hash-match the graft snapshot")
    // the manifest is a SNAPSHOT: a later commit changes nothing for the
    // external engine until GENERATE runs again (Delta's contract) …
    t.upsert(Seq((301L, "s0", 9.9)).toDF("id", "seg", "v"))
    val external2 = externalRead(readManifestUris(dir, manifests))
    assert(digest(external2) == digest(snapshot))
    // … and regeneration republishes the new snapshot
    val manifests2 = t.generateSymlinkManifest()
    val external3 = externalRead(readManifestUris(dir, manifests2))
    assert(external3.size == snapshot.size + 1)
    assert(external3.contains((301L, "s0", 9.9)))
  }

  test("deletion-vectored snapshots refuse to publish symlink manifests") {
    val dir = tmpDir("symx") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionKey = Some("seg"),
      changeDataFeed = true, deletionVectors = true))
    t.create(Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "seg", "v"))
    t.delete(Seq(Tuple1(1L)).toDF("id"))
    // a raw-parquet reader would resurrect the deleted row — fenced loud
    intercept[IllegalArgumentException](t.generateSymlinkManifest())
    // purge retires the vectors; the manifest publishes and reads exact
    t.purgeDeletionVectors()
    val uris = readManifestUris(dir, t.generateSymlinkManifest())
    assert(externalRead(uris).map(r => (r._1, r._3)).sorted ==
      Vector((2L, 2.0)))
  }
}
