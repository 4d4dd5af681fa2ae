package graft.storage

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** ATOMIC MULTI-TABLE RELEASE — the cross-table publish primitive a
  * training-corpus build needs ("corpus-v3 = documents@12 + embeddings@7 +
  * stats@3, reproducible forever"): each member table's version is pinned
  * with an immutable TAG (`release-<name>`, vacuum-proof — the retention
  * low-water mark stops at tags), and the release becomes visible in ONE
  * atomic hard-link of the lake-level manifest
  * (`<lakeDir>/_releases/<name>.json`, the same CAS idiom as tags and the
  * catalog chain). Readers resolve members THROUGH the manifest, so they
  * see the whole release or none of it:
  *
  *   - a crash after some tags but before the manifest leaves only orphan
  *     tags — the release never existed (its manifest is its identity);
  *     the retried create fails LOUD on the leftover tag (tags are
  *     immutable) rather than silently pinning a stale version;
  *   - two concurrent creates of the same name: the tag CAS (and manifest
  *     CAS behind it) lets exactly one win;
  *   - [[drop]] removes the manifest FIRST (the release disappears
  *     atomically), then the member tags — a crash in between leaves
  *     orphan pins, which is the conservative failure (data retained).
  *
  * Members must be registered in the lake's [[LakeRegistry]] catalog —
  * a release names tables, not paths, so the whole lake stays relocatable.
  * O(tables) metadata; no data copied.
  */
object Release {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  final case class Member(table: String, version: Int)
  final case class Def(name: String, members: Seq[Member])

  private def dir(lakeDir: String) = Paths.get(lakeDir).resolve("_releases")
  private def file(lakeDir: String, name: String) =
    dir(lakeDir).resolve(name + ".json")
  private def tagName(name: String) = s"release-$name"

  /** Pin every table's CURRENT version and publish atomically. */
  def create(
      spark: SparkSession, lakeDir: String, name: String,
      tableNames: Seq[String]): Def = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]{0,100}"),
      s"bad release name '$name'")
    require(tableNames.nonEmpty, "release needs at least one table")
    require(tableNames.distinct == tableNames,
      s"duplicate tables in release: $tableNames")
    val members = tableNames.map { t =>
      val tbl = LakeRegistry.open(spark, lakeDir, t)
      Member(t, tbl.tag(tagName(name)))
    }
    val d = Def(name, members)
    Files.createDirectories(dir(lakeDir))
    val tmp = Files.createTempFile(dir(lakeDir), "_rel", ".tmp")
    Files.writeString(tmp, Serialization.write(d))
    try Files.createLink(file(lakeDir, name), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"release '$name' already exists — releases are immutable")
    } finally Files.deleteIfExists(tmp)
    d
  }

  /** The published releases (manifest-visible only). */
  def list(lakeDir: String): Seq[String] = {
    val d = dir(lakeDir)
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).sorted
      finally s.close()
    }
  }

  def definition(lakeDir: String, name: String): Def = {
    val f = file(lakeDir, name)
    require(Files.exists(f),
      s"no release '$name' (have: ${list(lakeDir).mkString(", ")})")
    Serialization.read[Def](Files.readString(f))
  }

  /** Every member table's pinned snapshot, by table name. */
  def open(
      spark: SparkSession, lakeDir: String, name: String)
      : Map[String, DataFrame] = {
    val d = definition(lakeDir, name)
    d.members.map { m =>
      val tbl = LakeRegistry.open(spark, lakeDir, m.table)
      val pinned = tbl.tags.getOrElse(tagName(name),
        throw new IllegalStateException(
          s"release '$name': tag missing on ${m.table}"))
      require(pinned == m.version,
        s"release '$name': ${m.table} tag at $pinned != manifest " +
          s"${m.version}")
      m.table -> tbl.readTag(tagName(name))
    }.toMap
  }

  /** Unpublish: manifest first (atomic disappearance), then the pins. */
  def drop(spark: SparkSession, lakeDir: String, name: String): Unit = {
    val d = definition(lakeDir, name)
    Files.delete(file(lakeDir, name))
    d.members.foreach { m =>
      val tbl = LakeRegistry.open(spark, lakeDir, m.table)
      if (tbl.tags.contains(tagName(name))) tbl.dropTag(tagName(name))
    }
  }
}
