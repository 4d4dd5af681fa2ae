package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** PERSISTED VIEW definitions for a lake warehouse — one JSON file per
  * view under `<warehouse>/_views/<name>.json`, written atomically
  * (tmp + move) so readers see whole definitions or none. Vanilla Spark
  * 4.1 ships the DSv2 [[org.apache.spark.sql.connector.catalog.ViewCatalog]]
  * INTERFACE but routes neither `CREATE VIEW` DDL nor SELECT resolution to
  * it (the engines that expose lake views — Iceberg's Spark runtime — do it
  * through their own session extensions), so graft does the same:
  * [[GraftProcedures]] carries `CALL lake.create_view/drop_view/list_views`
  * (works in ANY session) and [[graft.GraftExtensions]] injects the
  * resolution rule that expands `SELECT ... FROM lake.default.<view>`.
  * [[GraftCatalog]] still implements the full ViewCatalog API for engines
  * that DO consume it. */
private[graft] object GraftViews {

  final case class ViewDef(
      sql: String, currentCatalog: String, currentNamespace: Seq[String],
      schemaJson: String, queryColumnNames: Seq[String],
      columnAliases: Seq[String], columnComments: Seq[String],
      properties: Map[String, String])

  private implicit val formats: org.json4s.Formats =
    org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)

  def dir(warehouse: String): Path = Paths.get(warehouse).resolve("_views")

  def file(warehouse: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]{0,127}"),
      s"graft: illegal view name '$name'")
    dir(warehouse).resolve(name + ".json")
  }

  def read(warehouse: String, name: String): Option[ViewDef] = {
    val f = file(warehouse, name)
    if (!Files.exists(f)) None
    else Some(org.json4s.jackson.Serialization.read[ViewDef](
      Files.readString(f)))
  }

  /** Atomic create; false ⇔ a view of that name already exists. Hard-link
    * CAS (the manifest-commit idiom): POSIX rename REPLACES an existing
    * target, so a tmp+move here would silently overwrite a racing create —
    * link() fails loud instead, and exactly one creator wins. */
  def create(warehouse: String, name: String, d: ViewDef): Boolean = {
    Files.createDirectories(dir(warehouse))
    val tmp = Files.createTempFile(dir(warehouse), "_tmp_view", ".json")
    Files.writeString(tmp, org.json4s.jackson.Serialization.write(d))
    try { Files.createLink(file(warehouse, name), tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  def delete(warehouse: String, name: String): Boolean =
    Files.deleteIfExists(file(warehouse, name))

  /** Atomic REPLACE of an existing view's definition (ALTER VIEW SET/
    * UNSET TBLPROPERTIES): tmp + ATOMIC_MOVE — last-writer-wins, the same
    * semantics Spark's session catalog gives concurrent ALTER VIEWs; the
    * create-race CAS stays with [[create]] (replace requires existence). */
  def replace(warehouse: String, name: String, d: ViewDef): Unit = {
    require(Files.exists(file(warehouse, name)),
      s"graft: no view '$name' in the lake")
    val tmp = Files.createTempFile(dir(warehouse), "_tmp_view", ".json")
    Files.writeString(tmp, org.json4s.jackson.Serialization.write(d))
    Files.move(tmp, file(warehouse, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def list(warehouse: String): Seq[String] = {
    if (!Files.isDirectory(dir(warehouse))) return Nil
    scala.util.Using.resource(Files.list(dir(warehouse)))(
      _.iterator().asScala.toSeq)
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  /** Atomic rename; throws on missing source, false ⇔ target taken
    * (link-then-unlink — same no-replace guarantee as [[create]]). */
  def rename(warehouse: String, from: String, to: String): Boolean = {
    require(Files.exists(file(warehouse, from)),
      s"graft: no view '$from' in the lake")
    try {
      Files.createLink(file(warehouse, to), file(warehouse, from))
      Files.deleteIfExists(file(warehouse, from))
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }
}
