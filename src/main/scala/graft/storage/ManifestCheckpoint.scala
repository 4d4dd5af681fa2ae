package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** PARQUET-encoded checkpoint manifests (the Delta parquet-checkpoint
  * architecture): the every-[[CowTable.ManifestCheckpointEvery]]-th FULL
  * manifest of a large table stores its [[FileEntry]] list as one parquet
  * row per file next to the JSON commit record, instead of inlining a
  * 10⁵–10⁶-element JSON array. Cold planning on a 100k-file table then
  * costs a compressed columnar read plus a per-row decode — not one
  * monolithic driver-side JSON parse whose transient AST dwarfs the data
  * (the reason Delta moved its checkpoints to parquet). Delta-encoded
  * commits between checkpoints are unaffected (they are O(changed files)
  * already).
  *
  * Scalar fields are TYPED columns; the three nested stat maps (`extra`,
  * `nulls`, `ndv` — sparse, absent on most files) ride as compact
  * per-entry JSON, written with the exact serializer the JSON manifest
  * uses, so the round-trip is bit-identical by construction. */
private[graft] object ManifestCheckpoint {

  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** File-name suffix — checkpoint sidecars live in `_manifests/` as
    * `v%05d-<uuid>.files.parquet` (the uuid keeps racing writers' outputs
    * distinct; the loser's file is unreferenced garbage it deletes). */
  val Suffix = ".files.parquet"

  private val Schema = MessageTypeParser.parseMessageType(
    """message graft_checkpoint {
      |  required binary path (STRING);
      |  required int64 rows;
      |  optional binary minKey (STRING);
      |  optional binary maxKey (STRING);
      |  optional binary minKey2 (STRING);
      |  optional binary maxKey2 (STRING);
      |  required int64 bytes;
      |  optional binary extraJson (STRING);
      |  optional binary nullsJson (STRING);
      |  optional binary ndvJson (STRING);
      |  optional binary zorderBy (STRING);
      |  optional binary dvPath (STRING);
      |  required int64 dvRows;
      |}""".stripMargin)

  def write(target: java.nio.file.Path, files: Seq[FileEntry]): Unit = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(Schema, conf)
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(target.toString))
      .withConf(conf)
      .withType(Schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(Schema)
    try files.foreach { e =>
      val g = factory.newGroup()
      g.append("path", e.path)
      g.append("rows", e.rows)
      e.minKey.foreach(g.append("minKey", _))
      e.maxKey.foreach(g.append("maxKey", _))
      e.minKey2.foreach(g.append("minKey2", _))
      e.maxKey2.foreach(g.append("maxKey2", _))
      g.append("bytes", e.bytes)
      if (e.extra.nonEmpty) g.append("extraJson", Serialization.write(e.extra))
      if (e.nulls.nonEmpty) g.append("nullsJson", Serialization.write(e.nulls))
      if (e.ndv.nonEmpty) g.append("ndvJson", Serialization.write(e.ndv))
      e.zorderBy.foreach(g.append("zorderBy", _))
      e.dvPath.foreach(g.append("dvPath", _))
      g.append("dvRows", e.dvRows)
      w.write(g)
    } finally w.close()
  }

  def read(target: java.nio.file.Path): Seq[FileEntry] = {
    def opt(g: Group, f: String): Option[String] =
      if (g.getFieldRepetitionCount(f) == 0) None else Some(g.getString(f, 0))
    val r = ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(target.toString)).build()
    val out = Seq.newBuilder[FileEntry]
    try {
      var g = r.read()
      while (g != null) {
        out += FileEntry(
          path = g.getString("path", 0),
          rows = g.getLong("rows", 0),
          minKey = opt(g, "minKey"),
          maxKey = opt(g, "maxKey"),
          minKey2 = opt(g, "minKey2"),
          maxKey2 = opt(g, "maxKey2"),
          bytes = g.getLong("bytes", 0),
          extra = opt(g, "extraJson")
            .fold(Map.empty[String, ColRange])(
              Serialization.read[Map[String, ColRange]]),
          nulls = opt(g, "nullsJson")
            .fold(Map.empty[String, Long])(
              Serialization.read[Map[String, Long]]),
          ndv = opt(g, "ndvJson")
            .fold(Map.empty[String, Seq[Long]])(
              Serialization.read[Map[String, Seq[Long]]]),
          zorderBy = opt(g, "zorderBy"),
          dvPath = opt(g, "dvPath"),
          dvRows = g.getLong("dvRows", 0))
        g = r.read()
      }
    } finally r.close()
    out.result()
  }
}
