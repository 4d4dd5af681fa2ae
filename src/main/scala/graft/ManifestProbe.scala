package graft

import graft.storage.{ColRange, CommitManifest, FileEntry, ManifestCheckpoint}
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Direct A/B of the two FULL-manifest encodings at the file counts the
  * parquet checkpoint exists for (round 17): synthesize a 10⁵-entry
  * FileEntry list with realistic stats (key bounds, one statsColumn
  * range, null counts, an NDV sketch on every 8th file), write it as
  * (a) the monolithic JSON array the pre-r17 checkpoints inlined and
  * (b) the parquet checkpoint sidecar, then time COLD loads of each
  * (min of 3) and report bytes. No Spark session — the driver-side
  * planning cost is pure JVM work, which is exactly the point.
  *
  * Run manually (NOT part of the driver contract):
  * {{{ sbt "runMain graft.ManifestProbe /tmp/manifestprobe" }}}
  */
object ManifestProbe {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      args.headOption.getOrElse("/tmp/manifestprobe"))
    java.nio.file.Files.createDirectories(out)
    val n = 100000
    val files = (0 until n).map { i =>
      FileEntry(
        path = f"v${i / 64}%05d-0000/part-$i%06d.parquet",
        rows = 100000L + i,
        minKey = Some((i * 1000L).toString),
        maxKey = Some((i * 1000L + 999L).toString),
        minKey2 = Some("1"), maxKey2 = Some("7"),
        bytes = 128L << 20,
        extra = Map("c_acctbal" ->
          ColRange(Some(s"-$i.55"), Some(s"${i * 2}.25"))),
        nulls = Map("c_acctbal" -> (i % 17).toLong),
        ndv = if (i % 8 == 0)
          Map("c_name" -> (0 until 64).map(j => i * 1000L + j))
        else Map.empty)
    }
    val m = CommitManifest(1, 0, "{}", Seq("k"), None,
      keyNumeric = true, rowCount = n * 100000L, files = files)

    val jsonPath = out.resolve("full.json")
    java.nio.file.Files.writeString(jsonPath, Serialization.write(m))
    val pqPath = out.resolve("full.files.parquet")
    java.nio.file.Files.deleteIfExists(pqPath)
    ManifestCheckpoint.write(pqPath, files)

    def best(f: => Int): Double = (1 to 3).map(_ => time(f)).min
    val tJson = best(Serialization.read[CommitManifest](
      java.nio.file.Files.readString(jsonPath)).files.size)
    val tPq = best(ManifestCheckpoint.read(pqPath).size)
    require(ManifestCheckpoint.read(pqPath) == files, "round-trip drift")
    println(s"""{"probe":"manifest_encoding","files":$n,""" +
      s""""json_bytes":${java.nio.file.Files.size(jsonPath)},""" +
      s""""parquet_bytes":${java.nio.file.Files.size(pqPath)},""" +
      s""""json_cold_sec":${f"$tJson%.3f"},""" +
      s""""parquet_cold_sec":${f"$tPq%.3f"}}""")
  }
}
