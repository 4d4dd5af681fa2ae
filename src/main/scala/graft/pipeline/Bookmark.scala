package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Incremental-file tracking — the engine's equivalent of Glue job bookmarks
  * (reference: `--job-bookmark-option job-bookmark-enable`,
  * cdk_stacks/glue_stack.py:108, consumed via `transformation_ctx` at
  * src/hudi/hudi-cdc-load.py:67): each run sees only source files not yet
  * processed, so the hourly CDC job is incremental and replay-safe.
  *
  * State is a JSON list of processed file names, committed atomically
  * (tmp-write + ATOMIC_MOVE) AFTER the batch's table commits succeed, so a
  * crash mid-batch re-processes the batch — safe because dedup + MERGE are
  * idempotent (SURVEY.md §5's convergence property, tested in CdcPipelineSpec).
  * O(processed files) metadata, independent of data volume — holds at 100 TB.
  */
final class Bookmark(statePath: Path) {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  def processed: Set[String] =
    if (Files.exists(statePath))
      Serialization.read[Seq[String]](Files.readString(statePath)).toSet
    else Set.empty

  /** Deterministically ordered parquet files under `dir` not yet processed. */
  def newFiles(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val seen = processed
      scala.util.Using.resource(Files.list(d)) {
        _.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map(_.toAbsolutePath.toString)
          .filterNot(seen)
          .toSeq.sorted
      }
    }
  }

  /** Record `files` as processed (atomic swap). */
  def commit(files: Seq[String]): Unit = {
    val all = (processed ++ files).toSeq.sorted
    Files.createDirectories(statePath.getParent)
    val tmp = statePath.resolveSibling(statePath.getFileName.toString + ".tmp")
    Files.writeString(tmp, Serialization.write(all))
    Files.move(tmp, statePath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object Bookmark {
  def apply(statePath: String): Bookmark = new Bookmark(Paths.get(statePath))
}
