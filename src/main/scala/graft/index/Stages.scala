package graft.index

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Stage checkpointing with per-stage lineage — the resumable-build
  * contract of the north rule, mirroring the reference's per-stage
  * Parquet persistence and JSON metadata sidecars
  * (/root/reference/src/builder.rs:271-433,
  * /root/reference/src/storage/parquet.rs:129-159): each pipeline stage
  * owns a directory with a `_lineage.json` recording the input
  * fingerprint, parameters, wall time, and per-file (≈ per-partition
  * output) metrics. A rerun skips any stage whose `_SUCCESS` marker and
  * fingerprint match — so an interrupted index build resumes from the
  * last completed stage instead of restarting.
  */
object Stage {

  case class Result(name: String, skipped: Boolean, wallMs: Long)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def lineagePath(stageDir: String): Path = Paths.get(stageDir, "_lineage.json")

  /** Fingerprint recorded in lineage; change → stage recomputes. */
  def fingerprintOf(parts: String*): String =
    java.lang.Long.toHexString(graft.util.Hashing.hash64(0x5747L, parts: _*))

  def isComplete(stageDir: String, fingerprint: String): Boolean = {
    val lp = lineagePath(stageDir)
    if (!Files.exists(lp) || !Files.exists(Paths.get(stageDir, "_SUCCESS_STAGE")))
      return false
    val json = Files.readString(lp)
    json.contains(s""""fingerprint": "${esc(fingerprint)}"""")
  }

  /** Run `compute` unless the stage already completed with the same
    * fingerprint. `compute` must (re)create `stageDir`'s payload; rows
    * returned are recorded in lineage.
    */
  def run(stageDir: String, name: String, fingerprint: String)(compute: => Long): Result = {
    if (isComplete(stageDir, fingerprint)) return Result(name, skipped = true, 0L)
    // incomplete/stale stage: clear and recompute
    deleteRecursive(Paths.get(stageDir))
    val t0 = System.nanoTime()
    val rows = compute
    val wallMs = (System.nanoTime() - t0) / 1000000
    writeLineage(stageDir, name, fingerprint, rows, wallMs)
    Files.writeString(Paths.get(stageDir, "_SUCCESS_STAGE"), "")
    Result(name, skipped = false, wallMs)
  }

  private def writeLineage(stageDir: String, name: String, fingerprint: String,
      rows: Long, wallMs: Long): Unit = {
    val dir = Paths.get(stageDir)
    Files.createDirectories(dir)
    val parts = if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .map(p => s"""{"file": "${esc(p.getFileName.toString)}", "bytes": ${Files.size(p)}}""")
        .toSeq.sorted
      finally s.close()
    } else Seq.empty
    val json =
      s"""{
         |  "stage": "${esc(name)}",
         |  "fingerprint": "${esc(fingerprint)}",
         |  "rows": $rows,
         |  "wallMs": $wallMs,
         |  "partitions": [${parts.mkString(", ")}]
         |}""".stripMargin
    Files.writeString(lineagePath(stageDir), json)
  }

  def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
}
