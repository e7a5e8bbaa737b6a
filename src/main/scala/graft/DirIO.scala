package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** The one place the directory-stream-hygiene idiom lives: every
  * `Files.list` MUST be closed (the javadoc requires try-with-
  * resources; an unclosed stream leaks a file descriptor until
  * finalization — fatal on per-micro-batch hot paths like TxnLog
  * marker scans and manifest reads). Hand-rolling the try/finally at
  * each call site is exactly how the leak recurred across five files
  * in the first place. */
object DirIO {

  /** Entry names of `dir`, stream closed. */
  def listNames(dir: Path): List[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  /** Entry paths of `dir`, stream closed. */
  def listPaths(dir: Path): List[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toList
    finally s.close()
  }

  /** True when `dir` exists and has at least one entry. */
  def nonEmpty(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.exists(p) && {
      val s = Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
  }

  /** The `<prefix><long>` entries of `dir`, parsed and ascending —
    * the manifest-generation / txn-marker scan every store shares. */
  def numberedEntries(dir: Path, prefix: String): List[Long] =
    if (!Files.exists(dir)) Nil
    else listNames(dir)
      .collect { case n if n.startsWith(prefix) =>
        n.stripPrefix(prefix).toLong }
      .sorted
}
