package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Atomic CURRENT pointer for generational tables — the publish step that
  * closes the standing-state lifecycle (DedupIndex / AnnIndex / AggState
  * all `optimize` into a NEW directory so readers are never mid-rewrite;
  * something must then switch readers over, atomically).
  *
  * The protocol is the classic metadata-pointer design: the table's
  * identity is a tiny `CURRENT` file naming the active generation
  * directory; `publish` writes a temp file and atomically renames it over
  * `CURRENT`, so a reader resolves either the old generation or the new
  * one — never a torn path, never a half-compacted view. Old generations
  * stay on disk for in-flight readers until retention removes them.
  *
  * Filesystem-native on purpose: at cluster scale the same two calls run
  * against any store with atomic rename (HDFS rename, or a conditional
  * put on object stores).
  */
object Generations {

  private def currentFile(tableDir: String) = new File(tableDir, "CURRENT")

  /** Atomically point `tableDir`'s CURRENT at `generationPath` (which must
    * exist — publishing a dangling pointer is always a bug). */
  def publish(tableDir: String, generationPath: String): Unit = {
    val gen = new File(generationPath)
    require(gen.isDirectory, s"publish: generation dir missing: $generationPath")
    val dir = new File(tableDir)
    dir.mkdirs()
    val tmp = File.createTempFile(".CURRENT", ".tmp", dir)
    Files.write(tmp.toPath, gen.getCanonicalPath.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, currentFile(tableDir).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The active generation path, if a CURRENT pointer exists. */
  def current(tableDir: String): Option[String] = {
    val f = currentFile(tableDir)
    if (!f.isFile) None
    else Some(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim)
  }

  /** The active generation path; fails loudly when the table was never
    * published (reading an unpublished generational table is a bug, not a
    * default). */
  def resolve(tableDir: String): String =
    current(tableDir).getOrElse(
      sys.error(s"no CURRENT generation published under $tableDir"))
}
