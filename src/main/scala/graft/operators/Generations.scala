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
  private def logFile(tableDir: String) = new File(tableDir, "GENERATIONS.log")

  /** Atomically point `tableDir`'s CURRENT at `generationPath` (which must
    * exist — publishing a dangling pointer is always a bug). Also appends
    * the publish to `GENERATIONS.log` — the table's lineage, enabling
    * as-of reads ([[resolveAt]]). CURRENT is the single source of truth;
    * the log is advisory history (a crash between the atomic switch and
    * the log append loses only the history line, never the switch). */
  def publish(tableDir: String, generationPath: String): Unit = {
    val gen = new File(generationPath)
    require(gen.isDirectory, s"publish: generation dir missing: $generationPath")
    val dir = new File(tableDir)
    dir.mkdirs()
    val tmp = File.createTempFile(".CURRENT", ".tmp", dir)
    Files.write(tmp.toPath, gen.getCanonicalPath.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, currentFile(tableDir).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val seq = history(tableDir).size + 1
    Files.write(logFile(tableDir).toPath,
      s"$seq\t${gen.getCanonicalPath}\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  /** The publish lineage, oldest first: (seq, generationPath). */
  def history(tableDir: String): Seq[(Int, String)] = {
    val f = logFile(tableDir)
    if (!f.isFile) Seq.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
      .map { l => val Array(s, p) = l.split("\t", 2); (s.toInt, p) }
  }

  /** TIME TRAVEL: the generation path as of the `seq`-th publish. Valid
    * only while retention has kept that generation on disk — a vacuumed
    * generation fails loudly here rather than resolving to a dangling
    * path. */
  def resolveAt(tableDir: String, seq: Int): String = {
    val h = history(tableDir)
    val p = h.find(_._1 == seq).map(_._2).getOrElse(
      sys.error(s"no publish #$seq under $tableDir (history has ${h.size})"))
    require(new File(p).isDirectory,
      s"generation #$seq at $p no longer on disk (vacuumed?)")
    p
  }

  /** RETENTION: delete generation directories superseded by later
    * publishes. The last `keepLast` publishes and CURRENT's target are
    * always kept; older generations are deleted only when nothing inside
    * them was modified within `retentionHours` (the [[Vacuum]] age-gate
    * convention — an in-flight reader that resolved CURRENT just before a
    * rapid publish chain keeps its snapshot on disk for the window).
    * History lines are preserved, so a later [[resolveAt]] on a retired
    * seq fails loudly with the vacuumed diagnostic instead of silently
    * forgetting the publish ever happened. Returns the retired paths. */
  def retire(tableDir: String, keepLast: Int = 2,
             retentionHours: Double = 168.0): Seq[String] = {
    require(keepLast >= 1, "retire: keepLast must be >= 1")
    val h = history(tableDir)
    val keepSeqs = h.takeRight(keepLast).map(_._1).toSet
    val keepPaths = h.filter(e => keepSeqs(e._1)).map(_._2).toSet ++
      current(tableDir).map(new File(_).getCanonicalPath)
    val cutoff = System.currentTimeMillis - (retentionHours * 3600 * 1000).toLong
    def newestMtime(f: File): Long =
      if (f.isDirectory) (f.lastModified +: f.listFiles.toSeq.map(newestMtime)).max
      else f.lastModified
    def deleteTree(f: File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(deleteTree)
      f.delete(); ()
    }
    h.map(_._2).distinct
      .filterNot(keepPaths)
      .filter(p => new File(p).isDirectory && newestMtime(new File(p)) < cutoff)
      .map { p => deleteTree(new File(p)); p }
  }

  /** Shared CLI handling for the lineage verbs — `resolve <tableDir>
    * [seq]`, `history <tableDir>`, `retire <tableDir> [keepLast]
    * [retentionHours]` — so every standing-table Main exposes the same
    * surface without duplicating it. `args` is the full argv (verb
    * first). */
  def cliLineage(cmd: String, args: Array[String]): Unit = cmd match {
    case "resolve" =>
      // bare: the CURRENT generation; with a seq argument: the as-of
      // read from the publish lineage (time travel while retained)
      if (args.length >= 3) println(resolveAt(args(1), args(2).toInt))
      else println(resolve(args(1)))
    case "history" =>
      history(args(1)).foreach { case (seq, p) => println(s"$seq\t$p") }
    case "retire" =>
      val keep = if (args.length >= 3) args(2).toInt else 2
      val hours = if (args.length >= 4) args(3).toDouble else 168.0
      val gone = retire(args(1), keep, hours)
      gone.foreach(p => println(s"retired\t$p"))
      println(s"${gone.size} generation(s) retired under ${args(1)}")
    case other => sys.error(s"not a lineage verb: $other")
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
