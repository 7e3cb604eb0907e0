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

  /** ## Writer concurrency contract — SINGLE WRITER per state dir
    *
    * Every standing table (DedupIndex / AnnIndex / AggState / ViewState /
    * ClusterState) assumes ONE writer at a time per state directory:
    *
    *  - blind appends commute with EACH OTHER (parquet file adds under
    *    distinct names), so two appenders usually survive by luck — but
    *    nothing orders them against a rewrite;
    *  - `optimize` reads a listing of the source generation and rewrites
    *    it into a NEW directory: an append landing after the listing is
    *    NOT in the rewrite, and the subsequent `publish` switches readers
    *    to a generation that silently lost it (the in-rewrite window is
    *    caught by the fingerprint gate, which re-lists the source at
    *    validation — the validate-to-publish window is not);
    *  - `publish`'s CURRENT switch is atomic for READERS, not an ordering
    *    for writers; `retire` deletes directories a racing writer may be
    *    appending into.
    *
    * [[withWriterLock]] turns the assumption into a best-effort guard: a
    * lock FILE created atomically in the state dir, held for the span of
    * a mutation, with stale-expiry so a crashed writer cannot wedge the
    * table forever. The CLIs (`*Main`) take it around every mutating
    * verb, and the streaming maintenance loops take it per batch. It is
    * advisory — a writer that bypasses the lock is not stopped (the
    * filesystem cannot do that portably) — but any two cooperating
    * writers serialize or fail loudly instead of losing data. */
  private val LockName = ".WRITER_LOCK"

  /** Run `body` holding the writer lock of `stateDir`. Throws
    * `IllegalStateException` if another live writer holds it; a lock
    * older than `staleMs` (default 30 min — longer than any single
    * mutation at sane scale, tune up for huge optimizes) is presumed
    * crashed and broken with a stderr note. NOT reentrant: one lock
    * scope per mutation, operators below the CLI layer never lock. */
  def withWriterLock[T](stateDir: String,
      staleMs: Long = 30L * 60 * 1000)(body: => T): T = {
    val dir = new File(stateDir)
    dir.mkdirs()
    val lock = new File(dir, LockName)
    def tryAcquire(): Boolean =
      try {
        Files.createFile(lock.toPath)
        Files.write(lock.toPath,
          s"pid=${ProcessHandle.current.pid} ts=${System.currentTimeMillis}\n"
            .getBytes(StandardCharsets.UTF_8))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!tryAcquire()) {
      val age = System.currentTimeMillis - lock.lastModified
      if (lock.isFile && age > staleMs) {
        System.err.println(s"withWriterLock: breaking stale lock $lock " +
          s"(age ${age / 1000}s > ${staleMs / 1000}s)")
        Files.deleteIfExists(lock.toPath)
        if (!tryAcquire())
          throw new IllegalStateException(
            s"writer lock contended while breaking stale lock: $lock")
      } else {
        val holder = scala.util.Try(new String(
          Files.readAllBytes(lock.toPath), StandardCharsets.UTF_8).trim)
          .getOrElse("(unreadable)")
        throw new IllegalStateException(
          s"another writer holds $lock [$holder] — standing tables are " +
            "single-writer; retry after it finishes (or after stale expiry)")
      }
    }
    try body finally { Files.deleteIfExists(lock.toPath); () }
  }

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
