package graft.operators

import java.io.File

import org.apache.spark.sql.SparkSession

/** Orphan-file cleanup for parquet table directories — the retention half
  * of table maintenance (Compaction rewrites what IS the table; Vacuum
  * removes what is NOT). A streaming parquet sink records committed files
  * in its `_spark_metadata` log; a crashed executor, killed batch, or
  * speculative task can leave data files on disk that the log never
  * committed. Readers (honoring the log) never see them, but they consume
  * space forever and — worse — a NAIVE reader or copy job that lists the
  * directory raw resurrects them as phantom rows.
  *
  * `orphans` = leaf data files on disk minus the files the table's reader
  * actually reads (`df.inputFiles`, which honors the commit log when one
  * exists). On a plain non-streaming directory the two sets coincide and
  * vacuum is a safe no-op by construction — there is no commit truth to
  * diverge from. Deletion is two-phase: `vacuum(dryRun = true)` (the
  * default) only reports; the destructive pass re-derives the orphan set
  * itself, never trusting a caller-supplied list. Content safety is
  * asserted by the spec: the committed read is byte-identical before and
  * after deletion.
  *
  * 100 TB posture: the listing is the only driver-side work (file paths,
  * not data); deletes are per-file and idempotent — a vacuum that dies
  * halfway leaves a directory vacuum can finish later.
  */
object Vacuum {

  final case class VacuumStats(
      n_committed: Long, n_orphans: Long, orphan_bytes: Long,
      deleted: Seq[String])

  private def leafParquet(dir: File): Seq[File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
      kids.filter(f => f.isDirectory && f.getName != "_spark_metadata")
        .flatMap(leafParquet)
  }

  def orphans(spark: SparkSession, dir: String): (Set[String], Seq[File]) = {
    val committed = spark.read.parquet(dir).inputFiles.toSet[String]
      .map(u => new File(new java.net.URI(u)).getCanonicalPath)
    val orphan = leafParquet(new File(dir))
      .filterNot(f => committed.contains(f.getCanonicalPath))
    (committed, orphan)
  }

  def vacuum(spark: SparkSession, dir: String, dryRun: Boolean = true): VacuumStats = {
    val (committed, orphan) = orphans(spark, dir)
    val bytes = orphan.map(_.length()).sum
    val deleted =
      if (dryRun) Seq.empty[String]
      else orphan.filter(_.delete()).map(_.getCanonicalPath)
    VacuumStats(committed.size.toLong, orphan.size.toLong, bytes, deleted)
  }
}
