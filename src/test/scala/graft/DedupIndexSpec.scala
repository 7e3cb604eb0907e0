package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.operators.DedupIndex

/** The standing LSH index's lifecycle contract: incremental maintenance
  * must be INVISIBLE — an index built in batches answers probes exactly
  * like one built from scratch, and an optimize rewrite answers exactly
  * like the dir it rewrote. */
class DedupIndexSpec extends SparkSpec with BeforeAndAfterEach {

  private val dir = sf("sf0.001")

  override def afterEach(): Unit = {
    // minhashBase persists MEMORY_AND_DISK inside build/append/probe —
    // keep the shared session's cache flat across suites
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  private def tmp(): String =
    Files.createTempDirectory("graft_dedup_index").toString

  private def probeRows(indexDir: String) = {
    val delta = Tables(spark, dir, "documents").filter(col("doc_id") % 10 === 7)
    DedupIndex.probe(spark, delta, indexDir)
      .collect().map(_.toSeq).sortBy(_.toString)
  }

  test("two-batch incremental index answers exactly like from-scratch") {
    val docs = Tables(spark, dir, "documents")
    val b1 = docs.filter(col("doc_id") % 10 < 5)
    val b2 = docs.filter(col("doc_id") % 10 >= 5 && col("doc_id") % 10 =!= 7)

    val incDir = tmp()
    DedupIndex.build(b1, incDir)
    DedupIndex.append(b2, incDir)

    val fullDir = tmp()
    DedupIndex.build(b1.unionByName(b2), fullDir)

    val inc = probeRows(incDir)
    val full = probeRows(fullDir)
    assert(inc.nonEmpty, "probe found no matches — split constants broke")
    assert(inc.toSeq == full.toSeq)
  }

  test("optimize compacts the appended small files without changing answers") {
    val docs = Tables(spark, dir, "documents")
    val idxDir = tmp()
    DedupIndex.build(docs.filter(col("doc_id") % 10 < 5), idxDir)
    // several small appends — the file-count growth optimize exists to fold
    for (m <- Seq(5, 6, 8, 9))
      DedupIndex.append(docs.filter(col("doc_id") % 10 === m), idxDir)
    val before = probeRows(idxDir)

    val optDir = tmp()
    DedupIndex.optimize(spark, idxDir, optDir)
    val after = probeRows(optDir)
    assert(after.toSeq == before.toSeq)

    def leafParquet(d: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
        else Seq(f)
      walk(new java.io.File(d)).count(_.getName.endsWith(".parquet"))
    }
    assert(leafParquet(optDir) < leafParquet(idxDir),
      s"optimize did not reduce file count: ${leafParquet(idxDir)} -> ${leafParquet(optDir)}")
  }

  test("remove: tombstoned docs stop matching; grown-with-deletes == scratch-on-survivors") {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val idxDir = tmp()
    DedupIndex.build(docs.filter(col("doc_id") % 10 < 5), idxDir)
    DedupIndex.append(docs.filter(col("doc_id") % 10 >= 5 && col("doc_id") % 10 =!= 7), idxDir)

    // take the docs the probe currently matches, and tombstone them
    val victims = probeRows(idxDir).map(_(2).asInstanceOf[Long]).distinct.toSeq
    assert(victims.nonEmpty, "probe found no matches — split constants broke")
    DedupIndex.remove(victims.toDF("doc_id"), idxDir)

    // 1. no tombstoned doc ever appears as a match again
    val after = probeRows(idxDir)
    val matched = after.map(_(2).asInstanceOf[Long]).toSet
    assert(victims.forall(v => !matched.contains(v)),
      s"tombstoned docs still matching: ${victims.filter(matched.contains)}")

    // 2. the tombstoned index answers EXACTLY like one built from the
    // survivors alone (the from-scratch-on-survivors equivalence)
    val survDir = tmp()
    DedupIndex.build(docs
      .filter(col("doc_id") % 10 =!= 7)
      .filter(!col("doc_id").isin(victims: _*)), survDir)
    assert(after.toSeq == probeRows(survDir).toSeq)

    // 3. optimize physically drops tombstoned rows: the generation carries
    // no tombstone table, its sigs lack the victims, answers unchanged
    val optDir = tmp()
    DedupIndex.optimize(spark, idxDir, optDir)
    assert(!new java.io.File(s"$optDir/tombstones").exists())
    val optSigIds = spark.read.parquet(s"$optDir/sigs")
      .select("doc_id").as[Long].collect().toSet
    assert(victims.forall(v => !optSigIds.contains(v)))
    assert(probeRows(optDir).toSeq == after.toSeq)
  }

  test("probe touches only the index, never forms corpus-corpus pairs") {
    // structural: q246's persisted lifecycle must agree with q244's
    // in-query split on the same data — both ride DedupIndex.probeBase
    val q244 = SparkEntry.queries("q244_incremental_neardup")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val q246 = SparkEntry.queries("q246_standing_index")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(q244.toSeq == q246.toSeq)
  }
}
