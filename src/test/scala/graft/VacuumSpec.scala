package graft

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import graft.operators.Vacuum

/** operators/Vacuum: orphan files (on disk, absent from the streaming
  * sink's commit log) are reported by the dry run and removed by the real
  * pass; the committed read is byte-identical throughout; a plain
  * directory is a no-op by construction. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  test("streaming-sink orphans: dry-run reports, vacuum deletes, content intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_vacuum").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v").writeStream
      .format("parquet").option("path", s"$tmp/t")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      for (b <- 0 until 3) {
        in.addData((0 until 100).map(i => (b * 100L + i, s"v$b-$i")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // plant two orphans: copies of a committed file under uncommitted names
    // (exactly what a crashed batch's un-logged task output looks like)
    val dataFile = new File(s"$tmp/t").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val o1 = new File(s"$tmp/t/part-99990-orphan.snappy.parquet")
    val o2 = new File(s"$tmp/t/part-99991-orphan.snappy.parquet")
    Files.copy(dataFile.toPath, o1.toPath, StandardCopyOption.REPLACE_EXISTING)
    Files.copy(dataFile.toPath, o2.toPath, StandardCopyOption.REPLACE_EXISTING)

    val before = spark.read.parquet(s"$tmp/t").orderBy("id").collect().toSeq
    assert(before.size === 300) // the log shields readers from the orphans

    val dry = Vacuum.vacuum(spark, s"$tmp/t") // dryRun default
    assert(dry.n_orphans === 2 && dry.orphan_bytes > 0 && dry.deleted.isEmpty)
    assert(o1.exists() && o2.exists())

    // RETENTION GATE: under the default 7-day window the freshly planted
    // orphans look like a concurrent writer's in-flight output — the
    // destructive pass must report them as retained and delete nothing
    val gated = Vacuum.vacuum(spark, s"$tmp/t", dryRun = false)
    assert(gated.n_orphans === 2 && gated.n_retained === 2 && gated.deleted.isEmpty)
    assert(o1.exists() && o2.exists())

    // retention 0 = "no writers are live, everything uncommitted is junk"
    val real = Vacuum.vacuum(spark, s"$tmp/t", dryRun = false, retentionMs = 0L)
    assert(real.n_orphans === 2 && real.n_retained === 0 && real.deleted.size === 2)
    assert(!o1.exists() && !o2.exists())

    val after = spark.read.parquet(s"$tmp/t").orderBy("id").collect().toSeq
    assert(after === before)
    // idempotent: a second vacuum finds nothing
    assert(Vacuum.vacuum(spark, s"$tmp/t", dryRun = false, retentionMs = 0L).n_orphans === 0)
  }

  test("plain (non-streaming) directory is a safe no-op") {
    val tmp = Files.createTempDirectory("graft_vacuum_plain").toString
    spark.range(100).toDF("id").repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/t")
    val st = Vacuum.vacuum(spark, s"$tmp/t", dryRun = false)
    assert(st.n_orphans === 0 && st.n_committed >= 1)
    assert(spark.read.parquet(s"$tmp/t").count() === 100)
  }
}
