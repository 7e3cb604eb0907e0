package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage spill ledger for the EXACT prefix join (q220/q289) —
  * the one operator that spills at the 100x scale tier. The r14 shard
  * matrix measured TOTAL spill byte-identical at 4/8/16 shards, which
  * proves the spill does NOT live in the shard-partitioned candidate
  * stage; this main attributes it to the actual stage so the scale
  * design targets the right shuffle.
  *
  * ```
  * runMain graft.SpillProbeMain <sfDir> <outJsonl> [stages]
  * ```
  *
  * Stages (cumulative prefixes of the q220 pipeline, each run as its own
  * job with cleared caches and zeroed counters):
  *   base     minhashBase only (shingle hashing, no shuffle)
  *   prefix   + prefixRows (token freq agg + join + per-doc rank window)
  *   keyed    + the h-partitioned window count
  *   cand     + candidate pair generation + global dropDuplicates
  *   full     + the verify join (= q220 exactly)
  */
object SpillProbeMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpillProbeMain <sfDir> <outJsonl> [stages]")
    val dir = args(0)
    val outPath = args(1)
    val only = Bench.parseOnly(args.lift(2))
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new java.util.concurrent.atomic.AtomicLong()
    val diskSpill = new java.util.concurrent.atomic.AtomicLong()
    val peakTask = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakTask.getAndAccumulate(m.peakExecutionMemory, Math.max); ()
        }
    })

    import queries.Dedup
    def docs = Tables(spark, dir, "documents")
    // each stage builds its OWN base (cleared between stages) so a
    // stage's number includes everything q220 pays up to that point
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "base" -> (() => Dedup.minhashBase(docs)),
      "prefix" -> (() => Dedup.prefixRows(Dedup.minhashBase(docs))),
      "keyed" -> (() => {
        import org.apache.spark.sql.expressions.Window
        Dedup.prefixRows(Dedup.minhashBase(docs))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      }),
      "cand" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val keyed = Dedup.prefixRows(Dedup.minhashBase(docs))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        Dedup.prefixCandidates(keyed).dropDuplicates("d1", "d2")
      }),
      "full" -> (() => {
        val base = Dedup.minhashBase(docs)
        Dedup.prefixPairs(base)
      }))

    val lines = stages.filter(s => only.forall(_.contains(s._1))).map {
      case (name, fn) =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        memSpill.set(0L); diskSpill.set(0L); peakTask.set(0L)
        val t0 = System.nanoTime()
        val ok = scala.util.Try(
          fn().write.format("noop").mode("overwrite").save()).isSuccess
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.drain(spark)
        val l = s"""{"stage":"$name","ok":$ok,"wall_sec":$wall,""" +
          s""""spill_mem_bytes":${memSpill.get},"spill_disk_bytes":${diskSpill.get},""" +
          s""""peak_task_mem_bytes":${peakTask.get}}"""
        println(l)
        l
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outPath")
    spark.stop()
  }
}
