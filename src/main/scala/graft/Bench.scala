package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1). A single warmup action initializes
  * the parquet reader + codegen paths so per-query numbers reflect steady
  * state rather than first-touch JIT.
  *
  * Each query is driven by a `noop`-format write, not `.count()`: a count
  * lets Catalyst prune computed columns out of the plan, so scalar
  * pipelines (tokenize/quality/langid/...) would be measured pruned. The
  * noop sink materializes every output row (VERDICT r1 "What's wrong" #3).
  *
  * Steady-state methodology (JMH-style): each query runs once untimed —
  * paying whole-stage-codegen compilation and JIT warm-up, a per-query
  * fixed cost that is noise at sf0.1 but irrelevant at the 100 TB design
  * point — then all persisted intermediates are dropped (clearCache) so the
  * timed runs re-execute the COMPLETE pipeline, including repopulating any
  * cache the query itself builds (e.g. q37's minhash base table). The
  * reported number is the MIN of two timed runs (clearCache before each):
  * single-sample local[32] timings vary ±30% with GC/AQE scheduling, and
  * min-of-2 is the standard noise floor estimator.
  *
  * The JSON line is printed to stdout AND written to /tmp/bench.json so the
  * driver can machine-parse it without scraping sbt's [info] decoration
  * (VERDICT r1 "What's wrong" #2).
  */
object Bench {
  /** SPARK_GRAFT_ONLY parsing, extracted for the spec: a blank or
    * whitespace-only value means "unset" (run everything), never "select
    * zero queries silently". */
  def parseOnly(raw: Option[String]): Option[Set[String]] =
    raw.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").count() // warmup
    // SPARK_GRAFT_ONLY=q101_pagerank,q102_triangles reruns a subset in the
    // same sweep harness — for isolating cross-query interactions that
    // single-query ExplainMain runs can't reproduce.
    val only = parseOnly(sys.env.get("SPARK_GRAFT_ONLY"))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      var failed = false
      def run(): Unit =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable => // visible, never silent-zero a timing
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      run() // steady-state warmup: codegen compile + JIT
      val timed = (1 to 2).map { _ =>
        spark.catalog.clearCache() // timed runs must rebuild query-owned caches
        // localCheckpoint blocks from earlier queries are only released when
        // their RDD objects are garbage-collected and the ContextCleaner
        // processes the reference queue. Left alone, ~15 checkpointing
        // queries pile blocks into the unified memory manager until
        // mid-sweep queries measure storage eviction + shuffle spill instead
        // of their own plan (q102 read 100s in a 167-query sweep vs 3.6s
        // clean; q37 read 33s in a 200-query sweep vs 2.7s). GC + cleaner
        // alone proved insufficient at 200 queries — drop every leftover
        // RDD-level persist eagerly (clearCache only covers Dataset-level
        // caches; prior queries' checkpoint blocks are never re-read, so
        // unpersisting them is safe).
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not fold its time-to-failure into the JSON as
      // if it were a fast success — record it in "errors" instead
      name -> (if (failed) None else Some(timed.min))
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val errors = results.collect { case (k, None) => k }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // The full line is ~10 KB at 200 queries; a log-tail capture (last ~2000
    // chars) would cut off the leading total. Repeat the headline metrics in
    // a short trailer line so any suffix of the output still carries them.
    println(s"""{"metric":"total_trailer","value":$total,"unit":"sec","n_queries":${ok.size},"n_errors":${errors.size},"sf":"$sfDir","full":"/tmp/bench.json"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
