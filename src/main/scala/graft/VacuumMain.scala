package graft

import graft.operators.Vacuum

/** Retention CLI — report (default) or delete orphan data files under a
  * parquet table directory:
  *
  * ```
  * runMain graft.VacuumMain <tableDir> [apply]
  * ```
  *
  * Dry-run by default; `apply` performs the deletes. See
  * [[graft.operators.Vacuum]] for the safety model (the destructive pass
  * re-derives the orphan set from the commit log; plain directories are a
  * no-op by construction).
  */
object VacuumMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VacuumMain <tableDir> [apply]")
    val apply = args.drop(1).contains("apply")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = Vacuum.vacuum(spark, args(0), dryRun = !apply)
    println(s"committed=${st.n_committed} orphans=${st.n_orphans} " +
      s"orphan_bytes=${st.orphan_bytes} mode=${if (apply) "APPLIED" else "dry-run"}")
    st.deleted.foreach(p => println(s"deleted $p"))
    spark.stop()
  }
}
