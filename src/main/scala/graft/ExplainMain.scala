package graft

/** Dev helper: print formatted plans (and optionally time) for named
  * queries — `runMain graft.ExplainMain q04_order_priority [sfDir]`. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some(name) =>
        val df = SparkEntry.queries(name)(spark, dir)
        df.explain("formatted")
        val t0 = System.nanoTime()
        val n = df.count()
        println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
        val t1 = System.nanoTime()
        df.count()
        println(s"second run: ${(System.nanoTime() - t1) / 1e9}s")
      case None => println("usage: ExplainMain <query> [sfDir]")
    }
    spark.stop()
  }
}
