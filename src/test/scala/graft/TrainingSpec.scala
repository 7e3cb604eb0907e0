package graft

import org.apache.spark.sql.functions._

/** q290's convergence control: the early-stopped driver loop must agree
  * with the full-trail stopping rule (the contract the oracle encodes by
  * unrolling all rounds and selecting the stop), and the loss trail must
  * behave like a loss trail. */
class TrainingSpec extends SparkSpec {
  import graft.queries.TrainPrep

  test("q290: early-stopped loop == full-trail stopping rule, loss monotone") {
    val row = SparkEntry.queries("q290_converged_training")(spark, sf("sf0.001"))
      .head()
    val iters = row.getLong(row.fieldIndex("iters_run"))
    val loss = row.getLong(row.fieldIndex("loss_e9"))
    assert(iters >= 2 && iters <= TrainPrep.ConvergeCap)

    // independent full unroll to the cap with the same helpers
    val base = TrainPrep.trainFeatures(
      spark.read.parquet(s"${sf("sf0.001")}/documents.parquet"))
      .persist()
    var w = spark.range(1)
      .select(lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"))
    val trail = (1 to TrainPrep.ConvergeCap).map { _ =>
      val st = TrainPrep.gdStepLoss(base, w)
      val ml = st.selectExpr("l div n AS ml").head().getLong(0)
      w = TrainPrep.gdNextW(st)
      ml
    }
    base.unpersist()

    // loss starts at ln2 (w=0 -> p=0.5) and strictly improves every round
    assert(math.abs(trail.head - 693147180L) <= 1L, trail.head)
    assert(trail.sliding(2).forall { case Seq(a, b) => b < a }, trail)

    // the stop the rule derives from the FULL trail
    val expected = trail.sliding(2).toSeq.indexWhere {
      case Seq(a, b) => math.abs(a - b) < TrainPrep.ConvergeEpsE9
    } match {
      case -1 => TrainPrep.ConvergeCap
      case i => i + 2 // window i covers rounds (i+1, i+2); stop = later
    }
    assert(iters === expected.toLong)
    assert(loss === trail(expected - 1))
    // the tuned eps genuinely exercises the loop at this SF: past the
    // first checkable round, before the cap
    assert(iters > 2 && iters < TrainPrep.ConvergeCap)
  }
}
