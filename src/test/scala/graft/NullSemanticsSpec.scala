package graft

import org.apache.spark.sql.functions._

import graft.operators.Audit

/** Property-style tests for the Q1 null-membership semantics (SURVEY.md
  * §7.4.1): `Audit.statusOk` must agree with the reference's Python
  * `x not in [..., None]` membership on every input, including NULL. */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  /** The Python-semantics oracle: `x in ["SUCCESS", None, "CREATED",
    * "UPSTREAM FAILED"]` (app.py:113) — None IS a member. */
  private def pythonOk(x: Option[String]): Boolean = x match {
    case None => true
    case Some(v) => Audit.Whitelist.contains(v)
  }

  test("statusOk matches the Python membership oracle on 500 seeded inputs") {
    val rnd = new scala.util.Random(42)
    val pool: Seq[Option[String]] =
      Seq(None) ++ Audit.Whitelist.map(Some(_)) ++
        Seq("FAILED", "RUNNING", "", "success", "EXPORT FAILED").map(Some(_))
    val xs: Seq[Option[String]] = (1 to 500).map { _ =>
      if (rnd.nextInt(4) == 0) Some(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      else pool(rnd.nextInt(pool.size))
    }
    val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("i", "status")
    val got = df.withColumn("ok", Audit.statusOk(col("status")))
      .orderBy("i").select("ok").as[Boolean].collect().toSeq
    assert(got == xs.map(pythonOk))
  }

  test("naive NOT isin flips semantics for NULL (documenting the trap)") {
    val df = Seq(Option.empty[String]).toDF("status")
    val naive = df.filter(!col("status").isin(Audit.Whitelist: _*)).count()
    assert(naive == 0) // NULL row silently dropped by three-valued logic
    val correct = df.filter(!Audit.statusOk(col("status"))).count()
    assert(correct == 0) // healthy under reference semantics — not dropped, true
    val healthy = df.filter(Audit.statusOk(col("status"))).count()
    assert(healthy == 1)
  }
}
