package graft

import org.apache.spark.sql.functions._
import graft.functions.Redaction

/** functions.Redaction on real-shaped PII (the oracle query q81 can only
  * exercise the synthesized shapes both engines can build identically). */
class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("scrubs emails, IPs and phones; ordering keeps classes disjoint") {
    val rows = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk thanks",
      "server at 192.168.001.1 port 8080",
      "call 555-123-4567 now",
      "mixed: a@b.io 10.0.0.1 555-000-1111",
      "clean text with no pii").toDF("t")
    val red = rows.select(Redaction.redactPii(col("t")).as("r")).as[String].collect()
    assert(red(0) == "mail me at [EMAIL] thanks")
    assert(red(1) == "server at [IP] port 8080")
    assert(red(2) == "call [PHONE] now")
    assert(red(3) == "mixed: [EMAIL] [IP] [PHONE]")
    assert(red(4) == "clean text with no pii")
  }

  test("countMatches counts every occurrence") {
    val t = Seq("a@b.co then x@y.org and 1.2.3.4").toDF("t")
    assert(t.select(Redaction.countMatches(col("t"), Redaction.EmailRe))
      .as[Long].head() == 2L)
    assert(t.select(Redaction.countMatches(col("t"), Redaction.Ipv4Re))
      .as[Long].head() == 1L)
    assert(t.select(Redaction.countMatches(col("t"), Redaction.PhoneRe))
      .as[Long].head() == 0L)
  }
}
