package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth: CSV (schema'd + header), ORC and JSON
  * round-trips preserve rows and types; compression options apply. The
  * engine's primary format is parquet (exercised by every oracle query);
  * these cover the rest of the built-in batch I/O surface a user of the
  * reference would reach for. */
class FormatsSpec extends SparkSpec {

  private def sample = Tables(spark, sf("sf0.001"), "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    .orderBy("o_orderkey").limit(200)

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$name").toString + "/out"

  test("CSV round-trip with declared schema and header") {
    val path = tmp("csv")
    sample.write.option("header", "true").option("compression", "gzip").csv(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", DateType)))
    val back = spark.read.option("header", "true").schema(schema).csv(path)
    assert(back.schema == schema)
    assert(back.exceptAll(sample).count() == 0 && sample.exceptAll(back).count() == 0)
  }

  test("ORC round-trip preserves types exactly") {
    val path = tmp("orc")
    sample.write.option("compression", "zstd").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(sample).count() == 0 && sample.exceptAll(back).count() == 0)
  }

  test("JSON round-trip with declared schema (dates as strings on disk)") {
    val path = tmp("json")
    sample.write.json(path)
    val back = spark.read.schema(sample.schema).json(path)
    assert(back.exceptAll(sample).count() == 0 && sample.exceptAll(back).count() == 0)
  }

  test("ORC scan gets predicate pushdown like parquet") {
    val path = tmp("orc_pd")
    sample.write.orc(path)
    val scan = spark.read.orc(path).filter(col("o_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]"),
      s"no ORC pushdown:\n$scan")
  }
}
