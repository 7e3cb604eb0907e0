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

  test("parquet schema evolution: mergeSchema unifies old and new batches") {
    import spark.implicits._
    val path = tmp("merge_schema")
    // batch 1 ships without the column a later producer adds
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path + "/d=1")
    Seq((3L, "c", 9L), (4L, "d", 8L)).toDF("id", "v", "extra")
      .write.parquet(path + "/d=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("id", "v", "extra", "d"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    // old rows surface the new column as null, new rows carry it
    assert(rows(0).isNullAt(rows(0).fieldIndex("extra")))
    assert(rows(2).getLong(rows(2).fieldIndex("extra")) == 9L)
  }

  test("CSV corrupt records are captured, not dropped or fatal (PERMISSIVE)") {
    val path = tmp("corrupt_csv")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part.csv"),
      "1,alpha,10\n2,beta,not_a_number\n3,gamma,30\n")
    val schema = "id LONG, name STRING, qty LONG, _corrupt STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
      .cache() // corrupt-column access requires the full row to be retained
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getString(1) == "beta")
    assert(df.filter(col("_corrupt").isNull).count() == 2)
    df.unpersist()
  }
}
