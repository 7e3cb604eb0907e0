package graft

import org.apache.spark.sql.functions._
import graft.operators.Reconcile

/** The migration-validation job: identical copies must fingerprint equal
  * regardless of row order/partitioning; an injected edit script must be
  * detected table-wise AND classified key-wise with exact counts. */
class ReconcileSpec extends SparkSpec {

  private val dirA = sf("sf0.001")

  private def mkDirB(tmp: String): Unit = {
    // copy a subset of tables; orders gets a deterministic edit script:
    // price +1 cent on keys %50==0 (changed), drop keys %97==0 (removed),
    // mirrored keys %101==0 re-inserted above a shift (added). Repartition
    // shuffles row order/file layout so only content equality can match.
    Seq("nation", "customer", "part").foreach { t =>
      spark.read.parquet(s"$dirA/$t.parquet").repartition(5)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val o = spark.read.parquet(s"$dirA/orders.parquet")
    val edited = o
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 50 === 0, col("o_totalprice") + 0.01)
          .otherwise(col("o_totalprice")))
      .filter(col("o_orderkey") % 97 =!= 0)
      .unionByName(o.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    edited.repartition(7).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
  }

  test("identical tables match, edited orders is flagged and classified exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("reconcile").toString
    mkDirB(tmp)
    val out = s"$tmp/out"
    val reports = ReconcileMain.run(spark, dirA, tmp, out).map(r => r.tbl -> r).toMap
    assert(reports.keySet == Set("nation", "customer", "part", "orders"))
    Seq("nation", "customer", "part").foreach { t =>
      assert(reports(t).matches, s"$t should fingerprint-match its shuffled copy")
      assert(reports(t).n_rows_a == reports(t).n_rows_b)
    }
    assert(!reports("orders").matches, "edited orders must mismatch")

    val o = spark.read.parquet(s"$dirA/orders.parquet")
    val removed = o.filter(col("o_orderkey") % 97 === 0).count()
    val added = o.filter(col("o_orderkey") % 101 === 0).count()
    val changed = o
      .filter(col("o_orderkey") % 50 === 0 && col("o_orderkey") % 97 =!= 0).count()
    val total = o.count()
    assert(removed > 0 && added > 0 && changed > 0, "edit script must be non-trivial")

    val diff = spark.read.parquet(s"$out/diff_orders.parquet").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff.getOrElse("removed", 0L) == removed)
    assert(diff.getOrElse("added", 0L) == added)
    assert(diff.getOrElse("changed", 0L) == changed)
    assert(diff.getOrElse("same", 0L) == total - removed - changed)

    // the written per-table report agrees with the returned one
    val tbl = spark.read.parquet(s"$out/tables.parquet").collect()
      .map(r => r.getString(0) -> r.getBoolean(7)).toMap
    assert(tbl == reports.map { case (k, v) => k -> v.matches })
  }

  test("keyedDiff pre-aggregates: duplicate keys neither fan out nor miscount") {
    // 100 keys; 40 appear 3× on side A and 2× on side B (identical
    // payloads), the rest once each. The naive row-level full outer would
    // fan the drifted keys out to 3·2 rows apiece and call every pairing
    // "same"; the digest form counts one unit per key and classifies
    // multiplicity drift as changed.
    val o = spark.read.parquet(s"$dirA/orders.parquet")
      .orderBy("o_orderkey").limit(100).localCheckpoint(true)
    val dup = o.orderBy("o_orderkey").limit(40).localCheckpoint(true)
    val tripled = o.unionByName(dup).unionByName(dup)
    val doubled = o.unionByName(dup)
    val diff = graft.operators.Reconcile.keyedDiff(tripled, doubled, "o_orderkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff == Map("changed" -> 40L, "same" -> 60L), s"got $diff")
  }

  test("keyedDiff treats NULL keys as a comparable key, not phantom churn") {
    import spark.implicits._
    // identical NULL-keyed payloads on both sides must read "same"; a
    // NULL-keyed payload edit must read "changed" — a plain equi-join
    // reports one added + one removed forever
    val a = Seq((Some(1L), "x"), (None, "p")).toDF("k", "v")
    val sameB = Seq((Some(1L), "x"), (None, "p")).toDF("k", "v")
    val d1 = graft.operators.Reconcile.keyedDiff(a, sameB, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d1 == Map("same" -> 2L), s"got $d1")
    val editB = Seq((Some(1L), "x"), (None, "q")).toDF("k", "v")
    val d2 = graft.operators.Reconcile.keyedDiff(a, editB, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d2 == Map("changed" -> 1L, "same" -> 1L), s"got $d2")
  }

  test("modular checksum folds in decimal: result in range and exact") {
    // the checksum must equal the directly computed modular sum and stay
    // inside [0, 1e8) — the BIGINT-overflow fix routes the fold through
    // DECIMAL(38,0), which this pins behaviorally
    val a = spark.read.parquet(s"$dirA/nation.parquet")
    val Seq(r) = graft.operators.Reconcile.report(Seq(("nation", a, a)))
    assert(r.sum_fp_mod_a == r.sum_fp_mod_b)
    assert(r.sum_fp_mod_a >= 0L && r.sum_fp_mod_a < 100000000L)
    val expected = a
      .select(to_json(struct(a.columns.sorted.map(col): _*)).as("c"))
      .selectExpr("CAST(conv(substring(md5(CAST(c AS BINARY)), 1, 14), 16, 10) AS BIGINT) % 100000000 AS m")
      .collect().map(_.getLong(0)).sum % 100000000L
    assert(r.sum_fp_mod_a == expected)
  }

  test("fingerprint catches an even-multiplicity duplication xor alone misses") {
    val a = spark.read.parquet(s"$dirA/nation.parquet")
    val doubled = a.unionByName(a) // every row twice: xor folds back to equal
    val Seq(r) = Reconcile.report(Seq(("nation", a, doubled)))
    assert(r.xor_fp_a != r.xor_fp_b || r.sum_fp_mod_a != r.sum_fp_mod_b ||
      r.n_rows_a != r.n_rows_b)
    assert(!r.matches)
    // and the modular sum specifically differs even where xor cannot
    assert(r.xor_fp_b != r.xor_fp_a || r.sum_fp_mod_a != r.sum_fp_mod_b)
  }
}
