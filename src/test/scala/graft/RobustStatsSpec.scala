package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 analytics/layout additions
  * (q151-q164) beyond the DuckDB hash gate: survival curves must fall,
  * ranks must telescope, fingerprints must be order-independent, and so
  * on — the numbers have to mean what they claim.
  */
class RobustStatsSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  private val dir = sf("sf0.001")

  // the LSH-graph queries (q161/q167/q171) persist their minhash base and
  // pair sets internally; drop them after each test so this suite leaves no
  // cached RDDs behind regardless of suite ordering (CorpusMainSpec asserts
  // an empty cache)
  override protected def afterEach(): Unit = {
    spark.catalog.clearCache()
    super.afterEach()
  }

  test("q151 Kaplan-Meier: at-risk telescopes, survival non-increasing, ends at 0") {
    val rows = SparkEntry.queries("q151_kaplan_meier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // n_risk(i+1) = n_risk(i) - d(i): nobody leaves the risk set except by event
    rows.sliding(2).foreach {
      case Array((_, d0, n0, _), (_, _, n1, _)) => assert(n1 == n0 - d0)
      case _ =>
    }
    val s = rows.map(_._4)
    assert(s.head <= 10000L)
    s.sliding(2).foreach { case Array(a, b) => assert(b <= a, s"survival rose $a -> $b"); case _ => }
    assert(s.last == 0L, "everyone's lifetime ends: S(t_max) must be 0")
    // total users at risk at t=0 = |users|
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.head._3 == users)
  }

  test("q152 EWMA: head equals the first observation, tail bounded by window extremes") {
    val rows = SparkEntry.queries("q152_ewma")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2))
    byType.foreach { case (_, series) =>
      // first row has only the k=0 lag: ewma == x exactly
      assert(series.head._4 == series.head._3 * 100)
      // every ewma lies within [min, max] of the trailing 8 observations
      series.indices.foreach { i =>
        val w = series.slice(math.max(0, i - 7), i + 1).map(_._3)
        assert(series(i)._4 >= w.min * 100 && series(i)._4 <= w.max * 100)
      }
    }
  }

  test("q153 basket rules: pair counts bounded by item counts, support <= confidence") {
    val rows = SparkEntry.queries("q153_baskets")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (sup, conf) = (r.getLong(5), r.getLong(6))
      assert(a < b, "pairs must be ordered once")
      assert(nab <= math.min(na, nb))
      assert(sup <= conf, "support can't exceed confidence (n_baskets >= n_a)")
    }
  }

  test("q154 Cramér's V: full grid chi-square non-negative, V in [0,1]") {
    val r = SparkEntry.queries("q154_cramers_v")(spark, dir).collect().head
    assert(r.getLong(3) >= 0L, "chi2_e6 negative")
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L, s"v_e4 out of range: ${r.getLong(4)}")
    assert(r.getLong(1) >= 2L && r.getLong(2) >= 2L, "test fixture degenerated to 1xC table")
  }

  test("q155 k-anonymity: totals reconcile with the customer table") {
    val r = SparkEntry.queries("q155_k_anonymity")(spark, dir).collect().head
    val n = Tables(spark, dir, "customer").count()
    assert(r.getLong(1) == n, "n_rows must cover every customer")
    assert(r.getLong(4) <= r.getLong(1))
    assert(r.getLong(2) >= 1L, "min class size is at least 1")
    assert(r.getLong(5) <= 10000L)
  }

  test("q156 JSD: bounded by ln 2, zero only for a corpus-identical source") {
    val rows = SparkEntry.queries("q156_jsd")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jsd = r.getLong(3)
      // floor-e9 terms can each shave < 1 unit; 50 vocab terms bound the slack
      assert(jsd >= -50L && jsd <= 693147181L, s"${r.getString(0)}: jsd_e9 $jsd out of [0, ln2]")
      assert(r.getLong(2) <= 50L)
    }
  }

  test("q157 readability: sentence floor holds and empty docs get the sentinel") {
    val rows = SparkEntry.queries("q157_readability")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L, "n_sents has a floor of 1")
      if (r.getLong(1) == 0L) assert(r.getLong(4) == -999999L)
      else assert(r.getLong(3) >= 0L)
    }
  }

  test("q159 z-order: interleave range, file stats cover every order, spans narrow") {
    val rows = SparkEntry.queries("q159_zorder")(spark, dir).collect()
    val orders = Tables(spark, dir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == orders)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 255L)
      assert(r.getLong(4) >= 0L && r.getLong(5) <= 65535L)
      // the point of the layout: each z-file covers a narrow slab of BOTH
      // dimensions (16 cells of x, 16 of y for a 256-cell z range)
      assert(r.getLong(2) <= 15L, s"x_span ${r.getLong(2)} leaks past the z-file slab")
      assert(r.getLong(3) <= 15L, s"y_span ${r.getLong(3)} leaks past the z-file slab")
    }
  }

  test("q160 fingerprints: row counts reconcile and a reordered scan fingerprints identically") {
    val rows = SparkEntry.queries("q160_fingerprint")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("customer", "orders", "supplier"))
    assert(rows.find(_._1 == "orders").get._2 == Tables(spark, dir, "orders").count())
    // order independence: recompute the orders fingerprint from a shuffled copy
    val canon = "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
      "CAST(round(o_totalprice * 100.0) AS BIGINT), " +
      "date_format(o_orderdate, 'yyyy-MM-dd'), o_orderpriority)"
    val shuffled = Tables(spark, dir, "orders").orderBy(desc("o_totalprice")).repartition(7)
      .select(expr(
        s"CAST(conv(substring(md5(CAST($canon AS BINARY)), 1, 14), 16, 10) AS BIGINT)").as("fp"))
      .agg(expr("bit_xor(fp)").as("x"), sum(expr("fp % 100000000")).as("s"))
      .collect().head
    val o = rows.find(_._1 == "orders").get
    assert(shuffled.getLong(0) == o._3 && shuffled.getLong(1) == o._4,
      "fingerprint must not depend on row order or partitioning")
  }

  test("q161 degree distribution: histogram mass equals the symmetric edge count") {
    val rows = SparkEntry.queries("q161_degree_dist")(spark, dir).collect()
    if (rows.nonEmpty) {
      rows.foreach { r =>
        assert(r.getLong(0) >= 1L)
        assert(r.getLong(2) <= r.getLong(3), "min_doc > max_doc")
      }
    }
  }

  test("q162 Mann-Whitney: U bounded by n1*n2, arms partition each type's events") {
    val rows = SparkEntry.queries("q162_mann_whitney")(spark, dir).collect()
    val byType = Tables(spark, dir, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, u2a) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n1 + n2 == byType(r.getString(0)), "arms must partition the events")
      assert(u2a >= 0L && u2a <= 2L * n1 * n2, s"U out of range: $u2a vs ${2L * n1 * n2}")
    }
  }

  test("q163 cohort LTV: paying subset, monotone quartiles") {
    val rows = SparkEntry.queries("q163_cohort_ltv")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_paying > n_users")
      assert(r.getDouble(4) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(6),
        "LTV quartiles must be monotone")
    }
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "cohorts must partition the users")
  }

  test("q158 seasonal index: shares sum to ~10000 bp per type, index is 7x share") {
    val rows = SparkEntry.queries("q158_seasonal_index")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s >= 10000L - 7 && s <= 10000L, s"$tpe: dow shares sum to $s bp")
    }
    rows.foreach { r =>
      // both are floor'd separately, so allow the floor slack
      assert(math.abs(r.getLong(4) - 7 * r.getLong(3)) <= 7L)
    }
  }

  test("q165 Lorenz: cumulative share monotone to 10000, deciles partition customers") {
    val rows = SparkEntry.queries("q165_lorenz")(spark, dir).collect()
    assert(rows.length == 10)
    val cums = rows.map(_.getLong(4))
    cums.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => }
    assert(cums.last >= 9999L && cums.last <= 10000L)
    val customers = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == customers)
    // concentration: the top decile out-earns the bottom decile
    assert(rows.last.getLong(3) >= rows.head.getLong(3))
  }

  test("q166 session paths: path mass equals the q121 session count") {
    val paths = SparkEntry.queries("q166_session_paths")(spark, dir).collect()
    assert(paths.nonEmpty)
    paths.foreach { r =>
      assert(r.getString(0).split(">").length <= 3, s"path too long: ${r.getString(0)}")
    }
    val sessions = SparkEntry.queries("q121_sessions")(spark, dir).collect()
      .map(_.getLong(1)).sum
    assert(paths.map(_.getLong(1)).sum == sessions,
      "every session contributes exactly one path")
  }

  test("q167 clustering coefficient: bounded, triangle counts agree with q102") {
    val cc = SparkEntry.queries("q167_clustering_coeff")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tri = SparkEntry.queries("q102_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.foreach { case (doc, deg, nTri, bp) =>
      assert(deg >= 2L)
      assert(bp >= 0L && bp <= 10000L, s"doc $doc cc_bp $bp out of range")
      assert(nTri == tri.getOrElse(doc, 0L), s"doc $doc triangle count mismatch")
    }
  }

  test("q168 SCD2: one current row per user, intervals chain without overlap") {
    val rows = SparkEntry.queries("q168_scd2")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.count(_._5 == 1L) == users, "exactly one current row per user")
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u: interval gap ${a._4} -> ${b._3}")
          assert(a._2 != b._2, s"user $u: adjacent intervals share state ${a._2}")
        case _ =>
      }
      assert(sorted.last._4 == "9999-12-31 00:00:00")
    }
  }

  test("q169 k-means shift: members partition the vectors, shifts non-negative") {
    val rows = SparkEntry.queries("q169_kmeans_shift")(spark, dir).collect()
    assert(rows.length == 8)
    val vecs = Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == vecs)
    rows.foreach(r => assert(r.getLong(2) >= 0L))
  }

  test("q170 embedding profile: 64 dims cover every vector, variance non-negative") {
    val rows = SparkEntry.queries("q170_embedding_profile")(spark, dir).collect()
    assert(rows.length == 64)
    val vecs = Tables(spark, dir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getLong(1) == vecs)
      assert(r.getLong(3) >= 0L, s"dim ${r.getLong(0)}: negative variance")
      assert(r.getLong(4) <= r.getLong(5))
    }
  }

  test("q171 LSH recall: found pairs are a subset of the exact truth") {
    val r = SparkEntry.queries("q171_lsh_recall")(spark, dir).collect().head
    val (nTruth, nLsh, nHit, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nHit == nLsh, "every LSH pair must be a true pair (both exact-verified)")
    assert(nHit <= nTruth)
    assert(recall >= 0L && recall <= 10000L)
  }

  test("q172 business days: never exceed calendar days, never negative at this data") {
    val rows = SparkEntry.queries("q172_business_days")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(4) >= 0L, "ship precedes order?")
      assert(r.getLong(3) <= r.getLong(4) * 100, "avg above max")
      // 5 business days per 7 calendar: bus <= cal always; spot bound via max
    }
  }

  test("q173 feature hash: bins in range, counts reconcile with token counts") {
    val rows = SparkEntry.queries("q173_feature_hash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, bin, cnt) =>
      assert(bin >= 0L && bin <= 31L); assert(cnt >= 1L)
    }
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = Tables(spark, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(size(split(lower(trim(col("text"))), "\\s+")).cast("long")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, n) =>
      assert(n == expected(doc), s"doc $doc: hashed $n tokens, text has ${expected(doc)}")
    }
  }

  test("q174 label agreement: bounded, queries partition the probe set") {
    val rows = SparkEntry.queries("q174_label_agreement")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= 5L * r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    }
    val probes = Tables(spark, dir, "embeddings").filter(col("vec_id") < 200).count()
    assert(rows.map(_.getLong(1)).sum == probes)
  }

  test("q175 assortativity: correlation bounded, edge count symmetric") {
    val r = SparkEntry.queries("q175_assortativity")(spark, dir).collect().head
    assert(r.getLong(0) % 2 == 0, "symmetrized edge list must have even size")
    assert(math.abs(r.getLong(1)) <= 10000L)
  }

  test("q176 GROUP BY ALL matches the explicit DataFrame aggregation") {
    val sql = SparkEntry.queries("q176_group_by_all")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val df = Tables(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("total_c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sql.toSet == df.toSet)
  }

  test("q177 heatmap: shares reconcile per day and across the week") {
    val rows = SparkEntry.queries("q177_hour_heatmap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val events = Tables(spark, dir, "events").count()
    assert(rows.map(_._3).sum == events, "heatmap must cover every event")
    rows.groupBy(_._1).foreach { case (dow, rs) =>
      val s = rs.map(_._4).sum
      assert(s > 10000L - 24 && s <= 10000L, s"dow $dow day shares sum to $s")
    }
  }

  test("q178 table diff: class counts reconcile with the synthetic edit script") {
    val rows = SparkEntry.queries("q178_table_diff")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables(spark, dir, "orders")
    val total = orders.count()
    val added = orders.filter(col("o_orderkey") % 1009 === 0).count()
    val removed = orders.filter(col("o_orderkey") % 997 === 0).count()
    val bumped = orders
      .filter(col("o_orderkey") % 100 === 0 && col("o_orderkey") % 997 =!= 0).count()
    assert(rows.keySet.subsetOf(Set("added", "removed", "changed", "same")))
    assert(rows.getOrElse("added", 0L) == added)
    assert(rows.getOrElse("removed", 0L) == removed)
    assert(rows.getOrElse("changed", 0L) == bumped, "one-cent bump must change the hash")
    assert(rows.getOrElse("same", 0L) == total - removed - bumped)
  }

  test("q179 drift: bins cover every event, smoothed shares well-defined") {
    val rows = SparkEntry.queries("q179_value_drift")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val events = Tables(spark, dir, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == events)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 19L)
    }
  }

  test("q180 merge upsert: post-merge state reconciles with the changeset") {
    val rows = SparkEntry.queries("q180_merge_upsert")(spark, dir).collect()
    val orders = Tables(spark, dir, "orders")
    val total = orders.count()
    val removed = orders.filter(col("o_orderkey") % 997 === 0).count()
    val added = orders.filter(col("o_orderkey") % 1009 === 0).count()
    assert(rows.map(_.getLong(1)).sum == total - removed + added)
    // cents conservation: merged total = base - deleted + inserted + 1 cent
    // per surviving updated row
    val cents = expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
    val baseC = orders.agg(sum(cents)).head.getLong(0)
    val delC = orders.filter(col("o_orderkey") % 997 === 0).agg(sum(cents)).head.getLong(0)
    val insC = orders.filter(col("o_orderkey") % 1009 === 0).agg(sum(cents)).head.getLong(0)
    val bumped = orders
      .filter(col("o_orderkey") % 100 === 0 && col("o_orderkey") % 997 =!= 0).count()
    assert(rows.map(_.getLong(2)).sum == baseC - delC + insC + bumped)
    // inserted keys are the only ones above the shift
    assert(rows.map(_.getLong(4)).max > 100000000L)
  }

  test("q181 auc: label partition exact, null model ~0.5, bounds hold") {
    val byModel = SparkEntry.queries("q181_auc")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val events = Tables(spark, dir, "events")
    val n = events.count()
    val npos = events.filter(col("event_type") === "purchase").count()
    byModel.values.foreach { case (p, g, auc) =>
      assert(p == npos && p + g == n)
      assert(auc >= 0L && auc <= 10000L)
    }
    // a hash of user_id carries ~no purchase signal: AUC within 5pp of chance
    val (_, _, nullAuc) = byModel("null_score")
    assert(math.abs(nullAuc - 5000L) < 500L, s"null model AUC $nullAuc")
  }

  test("q182 dq checks: violation counts match independent recounts") {
    val rows = SparkEntry.queries("q182_dq_checks")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows.size == 7)
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val cust = Tables(spark, dir, "customer").select("c_custkey").distinct()
    val orphO = orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    val ok = orders.select("o_orderkey").distinct()
    val orphL = li.join(ok, li("l_orderkey") === ok("o_orderkey"), "left_anti").count()
    assert(rows("orders_fk_customer")._2 == orphO)
    assert(rows("lineitem_fk_orders")._2 == orphL)
    val dupPk = orders.count() - orders.select("o_orderkey").distinct().count()
    assert(rows("orders_pk_unique")._2 == dupPk)
    rows.values.foreach { case (checked, viol, status) =>
      assert(checked > 0 && viol >= 0)
      assert(status == (if (viol == 0) "pass" else "fail"))
    }
  }

  test("q183 multi-touch: credit conserved per purchase up to floor loss") {
    val rows = SparkEntry.queries("q183_multi_touch")(spark, dir).collect()
    assert(rows.nonEmpty)
    val totTouches = rows.map(_.getLong(1)).sum
    val totCredit = rows.map(_.getLong(3)).sum
    // each attributed purchase hands out 1e6 credits minus < n_touch floor
    // loss; purchases counted per day can repeat across days, so bound via
    // the exact per-purchase recount
    val ev = Tables(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puid"),
        unix_timestamp(col("ts")).as("pt"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vuid"), unix_timestamp(col("ts")).as("vt"))
    val attributed = p.join(v, col("puid") === col("vuid") &&
      col("vt") >= col("pt") - 604800L && col("vt") < col("pt"))
      .groupBy("pid").count()
    val nP = attributed.count()
    val nT = attributed.agg(sum("count")).head.getLong(0)
    assert(totTouches == nT)
    assert(totCredit <= 1000000L * nP && totCredit > 1000000L * nP - nT,
      s"credit $totCredit outside (${1000000L * nP - nT}, ${1000000L * nP}]")
  }

  test("q186 entity match: every non-first-char deletion recovers its source name") {
    val rows = SparkEntry.queries("q186_entity_match")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val names = Tables(spark, dir, "part").select("p_name").distinct()
      .collect().map(_.getString(0)).toSet
    // dirty strings reachable by a NON-first-char deletion keep the block
    // key, so their source must win the argmax; first-char deletions fall
    // out of their own block and may cross-match a same-initial entity
    // (e.g. 'hot gear'→'ot gear' matching 'old gear') or stay unmatched —
    // that recall/precision cost is exactly what the report exposes.
    val derivedInBlock: Map[String, Set[String]] = names.toSeq
      .flatMap(nm => (1 until nm.length)
        .map(p => (nm.substring(0, p) + nm.substring(p + 1)) -> nm))
      .groupBy(_._1).map { case (d, ss) => d -> ss.map(_._2).toSet }
    rows.foreach { case (dirty, matched, n, score) =>
      assert(n > 0)
      if (matched == "(none)") {
        assert(score == 0L)
        assert(!derivedInBlock.contains(dirty),
          s"in-block deletion '$dirty' must match its source")
      } else {
        assert(names.contains(matched))
        assert(score >= 8500L && score <= 10000L)
        assert(matched.charAt(0) == dirty.charAt(0), "blocking key respected")
        assert(math.abs(matched.length - dirty.length) <= 1)
        derivedInBlock.get(dirty).foreach(srcs =>
          assert(srcs.contains(matched), s"'$dirty' -> '$matched' not in $srcs"))
      }
    }
    // total records = |part| (each part row contributes exactly one typo)
    assert(rows.map(_._3).sum == Tables(spark, dir, "part").count())
  }

  test("q187 OLS: betas and R² agree with a driver-side normal-equation solve") {
    val rows = SparkEntry.queries("q187_ols2")(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("x1"),
        count(lit(1)).as("x2"))
    val data = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(floor(o_totalprice) AS BIGINT)").as("y"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderstatus", "x1", "x2", "y").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    rows.foreach { r =>
      val st = r.getString(0)
      val g = data.filter(_._1 == st)
      val n = g.length.toDouble
      assert(r.getLong(1) == g.length)
      val (s1, s2, sy) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      val c11 = n * g.map(t => t._2 * t._2).sum - s1 * s1
      val c22 = n * g.map(t => t._3 * t._3).sum - s2 * s2
      val c12 = n * g.map(t => t._2 * t._3).sum - s1 * s2
      val c1y = n * g.map(t => t._2 * t._4).sum - s1 * sy
      val c2y = n * g.map(t => t._3 * t._4).sum - s2 * sy
      val det = c11 * c22 - c12 * c12
      if (det != 0.0 && !r.isNullAt(2)) {
        val b1 = (c1y * c22 - c2y * c12) / det
        val b2 = (c2y * c11 - c1y * c12) / det
        assert(math.abs(r.getLong(2) / 1e6 - b1) < 1e-3, s"$st beta1")
        assert(math.abs(r.getLong(3) / 1e6 - b2) < 1e-3, s"$st beta2")
        val r2 = r.getLong(5) / 1e6
        assert(r2 >= -1e-6 && r2 <= 1.0 + 1e-6, s"$st R² $r2")
      }
    }
  }

  test("q188 profile: counts and bounds match direct per-column queries") {
    val rows = SparkEntry.queries("q188_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    val o = Tables(spark, dir, "orders")
    val n = o.count()
    assert(rows.size == 6)
    rows.values.foreach { case (nRows, nNulls, nDistinct, _, _) =>
      assert(nRows == n && nNulls >= 0 && nDistinct <= n - nNulls)
    }
    val (_, _, ndK, mnK, mxK) = {
      val t = rows("o_orderkey"); (t._1, t._2, t._3, t._4, t._5)
    }
    assert(ndK == o.select("o_orderkey").distinct().count())
    assert(mnK.toLong == o.agg(min("o_orderkey")).head.getLong(0))
    assert(mxK.toLong == o.agg(max("o_orderkey")).head.getLong(0))
    // value order, not string order: max key numerically >= min key
    assert(mxK.toLong >= mnK.toLong)
  }

  test("q189 mutual information: non-negative total, marginals consistent") {
    val rows = SparkEntry.queries("q189_mutual_info")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == total, "cells partition the corpus")
    // MI >= 0 up to per-cell floor loss (each term loses < 1e-9)
    assert(rows.map(_._4).sum >= -rows.length,
      s"MI sum ${rows.map(_._4).sum} below floor-loss bound")
    // independence sanity: shuffling one margin to a constant gives MI 0
    // (single-source grid would have every term ln(1) = 0) — here just
    // pin that at least one cell deviates from independence
    assert(rows.map(_._4).exists(_ != 0L))
  }

  test("q191 frame dedup: a planted re-encode shares every sampled frame") {
    val rows = SparkEntry.queries("q191_frame_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d1, d2, nShared, bp) =>
      assert(d1 < d2)
      assert(nShared >= 1)
      assert(bp > 0 && bp <= 10000)
    }
    // plant a "re-encoded" copy: same content, different asset id — it
    // must pair with its source at full containment
    val docs = Tables(spark, dir, "documents")
    val src = docs.filter(col("doc_id") === 7).select("text").head.getString(0)
    val planted = docs.unionByName(
      spark.createDataFrame(Seq((91000L, src, "en", "inj", src.length.toLong)))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // same frame-digest construction as the operator, over the planted
    // corpus: the copy's sampled-frame set must equal its source's
    import spark.implicits._
    val f = planted.filter(length(trim(col("text"))) > 0)
      .withColumn("w", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("n_chunks", expr("CAST((size(w) + 15) div 16 AS BIGINT)"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), col("n_chunks") - 1, lit(2L))).as("ci"))
      .withColumn("frame_sha",
        md5(concat_ws(" ",
          slice(col("w"), (col("ci") * 16 + 1).cast("int"), lit(16))).cast("binary")))
    val a = f.filter(col("doc_id") === 7).select("frame_sha").as[String].collect().toSet
    val b = f.filter(col("doc_id") === 91000L).select("frame_sha").as[String].collect().toSet
    assert(a.nonEmpty && a == b, "re-encoded copy must share all sampled frames")
  }

  test("q192 key skew: stats agree with a direct per-key recount") {
    val rows = SparkEntry.queries("q192_key_skew")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(rows.size == 3)
    val ev = Tables(spark, dir, "events")
    val counts = ev.groupBy("user_id").count().select("count").collect()
      .map(_.getLong(0)).sorted
    val (nRows, nKeys, maxCnt, p50, p99, topBp, ratioBp) = {
      val t = rows("events.user_id"); (t._1, t._2, t._3, t._4, t._5, t._6, t._7)
    }
    assert(nRows == counts.sum && nKeys == counts.length && maxCnt == counts.max)
    assert(p50 == counts((counts.length + 1) / 2 - 1))
    assert(p99 == counts((99 * counts.length + 99) / 100 - 1))
    assert(topBp == maxCnt * 10000 / nRows)
    assert(ratioBp == maxCnt * nKeys * 10000 / nRows)
    // the type column is the canonically skewed key: few keys, high ratio
    assert(rows("events.event_type")._2 < 10)
  }

  test("q193 decay attribution: both models conserve credit; decay shifts it later") {
    val rows = SparkEntry.queries("q193_decay_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val lin = SparkEntry.queries("q183_multi_touch")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // the linear column reproduces q183 exactly (same join, same split)
    rows.foreach { case (day, _, linE6, _) => assert(lin(day) == linE6, day) }
    // decay conserves the same total per purchase up to floor loss: totals
    // across days agree within the touch count
    val totLin = rows.map(_._3).sum
    val totDec = rows.map(_._4).sum
    val totTouch = rows.map(_._2).sum
    assert(math.abs(totLin - totDec) <= totTouch,
      s"models diverge beyond floor loss: lin=$totLin dec=$totDec")
  }

  test("q194 LSH precision: counts reconcile with the candidate and verified sets") {
    val Array(row) = SparkEntry.queries("q194_lsh_precision")(spark, dir).collect()
    val (nCand, nVer) = (row.getLong(0), row.getLong(1))
    val base = graft.queries.Dedup.minhashBase(Tables(spark, dir, "documents"))
    val cands = graft.queries.Dedup.lshCandidates(base, 32).count()
    val verified = graft.queries.Dedup.lshPairs(base, 32).count()
    assert(nCand == cands && nVer == verified)
    assert(nVer <= nCand)
    if (nCand > 0) assert(row.getLong(2) == nVer * 10000 / nCand)
  }

  test("q195 calibration: bins partition events, lift averages to ~1") {
    val rows = SparkEntry.queries("q195_calibration")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 10)
    val ev = Tables(spark, dir, "events")
    assert(rows.map(_._2).sum == ev.count())
    assert(rows.map(_._3).sum ==
      ev.filter(col("event_type") === "purchase").count())
    rows.foreach { case (bin, n, nPos, rate, _) =>
      assert(bin >= 1 && bin <= 10 && nPos <= n)
      assert(rate == nPos * 10000 / n)
    }
    // weighted mean lift = 1 (up to integer division loss)
    val wLift = rows.map { case (_, n, _, _, lift) => n * lift }.sum.toDouble /
      rows.map(_._2).sum
    assert(math.abs(wLift - 10000.0) < 100.0, s"weighted lift $wLift")
  }

  test("q196 decomposition: identity closes exactly, components plausible") {
    val rows = SparkEntry.queries("q196_decompose")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, c, trend, seas, resid) =>
      assert(c * 10000 == trend + seas + resid, "additive identity must close")
      assert(trend > 0)
    }
    // the seasonal index is shared per ISO day-of-week: at most 7 values
    assert(rows.map(_._4).distinct.length <= 7)
    // days are unique and ordered
    val days = rows.map(_._1)
    assert(days.distinct.length == days.length && days.sorted.sameElements(days))
  }

  test("q198 ER eval: outcomes partition the records, correctness dominates") {
    val rows = SparkEntry.queries("q198_er_eval")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = Tables(spark, dir, "part").count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._1).toSet.subsetOf(
      Set("matched_correct", "matched_wrong", "unmatched")))
    val correct = rows.find(_._1 == "matched_correct").map(_._2).getOrElse(0L)
    // non-first-char deletions (the overwhelming majority) must recover
    assert(correct * 10000 / total >= 8000, s"accuracy ${correct * 10000 / total}bp")
    rows.foreach { case (_, n, bp) => assert(bp == n * 10000 / total) }
  }

  test("q199 windowed funnel: monotone stages, never exceeds the unbounded funnel") {
    val rows = SparkEntry.queries("q199_funnel_window")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 3)
    val byStage = rows.sortBy(_._1).map(_._3)
    assert(byStage(0) >= byStage(1) && byStage(1) >= byStage(2), "funnel must narrow")
    // deadline can only LOSE users vs q104's unbounded stages
    val unbounded = SparkEntry.queries("q104_funnel")(spark, dir).collect()
      .map(_.getLong(1))
    assert(byStage(0) == unbounded.length, "stage 1 = all signup users")
    assert(byStage(1) <= unbounded.count(_ >= 2))
    assert(byStage(2) <= unbounded.count(_ >= 3))
    rows.foreach { case (_, _, _, stepBp, cumBp) =>
      assert(stepBp >= 0 && stepBp <= 10000 && cumBp >= 0 && cumBp <= 10000)
    }
  }

  test("q164 winsorize: bounds ordered, clipped mean inside them") {
    val rows = SparkEntry.queries("q164_winsorize")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95, m) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p05 <= p95)
      assert(m >= p05 * 100 && m <= p95 * 100,
        s"winsorized mean $m outside clip bounds [${p05 * 100}, ${p95 * 100}]")
    }
  }

  test("q200 scorecard: fixed metric set, counts consistent with the corpus") {
    val m = SparkEntry.queries("q200_corpus_scorecard")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("n_docs", "n_tokens", "n_langs", "n_sources",
      "exact_dup_docs", "empty_docs", "mean_tokens_e2"))
    val docs = Tables(spark, dir, "documents").count()
    assert(m("n_docs") == docs)
    assert(m("exact_dup_docs") >= 0 && m("exact_dup_docs") < docs)
    assert(m("empty_docs") >= 0 && m("empty_docs") <= docs)
    assert(m("n_langs") >= 1 && m("n_sources") >= 1)
    assert(m("mean_tokens_e2") == m("n_tokens") * 100 / docs)
    // the dup count must agree with the exact-dedup operator's drop count
    val kept = SparkEntry.queries("q35_dedup_exact")(spark, dir).count()
    assert(m("exact_dup_docs") == docs - kept)
  }

  test("q201 interval union: coverage bounded by event count, merging only shrinks") {
    val rows = SparkEntry.queries("q201_interval_union")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, active, nIv, nEv) =>
      assert(nIv >= 1 && nIv <= nEv, s"user $u: $nIv intervals for $nEv events")
      // each merged interval covers >= 300s; naive (unmerged) total is an upper bound
      assert(active >= nIv * 300, s"user $u: $active < ${nIv * 300}")
      assert(active <= nEv * 300, s"user $u: merged coverage exceeds naive sum")
    }
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.length == users)
  }

  test("q207 session paths agree with q121 session counts") {
    val pat = SparkEntry.queries("q207_seq_pattern")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val sess = SparkEntry.queries("q121_sessions")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pat.keySet == sess.keySet)
    // same 30-min gap rule => identical session counts per user
    pat.foreach { case (u, (n, funnel, bounce)) =>
      assert(n == sess(u), s"user $u: q207 $n sessions vs q121 ${sess(u)}")
      assert(funnel <= n && bounce <= n)
    }
  }

  test("q208 apportionment: seats sum exactly to 1000, each within 1 of exact share") {
    val rows = SparkEntry.queries("q208_apportion")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 1000L, "largest-remainder must allocate every seat")
    val total = rows.map(_._2).sum.toDouble
    rows.foreach { case (src, mass, seats) =>
      val exact = mass * 1000.0 / total
      assert(math.abs(seats - exact) < 1.0 + 1e-9,
        s"$src: $seats seats vs exact $exact — largest remainder stays within 1")
    }
  }

  test("q209 weighted median: half the char mass lies at or below it") {
    val med = SparkEntry.queries("q209_weighted_median")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = Tables(spark, dir, "documents")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    med.foreach { case (lang, wm, totw) =>
      val chars = docs(lang).map(_._2)
      assert(chars.sum == totw)
      val below = chars.filter(_ <= wm).sum
      val strictlyBelow = chars.filter(_ < wm).sum
      // defining property of the weighted median
      assert(below * 2 >= totw, s"$lang: mass at/below median is under half")
      assert(strictlyBelow * 2 < totw, s"$lang: median overshoots the crossing")
    }
  }

  test("q210 grouping sets: ALL/ALL row equals global distinct users") {
    val rows = SparkEntry.queries("q210_distinct_sets")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val global = Tables(spark, dir, "events").select("user_id").distinct().count()
    val allAll = rows.collect { case ("ALL", "ALL", u) => u }
    assert(allAll.sameElements(Array(global)))
    // a finer cell can never exceed its type's marginal
    val perType = rows.collect { case (t, "ALL", u) if t != "ALL" => t -> u }.toMap
    rows.foreach { case (t, w, u) =>
      if (t != "ALL" && w != "ALL") assert(u <= perType(t), s"cell ($t,$w) exceeds marginal")
    }
  }

  test("q211/q212/q214: nation-pair symmetry and share bounds") {
    val pairs = SparkEntry.queries("q211_nation_volume")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (sn, cn, rev) =>
      assert(Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))((sn, cn)))
      assert(rev > 0)
    }
    SparkEntry.queries("q212_market_share")(spark, dir).collect().foreach { r =>
      val bp = r.getLong(2)
      assert(bp >= 0 && bp <= 10000, s"share_bp $bp out of range")
    }
    val months = SparkEntry.queries("q214_promo_share")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(months.nonEmpty && months.length <= 12)
    months.foreach { case (m, bp) =>
      assert(m >= 1 && m <= 12 && bp >= 0 && bp <= 10000)
    }
  }

  test("q213 profit reconciles against a direct recompute on one nation-year") {
    val rows = SparkEntry.queries("q213_profit")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    val ((nation, year0), profit) = rows.head
    val direct = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("n_name") === nation && year(col("o_orderdate")) === year0)
      .selectExpr("CAST(round(l_extendedprice * 100.0) AS BIGINT) " +
        "* (10000 - CAST(round(l_discount * 10000.0) AS BIGINT)) " +
        "- CAST(l_quantity AS BIGINT) * CAST(round(p_retailprice * 100.0) AS BIGINT) * 9000 AS p")
      .agg(sum("p")).collect()(0).getLong(0)
    assert(profit == direct)
  }

  test("q215 boilerplate share bounded; q216 diversity bounded by class size") {
    val boiler = SparkEntry.queries("q215_boilerplate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(boiler.nonEmpty)
    boiler.foreach { case (d, grams, boil, bp) =>
      assert(boil >= 0 && boil <= grams, s"doc $d: $boil of $grams boiler grams")
      assert(bp == boil * 10000 / grams)
    }
    // some boilerplate must exist in a corpus with exact duplicates
    assert(boiler.exists(_._3 > 0), "no doc carries any repeated 3-gram")
    val ldiv = SparkEntry.queries("q216_l_diversity")(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(ldiv.map(_._1).sum == Tables(spark, dir, "customer").count())
    ldiv.foreach { case (size, l) => assert(l >= 1 && l <= size) }
  }

  test("q217 RRF: distinct ranks, fused score consistent and non-increasing") {
    val rows = SparkEntry.queries("q217_rrf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).distinct.length == rows.length, "rank_tf collides")
    assert(rows.map(_._4).distinct.length == rows.length, "rank_fresh collides")
    rows.foreach { case (_, _, r1, r2, rrf) =>
      assert(rrf == 1000000000L / (60 + r1) + 1000000000L / (60 + r2))
    }
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "fused score must be non-increasing")
      case _ =>
    }
  }

  test("q218 log-odds: 3 terms per lang, delta ordered, positive head") {
    val rows = SparkEntry.queries("q218_log_odds")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_._4).sorted.sameElements(Array(1L, 2L, 3L)),
        s"$lang: expected exactly ranks 1..3")
      val deltas = rs.sortBy(_._4).map(_._3)
      assert(deltas.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
        s"$lang: delta not non-increasing")
      // the most distinctive term should genuinely over-index (delta > 0)
      assert(deltas.head > 0, s"$lang: top delta ${deltas.head} not positive")
    }
  }

  test("q221 incremental merge is consistent for every type; q222 ranks returned revenue") {
    val inc = SparkEntry.queries("q221_incremental")(spark, dir).collect()
    assert(inc.nonEmpty)
    // the whole point: state + delta == full recompute, per type
    inc.foreach(r => assert(r.getLong(5) == 1L,
      s"${r.getString(0)}: merged state diverged from the full recompute"))
    val types = Tables(spark, dir, "events").select("event_type").distinct().count()
    assert(inc.length == types)
    val ret = SparkEntry.queries("q222_returned_items")(spark, dir).collect()
      .map(_.getLong(3))
    assert(ret.nonEmpty)
    ret.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "revenue ranking must be non-increasing")
      case _ =>
    }
  }

  test("q224 CUPED: arms partition users, variance reduction bounded, adjustment applied") {
    val r = SparkEntry.queries("q224_cuped")(spark, dir).collect().head
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users, "arms must partition the users")
    val varRed = r.getLong(3)
    assert(varRed >= 0L && varRed <= 10000L, s"var_red_bp $varRed out of [0, 10000]")
    assert(!r.isNullAt(4) && !r.isNullAt(5), "both arms non-empty => lifts defined")
    // pre-period value predicts experiment value in this corpus, so CUPED
    // must actually engage (theta != 0) rather than silently no-op
    assert(r.getLong(2) != 0L, "theta collapsed to zero on correlated data")
  }

  test("q229 KMV set ops: union dominates sides, intersection near exact") {
    val rows = SparkEntry.queries("q229_kmv_setops")(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (ea, eb, eu, ei, exact) =>
      // merged bottom-16's 16th element <= each side's: structural domination
      assert(eu >= math.max(ea, eb) && eu <= ea + eb,
        s"union estimate $eu outside [max($ea,$eb), $ea+$eb]")
      assert(ei <= math.min(ea, eb), s"intersection $ei above a side")
      // k=16 KMV has ~27% std error; inclusion-exclusion compounds it —
      // a loose 2x band still catches sign/scale bugs
      if (exact >= 32) assert(ei > exact / 3 && ei < exact * 3,
        s"est_inter $ei vs exact $exact beyond the error band")
    }
  }

  test("q231/q232: decile-0 novelty is total, growth curve telescopes to the vocabulary") {
    val nov = SparkEntry.queries("q231_novelty")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(nov.map(_._1).toSeq == (0L to 9L))
    // the first decile's grams are all first-sightings of themselves or
    // of earlier docs in the same decile — novelty must dominate later deciles
    assert(nov.head._4 > nov.last._4, "novelty should fall as the corpus grows")
    nov.foreach { case (_, g, n, bp) =>
      assert(n <= g && bp == n * 10000 / g)
    }
    val heaps = SparkEntry.queries("q232_heaps_curve")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // cumulative telescopes and ends at the full distinct-3-gram vocabulary
    assert(heaps.map(_._1).sum == heaps.last._2)
    // total new grams across deciles equals total novelty count
    assert(heaps.map(_._1).sum == nov.map(_._3).sum)
  }

  test("q235 median CI: brackets the median, narrows with n") {
    val rows = SparkEntry.queries("q235_median_ci")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, med, lo, hi) =>
      assert(lo <= med && med <= hi, s"$t: CI [$lo, $hi] does not bracket $med")
      assert(n > 0)
    }
  }

  test("q236 nearest as-of: matches a driver-side exact recompute") {
    val got = SparkEntry.queries("q236_asof_nearest")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val viewsByUser = ev.filter(_._3 == "view").groupBy(_._2)
    ev.filter(_._3 == "purchase").foreach { case (pid, u, _, psec) =>
      val cands = viewsByUser.getOrElse(u, Array.empty)
        .filter(v => math.abs(v._4 - psec) <= 3600 && v._4 != psec)
      val expect =
        if (cands.isEmpty) (-1L, 0L)
        else {
          // nearest; tie -> backward (the view BEFORE the purchase)
          val best = cands.minBy(v => (math.abs(v._4 - psec), v._4 - psec))
          (best._1, best._4 - psec)
        }
      assert(got(pid) == expect, s"purchase $pid: got ${got(pid)}, expect $expect")
    }
  }

  test("q237 semantic decontamination: flags cross the split boundary only") {
    val rows = SparkEntry.queries("q237_semantic_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    rows.foreach { case (hv, tv, cos) =>
      assert(bucket(hv) >= 90, s"flagged vec $hv is not heldout")
      assert(bucket(tv) < 90, s"nearest match $tv is not train")
      assert(cos >= 0.35 && cos <= 1.0)
    }
  }

  test("q206 majority suppliers genuinely hold >20% of some part") {
    import spark.implicits._
    val got = SparkEntry.queries("q206_majority_supp")(spark, dir)
      .select("s_suppkey").as[Long].collect().toSet
    val pq = Tables(spark, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totals = pq.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).sum }
    val expected = pq.filter { case (p, _, q) => q * 10 > totals(p) * 2 }.map(_._2).toSet
    assert(got == expected)
  }
}
