package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** MinHash+LSH pipeline mechanics (q37's engine): one-scan base table and
  * the degenerate-bucket cap. The oracle gate (check_oracle) covers result
  * correctness at sf; these tests cover the scale hazards VERDICT r1 named:
  * a mega-bucket must not reach the quadratic candidate self-join. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 200 byte-identical docs (one LSH mega-bucket: identical signatures in
  // every band), plus one true near-dup pair, plus unrelated filler.
  private lazy val degenerate = {
    val boiler = (0 until 200).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"))
    val nearA = (1000L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo")
    val nearB = (1001L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet lima")
    val filler = (2000 until 2010).map(i =>
      (i.toLong, s"unique${i} words${i} here${i} nothing${i} shared${i} at${i} all${i}"))
    (boiler ++ Seq(nearA, nearB) ++ filler).toDF("doc_id", "text")
  }

  test("degenerate bucket is dropped by the cap; real near-dups survive") {
    val base = Dedup.minhashBase(degenerate)
    try {
      val pairs = Dedup.lshPairs(base, Dedup.LshBucketCap).collect()
      // the 200-doc identical cluster would contribute 200*199/2 = 19900
      // pairs without the cap; with it, none of its members reach the join
      assert(!pairs.exists(r => r.getLong(0) < 1000L))
      // the genuine near-dup pair (10/12 shared 3-shingles, jacc ≈ 0.818)
      // lives in a bucket of size 2 and must survive
      assert(pairs.exists(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L))
    } finally base.unpersist()
  }

  test("uncapped join would be quadratic in the bucket (the hazard)") {
    val base = Dedup.minhashBase(degenerate)
    try {
      val uncapped = Dedup.lshPairs(base, Int.MaxValue)
        .filter(col("d1") < 1000L).count()
      assert(uncapped == 200L * 199 / 2)
    } finally base.unpersist()
  }

  test("q83 containment pairs are invisible to symmetric Jaccard (q36)") {
    // the operator's reason to exist: every snippet-in-host pair it finds
    // has Jaccard ≈ |A|/|B| ≈ 0.5, below q36's 0.7 — and q36's size-ratio
    // prefilter would drop the pair before scoring anyway
    val cont = SparkEntry.queries("q83_containment")(spark, sf("sf0.001")).collect()
    assert(cont.nonEmpty, "no containment pairs found")
    assert(cont.forall(_.getDouble(2) >= 0.8))
    // each snippet finds at least its own source doc (pseudo id - 1e6)
    val selfPairs = cont.map(r => (r.getLong(0) - 1000000L, r.getLong(1)))
      .filter { case (src, host) => src == host }
    val snippetIds = cont.map(_.getLong(0)).distinct
    assert(selfPairs.length == snippetIds.length,
      s"some snippet missed its host: ${snippetIds.length} snippets, ${selfPairs.length} self pairs")
    // and none of those self pairs would pass q36's symmetric gate: a
    // half-length snippet has jacc = sz1/sz2 ~ 0.5 and fails the 7/10
    // size-ratio prefilter (sz1*10 >= sz2*7 needs sz1 >= 0.7*sz2)
    val q36gate = SparkEntry.queries("q36_jaccard_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(selfPairs.forall { case (src, host) => !q36gate.contains((src, host)) })
  }

  test("bottom-k containment screen (q89) finds every q83 pair on this corpus") {
    // the screen is probabilistic in general (miss ≤ 0.2^4 per 0.8-pair)
    // but deterministic given the hashes; here it achieves full recall,
    // and self pairs (cont = 1.0) are found by construction
    val exhaustive = SparkEntry.queries("q83_containment")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val screened = SparkEntry.queries("q89_containment_lsh")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(screened == exhaustive,
      s"missing=${exhaustive -- screened} extra=${screened -- exhaustive}")
    assert(screened.nonEmpty)
  }

  test("minhashBase is one row per non-empty doc with K-length signatures") {
    val base = Dedup.minhashBase(degenerate)
    try {
      val rows = base.select(col("doc_id"), size(col("sig")).as("k")).collect()
      assert(rows.length == 212) // all docs have >= 3 tokens
      assert(rows.forall(_.getInt(1) == 16))
    } finally base.unpersist()
  }

  test("q220 prefix join is EXACT: equals brute force, supersets the LSH pairs") {
    val dir = sf("sf0.001")
    // brute force: every doc pair, true shingle-set Jaccard >= 0.7
    val base = Dedup.minhashBase(Tables(spark, dir, "documents"))
    val brute = try {
      val a = base.select(col("doc_id").as("d1"), col("hs").as("h1"), col("sz").as("sz1"))
      val b = base.select(col("doc_id").as("d2"), col("hs").as("h2"), col("sz").as("sz2"))
      val inter = size(array_intersect(col("h1"), col("h2")))
      a.join(b, col("d1") < col("d2"))
        .withColumn("jacc", round(
          inter.cast("double") / (col("sz1") + col("sz2") - inter).cast("double"), 4))
        .filter(col("jacc") >= 0.7)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally base.unpersist()
    val prefix = SparkEntry.queries("q220_prefix_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix == brute,
      s"missed=${brute -- prefix} phantom=${prefix -- brute}")
    // LSH (banded, capped) can only MISS pairs the exact join finds
    val lsh = SparkEntry.queries("q37_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(prefix), s"LSH phantom pairs: ${lsh -- prefix}")
    assert(prefix.nonEmpty)
    // q37 leaves its minhash base persisted (bench/Verify clear it);
    // drop it so cache-sensitive suites (CorpusMainSpec) start clean
    spark.catalog.clearCache()
  }

  // ---- r12 mega-bucket screen (count-then-collect) stress ----------------
  // The hazard the 10x scale fixture cannot see: ONE band hash shared by
  // ~100k docs. Pre-r12, lshCandidates collected that bucket's full member
  // array on one reducer BEFORE the size filter dropped it; now bucket
  // sizes come from a partial-aggregating count and arrays form only for
  // keys proven <= cap — the degenerate family never materializes.

  /** A minhashBase-shaped frame (doc_id, hs, sz, sig) built directly —
    * hashing 100k real texts would dominate the test for no extra proof. */
  private def syntheticBase(famSize: Int): org.apache.spark.sql.DataFrame = {
    val famSig = typedLit((1 to 16).map(i => 100L + i))
    val duoSig = typedLit((1 to 16).map(i => 900L + i))
    val fam = spark.range(famSize).select(
      col("id").as("doc_id"),
      typedLit(Seq(1L, 2L, 3L)).as("hs"),
      lit(3).as("sz"), famSig.as("sig"))
    val duo = Seq(500000L, 500001L).toDF("doc_id").select(
      col("doc_id"), typedLit(Seq(7L, 8L, 9L, 10L)).as("hs"),
      lit(4).as("sz"), duoSig.as("sig"))
    fam.unionByName(duo)
  }

  test("mega-bucket screen: 100k-member band bucket pairs nothing, small buckets survive") {
    val base = syntheticBase(100000)
    val out = Dedup.lshCandidates(base, Dedup.LshBucketCap)
    // plan pin: the screen exists — a count aggregate feeds the collect
    // via a join instead of a size-filter above the collected arrays
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("cnt"), "count screen missing from the plan")
    val rows = out.collect()
    // the family shares ONE signature, so tier 2's secondary hash cannot
    // split it: the residue drops whole, and only the planted duo pairs
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((500000L, 500001L)))
    assert(rows.head.getDouble(2) == 1.0)
  }

  test("prefixPairs oversized buckets take the self-join path, output-identical") {
    // 300 docs share one shingle-hash set, so every doc's rarest prefix
    // tokens collide into buckets of 300 > PrefixBucketArrayMax (256):
    // the EXACT join must keep all C(300,2) pairs via the streaming
    // self-join (an LSH-style cap would wrongly drop them), while a
    // 2-doc bucket rides the in-array path — both land in one pair set.
    val famHs = typedLit(Seq(1L, 2L, 3L, 4L, 5L))
    val fam = spark.range(300).select(col("id").as("doc_id"),
      famHs.as("hs"), lit(5).as("sz"))
    val duo = Seq(700000L, 700001L).toDF("doc_id").select(col("doc_id"),
      typedLit(Seq(7L, 8L, 9L, 10L)).as("hs"), lit(4).as("sz"))
    val pairs = Dedup.prefixPairs(fam.unionByName(duo)).collect()
    val famPairs = pairs.filter(_.getLong(0) < 1000L)
    assert(famPairs.length == 300 * 299 / 2,
      s"exact join lost family pairs: ${famPairs.length}")
    assert(famPairs.forall(_.getDouble(2) == 1.0))
    assert(pairs.exists(r => r.getLong(0) == 700000L && r.getLong(1) == 700001L))
    assert(pairs.length == 300 * 299 / 2 + 1)
  }

  test("prefixPairsSharded: shard loop output-identical to the one-shot join") {
    // same adversarial fixture as above (an oversized 300-member family
    // exercising the self-join route plus a small-bucket duo), so the
    // shard loop must reproduce all C(300,2)+1 pairs: the family's
    // shared tokens land wholly in single shards (hash sharding), and
    // the duo's pair — discoverable via several shared tokens that may
    // fall in DIFFERENT shards — must collapse to one row
    val famHs = typedLit(Seq(1L, 2L, 3L, 4L, 5L))
    val fam = spark.range(300).select(col("id").as("doc_id"),
      famHs.as("hs"), lit(5).as("sz"))
    val duo = Seq(700000L, 700001L).toDF("doc_id").select(col("doc_id"),
      typedLit(Seq(7L, 8L, 9L, 10L)).as("hs"), lit(4).as("sz"))
    val base = fam.unionByName(duo)
    val oneShot = Dedup.prefixPairs(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (shards <- Seq(1, 3, 8)) {
      val sharded = Dedup.prefixPairsSharded(base, shards).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sharded == oneShot, s"shard count $shards diverged")
    }
  }

  test("q291 cluster split: zero near-dup leakage where the doc-hash split leaks") {
    val dir = sf("sf0.001")
    val split = SparkEntry.queries("q291_cluster_split")(spark, dir)
      .localCheckpoint(eager = true)
    val base = Dedup.minhashBase(spark.read.parquet(s"$dir/documents.parquet"))
    val pairs = Dedup.lshPairs(base, Dedup.LshBucketCap)
      .localCheckpoint(eager = true)
    base.unpersist()
    assert(pairs.count() > 0, "fixture has no near-dup pairs — vacuous test")
    // every verified near-dup pair stays within ONE split
    val s1 = split.select(col("doc_id").as("d1"), col("split").as("s1"))
    val s2 = split.select(col("doc_id").as("d2"), col("split").as("s2"))
    val leaked = pairs.join(s1, "d1").join(s2, "d2")
      .filter(col("s1") =!= col("s2")).count()
    assert(leaked === 0L, s"$leaked near-dup pairs cross cluster-split boundaries")
    // ...where q73's doc-hash rule DOES leak on the same corpus (32 pairs
    // at sf0.001) — the bug this operator exists to fix
    val docBucket = graft.queries.TrainPrep.splitBucket(col("doc_id"))
    val docSplit = split.select(col("doc_id"),
      when(docBucket < 90, "train").when(docBucket < 95, "val")
        .otherwise("test").as("ds"))
    val d1 = docSplit.select(col("doc_id").as("d1"), col("ds").as("s1"))
    val d2 = docSplit.select(col("doc_id").as("d2"), col("ds").as("s2"))
    val docLeaked = pairs.join(d1, "d1").join(d2, "d2")
      .filter(col("s1") =!= col("s2")).count()
    assert(docLeaked > 0L, "doc-hash split did not leak — corpus too clean for the contrast")
    // proportions stay near 90/5/5: cluster keys hash like doc ids
    val n = split.count().toDouble
    val train = split.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.8 && train / n < 0.97, s"train share ${train / n}")
  }

  test("q292/clusterSplitFromState: standing-state split == q291, even " +
      "when the state was grown incrementally") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = Dedup.minhashBase(docs)
    val allEdges = Dedup.lshPairs(base, Dedup.LshBucketCap)
      .select(col("d1").as("src"), col("d2").as("dst"))
      .localCheckpoint(eager = true)
    base.unpersist()
    // reference: the from-scratch split (q291's exact pipeline)
    val ref = SparkEntry.queries("q291_cluster_split")(spark, dir)
      .collect().toSeq
    // state grown INCREMENTALLY: old slice first, then the delta's edges
    // (within-delta + bridging) appended — the at-scale maintenance shape.
    // Edge split by either endpoint in the delta covers bridges.
    val stateDir = java.nio.file.Files
      .createTempDirectory("split-state").toString
    val isNew = (c: org.apache.spark.sql.Column) => c % 10 === 7
    graft.operators.ClusterState.build(
      allEdges.filter(!isNew(col("src")) && !isNew(col("dst"))), stateDir)
    graft.operators.ClusterState.appendEdges(spark,
      allEdges.filter(isNew(col("src")) || isNew(col("dst"))), stateDir)
    val got = Dedup.clusterSplitFromState(spark, docs, stateDir)
      .collect().toSeq
    assert(got === ref,
      "incrementally-grown standing labels produced a different split")
    // and the q292 query itself (one-shot build) matches too
    val q292 = SparkEntry.queries("q292_state_split")(spark, dir)
      .collect().toSeq
    assert(q292 === ref)
  }

  test("prefixShardsFor: one shard below the budget, ceil above, capped") {
    // the 125k default comes from the r14 measurement: one-shot verify
    // spills around 500k docs, 4 shards (~125k in flight) spill zero
    assert(Dedup.prefixShardsFor(0L) === 1)
    assert(Dedup.prefixShardsFor(50000L) === 1)
    assert(Dedup.prefixShardsFor(125000L) === 1)
    assert(Dedup.prefixShardsFor(125001L) === 2)
    assert(Dedup.prefixShardsFor(500000L) === 4)
    assert(Dedup.prefixShardsFor(10000000L) === 64) // maxShards cap
    assert(Dedup.prefixShardsFor(10000000L, maxShards = 128) === 80)
  }

  test("probePairs mega-bucket screen: degenerate index bucket screened by count") {
    val probe = syntheticBase(0).filter(col("doc_id") === 500000L)
    val probeBands = Dedup.bandKeys(probe).collect()
      .map(r => (r.getInt(1), r.getString(2))).toMap // bi -> bh
    // index: 100k docs share the probe's band-0 hash (over cap -> screened
    // out even though every sig would verify), 3 docs share band 1 (<= cap)
    val fam = spark.range(100000).select(
      (col("id") + 10000L).as("doc_id"), lit(0).as("bi"), lit(probeBands(0)).as("bh"))
    val small = Seq(600000L, 600001L, 600002L).toDF("doc_id")
      .select(col("doc_id"), lit(1).as("bi"), lit(probeBands(1)).as("bh"))
    val idxBands = fam.unionByName(small)
    val idxSigs = idxBands.select(col("doc_id"),
      typedLit(Seq(7L, 8L, 9L, 10L)).as("hs"), lit(4).as("sz"))
    val out = graft.operators.DedupIndex.probePairs(probe, idxBands, idxSigs)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    // only the small bucket's members match; the 100k family — identical
    // signatures, would verify at jacc 1.0 — is excluded by the cap screen
    assert(out == Seq(600000L, 600001L, 600002L))
  }

  // ---- q303: paragraph-granularity dedup (r16) ----------------------------

  test("paraDedup: planted paragraph dup caught below the whole-doc Jaccard gate") {
    def para(tag: String): String = (1 to 16).map(i => s"${tag}w$i").mkString(" ")
    val p1 = para("p1"); val p2 = para("p2")
    val docs = Seq(
      (1L, s"$p1 $p2 ${para("a3")}"), // the original: 3 paras, all kept
      (2L, s"$p1 $p2 ${para("b3")}"), // 2 of 3 paras copied from doc 1
      (3L, s"$p1 ${para("c2")} ${para("c3")} ${para("c4")}") // 1 of 4
    ).toDF("doc_id", "text")
    // the motivating gap: NO whole-doc near-dup pair exists (shared mass
    // dilutes pairwise Jaccard under 0.7) — only the paragraph view sees it
    val base = Dedup.minhashBase(docs)
    try assert(Dedup.lshPairs(base, Dedup.LshBucketCap).isEmpty,
      "planted docs must not pair at whole-doc granularity")
    finally base.unpersist()
    val out = Dedup.paraDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // keep-first: the ORIGINAL's paragraphs never count against it
    assert(out(1L) == ((3L, 0L, 0L, "keep")), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((3L, 2L, 6666L, "drop")), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((4L, 1L, 2500L, "trim")), s"doc 3: ${out(3L)}")

    // q305, the transform half on the same planted corpus: the trim
    // removes exactly the duplicated copies and the kept digest is the
    // md5 of the surviving paragraphs rejoined in document order
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val trim = Dedup.paraTrim(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(trim(1L) == ((3L, 0L, 48L, 48L, 10000L,
      md5hex(s"$p1 $p2 ${para("a3")}"))), s"doc 1: ${trim(1L)}")
    assert(trim(2L) == ((3L, 2L, 48L, 16L, 3333L,
      md5hex(para("b3")))), s"doc 2: ${trim(2L)}")
    assert(trim(3L) == ((4L, 1L, 64L, 48L, 7500L,
      md5hex(s"${para("c2")} ${para("c3")} ${para("c4")}"))), s"doc 3: ${trim(3L)}")
    // keep-first conservation: every dropped paragraph's text still ships
    // somewhere (doc 1 keeps the originals of both duplicated paragraphs)
    assert(trim(1L)._4 == 48L)
  }

  test("paraDedup: >1000-paragraph doc — the r16 stride-1000 collision zone — labels cleanly") {
    def para(tag: String): String = (1 to 16).map(i => s"${tag}w$i").mkString(" ")
    val nP = 1050 // pi 1000..1049 would bleed into doc 2's pid range at stride 1000
    val docs = Seq(
      (1L, (0 until nP).map(i => para(s"L$i")).mkString(" ")),
      (2L, s"${para("L0")} ${para("fresh")}") // copies doc 1's FIRST paragraph
    ).toDF("doc_id", "text")
    val out = Dedup.paraDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // keep-first: the long original keeps everything; doc 2's copy is the
    // only duplicate in the corpus — no pid ever crosses doc ranges
    assert(out(1L) == ((nP.toLong, 0L, 0L, "keep")), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 5000L, "drop")), s"doc 2: ${out(2L)}")
  }

  test("paraDedup: pid guard fails loudly past the doc-id bound") {
    val docs = Seq((Dedup.MaxParaDocId, "some short text here")).toDF("doc_id", "text")
    val e = intercept[Exception] { Dedup.paraDedup(docs).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("paragraph id out of range")),
      s"unexpected failure: $e")
  }

  test("paraDedup/paraTrim: blank-line boundaries win over the block fallback") {
    def words(tag: String, n: Int): String = (1 to n).map(i => s"${tag}$i").mkString(" ")
    val pa = words("a", 10) // a 10-token paragraph, shared verbatim
    // messy whitespace inside a paragraph: double space + single newline —
    // both normalize to one space (single \n is NOT a boundary)
    val messy = s"f1  f2\nf3 ${words("f", 16).split(" ").drop(3).mkString(" ")}"
    val docs = Seq(
      (31L, s"$pa\n\n$messy"),
      (32L, s"${words("g", 16)}\n\n$pa")
    ).toDF("doc_id", "text")
    val out = Dedup.paraDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(31L) == ((2L, 0L, "keep")), s"doc 31: ${out(31L)}")
    assert(out(32L) == ((2L, 1L, "drop")), s"doc 32: ${out(32L)}")

    // the SAME content with boundaries erased: 16-token blocks never
    // isolate the shared paragraph (Jaccard 8/14 < 0.7) — the boundary
    // answer is strictly better, which is the point of preferring it
    val flat = docs.select(col("doc_id"),
      regexp_replace(col("text"), "\\s+", " ").as("text"))
    val blk = Dedup.paraDedup(flat).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(blk(31L) == "keep" && blk(32L) == "keep",
      s"block fallback unexpectedly paired: $blk")

    // q305 on the boundary docs: doc 32 keeps only its fresh paragraph and
    // the digest is the md5 of the NORMALIZED kept text (lower + collapse)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val trim = Dedup.paraTrim(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(6)))).toMap
    assert(trim(31L) == ((0L, md5hex(s"$pa ${words("f", 16)}"))), s"doc 31: ${trim(31L)}")
    assert(trim(32L) == ((1L, md5hex(words("g", 16)))), s"doc 32: ${trim(32L)}")
  }

  test("q310: injected full copies drop; the boundary path is live on the derived corpus") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("q310_para_boundary")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    val copies = out.keys.filter(_ >= Dedup.ParaCopyOffset).toSeq
    assert(copies.nonEmpty, "no injected copies — derivation broken")
    copies.foreach { id =>
      val (np, nd, v) = out(id)
      // every copy paragraph with >= 3 tokens has an identical earlier
      // twin in the original (keep-first), and at most one ragged tail
      // paragraph is too short to shingle — so any multi-paragraph copy
      // must fully drop
      if (np >= 2) assert(v == "drop" && nd >= np - 1, s"copy $id: ${out(id)}")
    }
    // both classes of copy exist: boundary-split (%3==0 originals,
    // cross-engine bp0/bd CTEs live) and block-fallback
    assert(copies.exists(id => (id - Dedup.ParaCopyOffset) % 3 == 0))
    assert(copies.exists(id => (id - Dedup.ParaCopyOffset) % 3 != 0))
    // boundary docs paragraph at chunk-10 granularity: a %3==0 original
    // with >= 20 tokens reports more paragraphs than its 16-token block
    // form would only sometimes — instead pin the live path structurally:
    // some %3==0 original has n_paras >= 2 (a 10-token chunking artifact)
    assert(out.exists { case (id, (np, _, _)) =>
      id < Dedup.ParaCopyOffset && id % 3 == 0 && np >= 2 })
  }

  test("q310 copy-id guard fails loudly when a base doc_id reaches the offset") {
    val docs = Seq((Dedup.ParaCopyOffset + 5L, "five plain words here now"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.paraBoundaryCorpus(docs).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("copy id collision")),
      s"unexpected failure: $e")
  }

  test("paraRelation is single-pass: one FileScan of documents (r18 plan pin)") {
    // the r17 form drove TWO rlike-filtered scan branches; the dual scan
    // doubles I/O at 100 TB. Pin the single-scan shape on the real
    // parquet-backed relation (an in-memory localRelation would not show
    // a FileScan at all).
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val plan = Dedup.paraRelation(docs).queryExecution.executedPlan.toString
    val nScans = plan.sliding("FileScan".length).count(_ == "FileScan")
    assert(nScans == 1, s"expected exactly one FileScan, got $nScans:\n$plan")
  }

  test("paraExact: global digest keep-first drops within-doc repeats and short paragraphs too") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val p1 = "alpha beta gamma delta eps"
    val p2 = "zeta eta theta"
    val p3 = "only in doc two here"
    val short = "xy" // 1 token — below the shingle minimum, exact still catches it
    val docs = Seq(
      (1L, s"$p1\n\n$p2\n\n$p1"),          // within-doc repeat of p1
      (2L, s"$p3\n\n$p1\n\n$short"),        // cross-doc copy of p1
      (3L, s"$short\n\n${"fresh words here".trim}")
    ).toDF("doc_id", "text")
    val out = Dedup.paraExact(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(6)))).toMap
    // doc 1: second p1 dropped (keep-first WITHIN the doc), p2 kept
    assert(out(1L) == ((3L, 1L, md5hex(s"$p1 $p2"))), s"doc 1: ${out(1L)}")
    // doc 2: its p1 dropped (doc 1 holds the first copy); "xy" kept
    // (doc 2's copy precedes doc 3's in pid order)
    assert(out(2L) == ((3L, 1L, md5hex(s"$p3 $short"))), s"doc 2: ${out(2L)}")
    // doc 3: its "xy" dropped — a 1-token paragraph the shingle-based
    // near-dup path could never pair
    assert(out(3L) == ((2L, 1L, md5hex("fresh words here"))), s"doc 3: ${out(3L)}")
    // the near-dup roll-up (cross-doc only) does NOT count doc 1's
    // within-doc repeat — the complementary-semantics contrast
    val nd = Dedup.paraDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nd(1L) == 0L, s"near-dup must ignore within-doc repeats: $nd")
  }

  test("paraExactMark/Rebuild: seen-state trim, within-frame keep-first, untouched verbatim (r18)") {
    import spark.implicits._
    val pA = "alpha beta gamma delta eps"
    val pB = "zeta eta theta iota kappa"
    val pC = "lambda mu nu xi omicron pi"
    val docs = Seq(
      (1L, s"$pA\n\n$pB", "en"),   // untouched (nothing seen, no repeat)
      (2L, s"$pC\n\n$pC", "en"),   // within-frame repeat: second pC drops
      (3L, s"SEEN ONE\n\n$pA", "en") // state-seen paragraph + frame repeat
    ).toDF("doc_id", "text", "lang")
    val seen = Seq("seen one").toDF("p")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("p")
          .cast("binary")).as("dig"))
    val marked = Dedup.paraExactMark(Dedup.paraDigested(docs), Some(seen))
    val out = Dedup.paraExactRebuild(marked, docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // doc 3 vanished: "seen one" trimmed by the STATE (note the case-
    // insensitive normalized digest), its pA by doc 1's lower-pid frame
    // copy — zero novel paragraphs
    assert(out.keySet == Set(1L, 2L), s"kept ${out.keySet}")
    // doc 1 passes VERBATIM — original casing/separator untouched
    assert(out(1L) == ((s"$pA\n\n$pB", "en")))
    // doc 2 rebuilt from its kept first copy only; extra columns carried
    assert(out(2L) == ((pC, "en")))
  }

  test("q312: standing digest state reproduces from-scratch exact paragraph dedup") {
    val dir = sf("sf0.001")
    val scratch = SparkEntry.queries("q311_para_exact")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val grown = SparkEntry.queries("q312_incr_para_exact")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(scratch.nonEmpty && grown == scratch,
      "grown-via-appends keep-first map must equal from-scratch exactly")
  }

  // ---- q304: true maximal repeated spans (r16) -----------------------------

  test("maximalSpans: exact planted span length; q287's run merges what q304 keeps apart") {
    def words(tag: String, n: Int): Seq[String] = (1 to n).map(i => s"${tag}w$i")
    val shared20 = words("s", 20)
    val s13 = words("t", 13)
    val docs = Seq(
      // X and Y share EXACTLY a 20-token passage at different offsets
      (10L, (words("xa", 8) ++ shared20 ++ words("xb", 6)).mkString(" ")),
      (11L, (words("ya", 3) ++ shared20 ++ words("yb", 11)).mkString(" ")),
      // Z holds t1..t13; A1 holds t1..t12, A2 holds t2..t13: Z's two
      // repeated windows are CONSECUTIVE but repeat against DIFFERENT
      // partners — no 13-token string occurs twice anywhere
      (20L, (words("za", 5) ++ s13 ++ words("zb", 5)).mkString(" ")),
      (21L, (words("ka", 4) ++ s13.take(12) ++ words("kb", 4)).mkString(" ")),
      (22L, (s13.drop(1) ++ words("mb", 8)).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.maximalSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the 20-token shared passage is reported at its TRUE length
    assert(spans(10L) == ((1L, 20L)), s"doc 10: ${spans(10L)}")
    assert(spans(11L) == ((1L, 20L)), s"doc 11: ${spans(11L)}")
    // Z: two 12-token maximal spans, never a 13 — while q287's
    // repeated-window RUN (length 2) would naively read as 13 tokens
    assert(spans(20L) == ((2L, 12L)), s"doc 20: ${spans(20L)}")
    assert(spans(21L) == ((1L, 12L)), s"doc 21: ${spans(21L)}")
    assert(spans(22L) == ((1L, 12L)), s"doc 22: ${spans(22L)}")
  }

  test("q308: cap bands partition the window mass; a planted 33x window lands in capped") {
    val dir = sf("sf0.001")
    val df = SparkEntry.queries("q308_span_cap_audit")(spark, dir)
    assert(df.columns.toSeq ==
      Seq("band", "n_hashes", "n_windows", "pair_mass", "win_bp"))
    val rows = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // the bands partition the window mass and the shares fold to ~10000
    val q287 = SparkEntry.queries("q287_repeated_spans")(spark, dir)
      .agg(sum("n_windows")).head().getLong(0)
    assert(rows.values.map(_._2).sum == q287, "window mass must partition")
    assert(math.abs(rows.values.map(_._4).sum - 10000L) <= rows.size, "bp fold")
    assert(rows("unique")._3 == 0L, "unique hashes carry no pair mass")
    // the fixtures never exceed the cap (the SCALE.md tier rows are where
    // the capped band materializes)
    assert(!rows.contains("capped"), s"fixture unexpectedly capped: $rows")

    // planted over-cap: one 12-token window repeated 33 times across docs —
    // the screen q308 quantifies: maximalSpans reports NO spans despite 33
    // identical passages (that content is q287's boilerplate flag's job)
    import spark.implicits._
    val w12 = (1 to 12).map(i => s"capw$i").mkString(" ")
    val planted = (1 to 33).map(i => (i.toLong, s"pre$i $w12 post$i")).toDF("doc_id", "text")
    val audit = Dedup.maximalSpans(planted).collect()
    assert(audit.nonEmpty && audit.forall(r => r.getLong(1) == 0L),
      "an over-cap group must be screened out of pairing entirely")
  }

  test("maximalSpans vs q287 on the fixture: span bounded by run, repeats imply spans") {
    val dir = sf("sf0.001")
    val q287 = SparkEntry.queries("q287_repeated_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap // (n_repeated, longest_run)
    val q304 = SparkEntry.queries("q304_maximal_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap // (n_spans, max_span)
    assert(q304.nonEmpty && q304.keySet == q287.keySet, "same >=12-token doc domain")
    q304.foreach { case (id, (nSpans, maxSpan)) =>
      val (nRep, run) = q287(id)
      // a diagonal run is a subset of q287's anywhere-repeated run, so the
      // true span can never exceed the naive run-derived estimate
      assert(maxSpan <= run + 11, s"doc $id: span $maxSpan > run-bound ${run + 11}")
      // a true span needs repeated windows; the converse can fail (over-cap
      // boilerplate groups are excluded from pairing by design)
      if (nSpans > 0) assert(nRep > 0, s"doc $id: spans without repeats")
      if (nSpans > 0) assert(maxSpan >= 12)
    }
    assert(q304.values.exists(_._1 > 0), "fixture has no spans — vacuous")
  }
}
