package graft

import graft.dedup.Dedup
import graft.sim.Similarity
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-guard behavior on a pathologically skewed corpus: one cluster of
  * thousands of identical documents (the mega-bucket case that goes O(n²)
  * without caps — the 100-TB failure mode the bucket/df caps exist for).
  */
class SkewStressSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val ClusterSize = 5000
  private lazy val docs = {
    val dup = (0 until ClusterSize).map(i =>
      (i.toLong, "the same boilerplate text repeated for every page in this cluster exactly"))
    val uniq = (ClusterSize until ClusterSize + 2000).map(i =>
      (i.toLong, s"unique document number $i with entirely distinct words w$i x${i * 7} y${i * 13} z${i * 31} plus filler"))
    (dup ++ uniq).toDF("doc_id", "text")
  }

  test("minHashLsh bucket cap bounds candidate pairs on a 5k-duplicate cluster") {
    // uncapped, the cluster alone emits C(5000,2) ≈ 12.5M pairs per band;
    // with the cap its 16 mega-buckets drop entirely
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", k = 3, threshold = 0.6, maxBucket = 100)
    assert(pairs.count() == 0)
    // the drop is observable, not silent: 16 band buckets of exactly the cluster
    val sigUdf = F.udf((t: String) => Dedup.bandKeys(Dedup.minHashSignature(t, 3, 64), 16))
    val banded = docs.select($"doc_id".as("id"),
      F.posexplode(sigUdf($"text")).as(Seq("band", "bkey")))
    val ovf = Dedup.bucketOverflow(banded, Seq("band", "bkey"), 100)
    assert(ovf.count() == 16L * ClusterSize)
    assert(ovf.select("band", "bkey").distinct().count() == 16)
  }

  test("simHash chunk cap drops the identical-hash cluster, keeps small buckets") {
    // all ClusterSize identical docs share one simhash -> 4 chunk buckets of
    // ClusterSize; with the cap no pair from the cluster survives, while
    // near-dups among the 2000 unique docs still pair
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3, maxBucket = 100)
      .collect()
    assert(!pairs.exists(r => r.getLong(0) < ClusterSize && r.getLong(1) < ClusterSize))
  }

  test("token df cap keeps the inverted-index join sub-quadratic") {
    // boilerplate tokens have df = 5000+: with maxDf=100 they are dropped from
    // the token sets, so the cluster contributes zero join rows
    val pairs = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.5, maxDf = 100)
    assert(pairs.count() == 0)
    // without the cluster the same threshold finds the all-identical pairs
    val small = Dedup.tokenJaccardPairs(
      docs.filter($"doc_id" < 40), "doc_id", "text", 0.5, maxDf = 100000)
    assert(small.count() == 40L * 39 / 2)
  }

  test("lshNeighbors bucket cap bounds pairs for an identical-vector cluster") {
    val vec = Array.fill(16)(0.5f)
    val dupVecs = (0 until 3000).map(i => (i.toLong, vec))
    val uniqVecs = (3000 until 3200).map { i =>
      (i.toLong, Array.tabulate(16)(d => graft.extract.Synth.mix64(i * 31L + d).toFloat / Long.MaxValue))
    }
    val df = (dupVecs ++ uniqVecs).toDF("vec_id", "embedding")
    val pairs = Similarity.lshNeighbors(df, "vec_id", "embedding",
      nPlanes = 8, nTables = 2, minSim = 0.9, maxBucket = 100)
    // identical vectors all land in the same bucket per table (> cap) -> dropped
    assert(!pairs.collect().exists(r => r.getLong(0) < 3000 && r.getLong(1) < 3000))
  }

  test("unigram LM on a hot-token corpus: pair-keyed shuffle, no token-key join") {
    // one stop word dominates every document (zipf head). The fixed plan
    // aggregates to (doc, tok, cnt) BEFORE any token-keyed work, so the
    // occurrence count never rides a shuffle keyed on the hot token — the
    // corpus-sized exchange is keyed on the hash-spread (doc, token) pair and
    // the freq table comes back as a broadcast, never a shuffle join.
    val hot = (0L until 200L).map { i =>
      (i, ("the " * 500) + s"rare$i unique$i")
    }.toDF("doc_id", "text")
    val scored = graft.textops.TextOps.unigramLogProb(hot, "doc_id", "text")
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"hot token key reached a shuffle join:\n$plan")
    // value check: every doc has 500 'the' + 2 singletons; total = 200*502;
    // fixed-point model: integer micro-nat per-token quants, exact fold
    val total = 200.0 * 502
    def q(p: Double) = BigDecimal(-math.log(p) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect =
      (500L * q((200.0 * 500) / total) + 2L * q(1.0 / total)).toDouble /
        (502.0 * 1e6)
    val got = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == expect), s"got ${got(0L)} want $expect")
  }

  test("dedupLines on a hot-line corpus: argmin aggregation, window parity") {
    // one cookie-banner line appears in EVERY document (the 10^9-page case
    // at fleet scale): the argmin-aggregation form must pick the identical
    // survivor set the window form defines, with no Window in the plan —
    // the hot line collapses map-side in the partial min
    val hotDocs = (0L until 3000L).map(i =>
      (i, s"unique opener $i\naccept all cookies to continue\nunique body $i"))
      .toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val agg = Dedup.dedupLines(hotDocs, "doc_id", "text")
    assert(canon(agg) == canon(Dedup.dedupLinesWindow(hotDocs, "doc_id", "text")))
    // doc 0 keeps the banner; every other doc keeps only its unique lines
    val rows = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 3L && rows(1L) == 2L && rows.size == 3000)
    assert(!agg.queryExecution.executedPlan.toString.contains("Window"),
      "hot line reached a per-hash window")
  }

  test("shingleOverlap hot-shingle split: parity with the unsplit join") {
    // one trigram shared by every document (the zipf-head boilerplate key):
    // with hotDf small enough to bind, the hot instances take the broadcast
    // semi-join path — the output must be identical to the unsplit form
    val d = (0L until 400L).map(i =>
      (i, s"all rights reserved unique$i tail$i word$i more$i end$i"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val split = graft.textops.TextOps.shingleOverlap(d, "doc_id", "text", hotDf = 10L)
    val unsplit = graft.textops.TextOps.shingleOverlap(d, "doc_id", "text")
    assert(canon(split) == canon(unsplit))
    // the shared boilerplate trigrams really did cross the threshold
    assert(canon(split).forall(_._3 > 0.0))
  }

  test("bigramLogProb hot-bigram split: parity, zipf head broadcasts") {
    // one bigram ("all rights") in every document — the zipf-head key whose
    // pair rows must NEVER meet a shuffled join. With hotDf binding, the hot
    // score rides the broadcast; the cold tail (each key df <= hotDf)
    // shuffles. Output must equal the effectively-unsplit form.
    val d = (0L until 500L).map(i =>
      (i, s"all rights reserved u$i v$i w$i")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val split = graft.textops.TextOps.bigramLogProb(d, "doc_id", "text", hotDf = 10L)
    val unsplit = graft.textops.TextOps.bigramLogProb(d, "doc_id", "text")
    assert(canon(split) == canon(unsplit))
    assert(canon(split).size == 500)
  }

  test("capPerDomain on a 90%-hot domain: bounded aggregation, window parity") {
    // a content-farm domain holding 90% of the corpus — the exact case the
    // cap exists for, and the case the full-domain window serializes on one
    // reducer. The bounded form must (a) plan no Window over the corpus and
    // (b) pick the IDENTICAL survivor set the window form defines.
    val hot = (0L until 9000L).map(i => (i, s"farm doc $i", "megafarm.example"))
    val cold = (9000L until 10000L).map(i => (i, s"doc $i", s"host${i % 50}.example"))
    val df = (hot ++ cold).toDF("doc_id", "text", "domain")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "domain", "domain_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val agg = graft.textops.TextOps.capPerDomain(df, "doc_id", "domain", cap = 15, seed = 7L)
    val win = graft.textops.TextOps.capPerDomainWindow(df, "doc_id", "domain", cap = 15, seed = 7L)
    val a = canon(agg)
    assert(a == canon(win))
    assert(a.count(_._2 == "megafarm.example") == 15)
    assert(!agg.queryExecution.executedPlan.toString.contains("Window"),
      "hot domain reached a full-partition window")
  }

  test("neighborJaccard: celebrity hub generates ZERO pairs; real cluster unaffected") {
    // star: one hub adjacent to 3000 spokes (quadratic pair fan-out if not
    // capped: ~4.5M pairs); plus a genuine 4-clique whose pairs must survive
    val star = (0 until 3000).map(i => ("hub", s"spoke$i"))
    val clique = Seq(("c1", "c2"), ("c1", "c3"), ("c1", "c4"),
      ("c2", "c3"), ("c2", "c4"), ("c3", "c4"))
    val ts = (star ++ clique).map { case (s, o) => (s, 0, "p", o, 0) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = graft.kg.GraphOps.neighborJaccard(ts, maxDeg = 64L, minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // spokes' only neighbor is the excluded hub → no spoke pairs at all;
    // each clique pair shares the other TWO clique members
    assert(got == Set(("c1", "c2"), ("c1", "c3"), ("c1", "c4"),
      ("c2", "c3"), ("c2", "c4"), ("c3", "c4")))
  }

  test("stripHostBoilerplate on a 90%-hot host: salted parity, correct strip") {
    // one content-farm host holds 4500 pages, all sharing a banner (the
    // hot (host, line) key the salting exists for); 500 pages spread over
    // 50 small hosts where the banner is NOT frequent enough host-locally
    val hot = (0L until 4500L).map(i => (i, "farm.example.org",
      s"mega banner line\narticle $i"))
    val cold = for (k <- 0L until 50L; m <- 0L until 10L) yield {
      val i = 4500L + k * 10L + m
      val line = if (m == 0) "mega banner line" else s"cold prose $i"
      (i, s"host$k.example.net", s"$line\nbody $i")
    }
    val df = (hot ++ cold).toDF("doc_id", "host", "text")
    val strip = graft.textops.TextOps.stripHostBoilerplate(
      df, "doc_id", "host", "text", minPages = 2L, fracNum = 3L, fracDen = 5L)
    val got = strip.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every farm page loses exactly the banner; cold hosts keep it (each
    // cold host has 10 pages, banner on 1 of 10 < 3/5)
    assert(got(0L) == "article 0" && got(4499L) == "article 4499")
    assert(got(4500L) == "mega banner line\nbody 4500")
    assert(got.size == 5000)
    // a different salt level must produce the identical corpus
    val s4 = graft.textops.TextOps.stripHostBoilerplate(
        df, "doc_id", "host", "text", 2L, 3L, 5L, salt = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s4 == got)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    // The runtime half of the skew story: salting handles keys we KNOW are
    // hot (prefix counts, boilerplate joins); AQE's OptimizeSkewedJoin
    // handles the ones we don't. Pin that the engine config actually
    // triggers it: a 90%-one-key join must show skew=true in the final
    // adaptive plan once the hot partition passes the (test-sized)
    // thresholds.
    import org.apache.spark.sql.{functions => F}
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 200000, 1, 16)
        .select(
          F.when(F.col("id") % 10 =!= 0, F.lit(0L)).otherwise(F.col("id")).as("k"),
          F.lpad(F.col("id").cast("string"), 64, "x").as("pad"))
      val right = spark.range(0, 1000, 1, 4).select(F.col("id").as("k"),
        F.lit(1L).as("w"))
      val joined = left.join(right, "k").agg(F.count(F.lit(1)))
      val n = joined.collect()(0).getLong(0)
      // 180000 hot-key rows + id=0 (also k=0) + 99 spread ids 10..990
      assert(n == 180100L, s"join row count wrong: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
