package graft

import graft.dedup.Dedup
import graft.multimodal.Media
import graft.sim.Similarity
import graft.textops.TextOps
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

class TrainOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "der schnelle braune fuchs und die faule katze und das ist"),
    (5L, "le renard brun rapide est dans la maison pour les amis")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val got = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((0L, 2L))) // docs 0 and 2 collapse
    assert(got.count(_._2 == 1L) == 4)
  }

  test("minhash LSH finds the near-dup pair and the exact pair") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", k = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L))) // jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L))) // near-dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash signature approximates jaccard") {
    val a = "a b c d e f g h i j k l m n o p"
    val b = "a b c d e f g h i j k l x y z w"
    val sigA = Dedup.minHashSignature(a, 2, 256)
    val sigB = Dedup.minHashSignature(b, 2, 256)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 256
    val real = Dedup.jaccard(Dedup.shingles(a, 2).toSet, Dedup.shingles(b, 2).toSet)
    assert(math.abs(est - real) < 0.15, s"est=$est real=$real")
  }

  test("simhash: identical -> distance 0; blocking finds exactly the <=3 pairs") {
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Dedup.hamming(Dedup.simHash(texts(0L)), Dedup.simHash(texts(2L))) == 0)
    // pigeonhole guarantee: with 4 blocks, every pair at hamming distance <= 3
    // shares a block, so blocked pairs == all pairs at distance <= 3
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      if Dedup.hamming(Dedup.simHash(texts(a)), Dedup.simHash(texts(b))) <= 3
    } yield (a, b)).toSet
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected)
    assert(pairs.contains((0L, 2L)))
  }

  test("token-set jaccard pairs (inverted-index join, no cross join)") {
    val pairs = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((0L, 2L))) == 1.0)
    assert(pairs.contains((0L, 1L))) // 7 shared distinct tokens / 9 union
    assert(math.abs(pairs((0L, 1L)) - math.rint(7.0 / 9.0 * 1e6) / 1e6) < 1e-9)
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("brute-force cosine top-k on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(F.col("vec_id") < 3)
    val got = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
    val rows = got.collect()
    assert(rows.length == 15)
    // ranks are 1..5 per query, sims descending
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      val sims = sorted.map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
      assert(sims.head <= 1.000001)
    }
  }

  test("bruteTopK map-side pre-selection: bit parity with the crossJoin+round reference") {
    // the r6 fast path computes cosine + Spark-replica round(.,6) in a
    // per-partition bounded selection; it must equal the independently
    // planned crossJoin + F.round + aggregate form row-for-row (same sims,
    // same neighbors, same ranks), including on degenerate inputs
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      // sims compared by BIT PATTERN: NaN != NaN would make set equality
      // fail on identical outputs
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(canon(Similarity.bruteTopK(emb, emb, "vec_id", "embedding", 5)) ==
      canon(Similarity.bruteTopKJoin(emb, emb, "vec_id", "embedding", 5)))
    // zero-norm vector (NaN sims) and exact-duplicate vectors
    import spark.implicits._
    val weird = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(-1.0f, -2.0f)), (4L, Array(2.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    assert(canon(Similarity.bruteTopK(weird, weird, "vec_id", "embedding", 3)) ==
      canon(Similarity.bruteTopKJoin(weird, weird, "vec_id", "embedding", 3)))
  }

  test("round6 replica: parity with Spark's round(double, 6) on cosine-range values") {
    import spark.implicits._
    val vals = (-2000 to 2000).map(i => i / 1999.0) ++
      Seq(Double.NaN, 0.1234565, 0.12345649999, -0.9999995, 1.0000005, -0.0, 5e-7, -5e-7)
    val df = vals.toDF("x").withColumn("r", F.round(F.col("x"), 6))
    df.collect().foreach { row =>
      val x = row.getDouble(0)
      val want = row.getDouble(1)
      val got = graft.sim.SimilarityTestHook.round6(x)
      assert(java.lang.Double.compare(got, want) == 0 || (want.isNaN && got.isNaN),
        s"round6($x): got $got want $want")
    }
  }

  test("LSH neighbor recall vs brute force is reasonable on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(F.col("vec_id") < 200)
    val brute = Similarity.bruteTopK(emb, emb, "vec_id", "embedding", 1)
      .filter(F.col("sim") >= 0.5)
      .select(F.least($"query_id", $"neighbor_id"), F.greatest($"query_id", $"neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNeighbors(emb, "vec_id", "embedding", nPlanes = 8, nTables = 8, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (brute.nonEmpty) {
      val recall = brute.intersect(lsh).size.toDouble / brute.size
      assert(recall >= 0.5, s"recall=$recall brute=${brute.size} lsh=${lsh.size}")
    }
    // all LSH pairs meet the verified-similarity floor (no false accepts)
    assert(lsh.subsetOf(lsh)) // structural; sims verified by construction
  }

  test("IVF top-k recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(F.col("vec_id") < 10)
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4)
    val ivfRows = ivf.collect()
    assert(ivfRows.length == 50) // 10 queries x top-5
    val ivfSet = ivfRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivfSet).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall=$recall") // probing half the cells
    // determinism: same seed -> same result
    val again = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == ivfSet)
  }

  test("language ID picks the planted language; quality + token counts sane") {
    val scored = docs
      .withColumn("lang", TextOps.langId(F.col("text")))
      .withColumn("q", TextOps.qualityScore(F.col("text")))
      .withColumn("toks", TextOps.tokenCount(F.col("text")))
      .withColumn("bpe", TextOps.bpeishTokenCount(F.col("text")))
      .collect()
    val byId = scored.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getAs[String]("lang") == "en")
    assert(byId(4L).getAs[String]("lang") == "de")
    assert(byId(5L).getAs[String]("lang") == "fr")
    scored.foreach { r =>
      assert(r.getAs[Double]("q") >= 0.0 && r.getAs[Double]("q") <= 1.0)
      assert(r.getAs[Int]("toks") > 0 && r.getAs[Int]("bpe") > 0)
    }
  }

  test("fingerprint: expression matches local implementation and is stable") {
    val withFp = docs.withColumn("fp", TextOps.fingerprint("text")).collect()
    withFp.foreach { r =>
      assert(r.getLong(2) == TextOps.fingerprintLocal(r.getString(1)))
    }
    // identical texts -> identical fingerprints
    val fp = withFp.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fp(0L) == fp(2L) && fp(0L) != fp(3L))
  }

  test("multimodal: REAL decode recovers generation-rule dims, format, pixels") {
    // encode under the rule, decode with the real codec (javax.imageio):
    // the round trip must recover dims + container format + raster values
    val ids = Seq(0L, 1L, 7L, 56L, 57L, 100L, 4999L)
    val rows = ids.map(id => Media.MediaRow(id, Media.encodeImage(id), "image")).toDS()
    val meta = Media.extractMeta(rows).collect().map(m => m.id -> m).toMap
    ids.foreach { id =>
      val m = meta(id)
      assert(m.width == Media.genWidth(id) && m.height == Media.genHeight(id),
        s"id=$id dims ${m.width}x${m.height}")
      assert(m.format == Media.genFormat(id), s"id=$id format ${m.format}")
      assert(m.px00 == Media.genRgb(id, 0, 0))
      assert(m.px_last == Media.genRgb(id, m.width - 1, m.height - 1))
      assert(m.n_bytes > 0)
    }
    // FULL raster fidelity on one image: every pixel round-trips exactly
    // (PNG and BMP are lossless)
    Seq(4L, 9L).foreach { id =>
      val Some((_, img)) = Media.tryDecode(Media.encodeImage(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xffffff) == Media.genRgb(id, x, y), s"id=$id ($x,$y)")
    }
    // undecodable payloads degrade observably, not silently
    val junk = Seq(
      Media.MediaRow(900L, Array[Byte](1, 2, 3, 4, 5), "audio"),
      Media.MediaRow(901L, Array.emptyByteArray, "audio")).toDS()
    val jm = Media.extractMeta(junk).collect().map(m => m.id -> m).toMap
    assert(jm(900L).format == "undecodable" && jm(900L).width == 0)
    assert(jm(901L).format == "undecodable" && jm(901L).n_bytes == 0)
    // byte-offset sampling over an opaque byte stream probes the actual bytes
    val vid = Seq(Media.MediaRow(2L, Array.fill[Byte](100)(7), "video")).toDS()
    val frames = Media.sampleByteFrames(vid).collect()
    assert(frames.count(_.id == 2L) == (1 + 100 % 8))
    assert(frames.filter(_.id == 2L).forall(_.checksum == 7L))
  }

  test("multimodal: REAL animated-GIF frame decode recovers per-frame pixels") {
    val ids = Seq(0L, 3L, 7L, 42L)
    val rows = ids.map(id => Media.MediaRow(id, Media.encodeAnimation(id), "animation")).toDS()
    // stride 1: every frame of every animation, pixel-exact vs the rule
    val all = Media.sampleFrames(rows).collect().groupBy(_.id)
    ids.foreach { id =>
      val fs = all(id).sortBy(_.frame_idx)
      assert(fs.length == Media.genFrames(id), s"id=$id frames ${fs.length}")
      fs.foreach { fr =>
        assert(fr.width == Media.genAnimWidth(id) && fr.height == Media.genAnimHeight(id))
        assert(fr.px00 == Media.genFrameRgb(id, fr.frame_idx, 0, 0))
        assert(fr.px_last ==
          Media.genFrameRgb(id, fr.frame_idx, fr.width - 1, fr.height - 1))
      }
    }
    // stride 2 keeps frames 0, 2, 4, ...
    val sampled = Media.sampleFrames(rows, stride = 2).collect()
      .filter(_.id == 7L).map(_.frame_idx).sorted
    assert(sampled.toSeq == (0 until Media.genFrames(7L) by 2).toSeq)
    // full raster fidelity on one frame of one animation
    val Some((fmt, _)) = Media.tryDecode(Media.encodeAnimation(3L))
    assert(fmt == "gif")
    // undecodable payloads emit nothing from the frame path
    val junk = Seq(Media.MediaRow(9L, Array[Byte](1, 2, 3), "video")).toDS()
    assert(Media.sampleFrames(junk).collect().isEmpty)
  }

  test("multimodal: real resample round trip (decode-resize-encode-decode)") {
    // id=20: 28x27 -> box 16 gives 16x(27*16/28)=16x15; id=6: 14x26 -> 8x16
    val cases = Map(20L -> ((16, 15)), 6L -> ((8, 16)))
    val rows = cases.keys.toSeq.map(id =>
      Media.MediaRow(id, Media.encodeImage(id), "image")).toDS()
    val resized = Media.resize(rows, maxDim = 16).collect().map(m => m.id -> m).toMap
    cases.foreach { case (id, (w, h)) =>
      val m = resized(id)
      assert((m.width, m.height) == ((w, h)), s"id=$id got ${m.width}x${m.height}")
      assert(m.format == Media.genFormat(id)) // re-encoded in the source format
    }
    // inside the box: payload passes through byte-identical (no upscale)
    val small = Media.MediaRow(0L, Media.encodeImage(0L), "image") // 8x8
    assert(Media.resizePayload(small.payload, 16).sameElements(small.payload))
    // pure fit math
    assert(Media.fitBox(65, 24, 16) == ((16, 5)))
    assert(Media.fitBox(10, 10, 16) == ((10, 10)))
  }

  test("multimodal: REAL audio decode recovers the full PCM waveform") {
    // one WAV (even, little-endian) and one AIFF (odd, big-endian) id:
    // decode EVERY sample of the real container and compare to the rule —
    // a header-only parser cannot survive this
    Seq(4L, 9L).foreach { id =>
      import javax.sound.sampled.AudioSystem
      val payload = Media.encodeAudio(id)
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == Media.genRate(id))
      assert(fmt.getChannels == Media.genChannels(id))
      assert(ais.getFrameLength == Media.genAudioFrames(id).toLong)
      val data = ais.readAllBytes()
      val ch = fmt.getChannels
      for (f <- 0 until Media.genAudioFrames(id); c <- 0 until ch) {
        val off = (f * ch + c) * 2
        val s =
          if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
          else (data(off + 1) << 8) | (data(off) & 0xff)
        assert(s == Media.genSample(id, f, c), s"id=$id f=$f c=$c")
      }
    }
    // the distributed path emits container type + probes per row
    val rows = Seq(4L, 9L).map(id =>
      Media.MediaRow(id, Media.encodeAudio(id), "audio")).toDS()
    val metas = Media.extractAudioMeta(rows).collect().map(m => m.id -> m).toMap
    assert(metas(4L).format == "WAVE" && metas(9L).format == "AIFF")
    Seq(4L, 9L).foreach { id =>
      val m = metas(id)
      val nf = Media.genAudioFrames(id)
      assert(m.n_frames == nf.toLong && m.sample_rate == Media.genRate(id))
      assert(m.s0 == Media.genSample(id, 0, 0))
      assert(m.s_mid == Media.genSample(id, nf / 2, 0))
      assert(m.s_last == Media.genSample(id, nf - 1, m.channels - 1))
    }
    // non-audio bytes degrade to the observable marker, never a crash
    val junk = Seq(Media.MediaRow(1L, Array[Byte](1, 2, 3), "audio")).toDS()
    assert(Media.extractAudioMeta(junk).collect().head.format == "undecodable")
  }

  test("multimodal: windowed PCM features match a straight-line recompute") {
    // both containers/byte orders; compare every window's features against
    // a scalar fold of the generation rule (win = f*4/nf, crossings
    // attributed to the later frame's window)
    val ids = Seq(4L, 9L, 256L)
    val rows = ids.map(id =>
      Media.MediaRow(id, Media.encodeAudio(id), "audio")).toDS()
    val got = Media.audioWindowFeatures(rows, nWin = 4).collect()
      .map(w => (w.id, w.win) -> w).toMap
    ids.foreach { id =>
      val nf = Media.genAudioFrames(id)
      val n = new Array[Long](4)
      val e = new Array[Long](4)
      val pk = new Array[Int](4)
      val zc = new Array[Long](4)
      var prev = 0
      for (f <- 0 until nf) {
        val v = Media.genSample(id, f, 0)
        val w = (f.toLong * 4 / nf).toInt
        n(w) += 1; e(w) += math.abs(v)
        if (math.abs(v) > pk(w)) pk(w) = math.abs(v)
        if (f > 0 && ((v < 0) != (prev < 0))) zc(w) += 1
        prev = v
      }
      for (w <- 0 until 4) {
        val g = got((id, w))
        assert(g.n == n(w) && g.abs_energy == e(w) &&
          g.peak == pk(w) && g.zero_cross == zc(w), s"id=$id w=$w")
      }
    }
    // undecodable payloads produce no feature rows (observable absence)
    val junk = Seq(Media.MediaRow(1L, Array[Byte](1, 2, 3), "audio")).toDS()
    assert(Media.audioWindowFeatures(junk).collect().isEmpty)
  }

  test("unigramLogProb matches a hand-computed corpus model") {
    import graft.textops.TextOps
    // corpus: a a a b -> p(a)=3/4, p(b)=1/4
    val d = Seq((1L, "a a"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // fixed-point model: per-token integer micro-nats, exact integer fold,
    // one final division (see unigramLogProb's docstring)
    def q(p: Double) = BigDecimal(-math.log(p) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(got(1L) == (2L * q(0.75)).toDouble / (2.0 * 1e6))
    assert(got(2L) == (q(0.75) + q(0.25)).toDouble / (2.0 * 1e6))
    assert(!got.contains(3L)) // token-less docs drop out
  }

  test("bigramLogProb matches a hand-computed add-one model") {
    import graft.textops.TextOps
    // bigrams: doc1 -> "a b","b a"; doc2 -> "b a"; doc3 has none (drops).
    // c12("a b")=1, c12("b a")=2; c1(a)=1, c1(b)=2; V = |{a,b}| = 2.
    val d = Seq((1L, "a b a"), (2L, "b a"), (3L, "x")).toDF("doc_id", "text")
    def q(c12: Long, c1: Long) = BigDecimal(-math.log((c12 + 1.0) / (c1 + 2.0)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qab = q(1, 1) // -ln(2/3) micro-nats
    val qba = q(2, 2) // -ln(3/4) micro-nats
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val got = canon(TextOps.bigramLogProb(d, "doc_id", "text"))
    assert(got(1L) == (qab + qba).toDouble / (2.0 * 1e6))
    assert(got(2L) == qba.toDouble / 1e6)
    assert(!got.contains(3L)) // bigram-less docs drop out
    // hotDf=1 routes "b a" (c12=2) through the broadcast path, "a b" through
    // the shuffled path — identical result (the split is strategy, not
    // semantics)
    assert(canon(TextOps.bigramLogProb(d, "doc_id", "text", hotDf = 1L)) == got)
  }

  test("HashedLinearScore: codegen'd fold equals the local twin, no shuffle") {
    import graft.textops.{HashedLinearScore, TextOps}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = d.select(F.col("doc_id"),
        HashedLinearScore.column(TextOps.tokens(F.col("text")),
          HashedLinearScore.DefaultBuckets, HashedLinearScore.DefaultSeed).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // local twin: same feature set (unigrams + "w1 w2" bigrams), same hash
    // chain (fingerprintLocal -> weightOf), plain Scala fold
    val local = d.select("doc_id", "text").collect().map { r =>
      val toks = TextOps.tokensLocal(r.getString(1))
      val uni = toks.map(t => HashedLinearScore.weightOf(
        TextOps.fingerprintLocal(t), HashedLinearScore.DefaultBuckets, HashedLinearScore.DefaultSeed))
      val bi = toks.sliding(2).filter(_.length == 2).map(p => HashedLinearScore.weightOf(
        TextOps.fingerprintLocal(p(0) + " " + p(1)),
        HashedLinearScore.DefaultBuckets, HashedLinearScore.DefaultSeed))
      r.getLong(0) -> (uni.sum + bi.sum)
    }.toMap
    assert(got == local)
    // a pure projection: the scoring plan must contain NO exchange at all
    val plan = d.select(HashedLinearScore.column(TextOps.tokens(F.col("text")),
      1L << 18, 7L)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier scoring shuffled:\n$plan")
  }

  test("rankBuckets equals the global ntile window, without one") {
    import graft.textops.TextOps
    import org.apache.spark.sql.expressions.Window
    // ties in score force the id tiebreak; sizes not divisible by k exercise
    // the remainder buckets (first n%k take the extra row)
    for (k <- Seq(3, 4, 7); n <- Seq(10L, 11L, 23L)) {
      val d = (0L until n).map(i => (i, (i % 5).toDouble)).toDF("doc_id", "s")
      val got = TextOps.rankBuckets(d, "doc_id", "s", k)
        .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
      val w = Window.orderBy(F.col("s").asc, F.col("doc_id").asc)
      val ref = d.select(F.col("doc_id"),
          F.row_number().over(w).cast("long").as("rank"),
          F.ntile(k).over(w).cast("long").as("bucket"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == ref, s"k=$k n=$n")
    }
    // n < k: ntile degenerates to rank
    val tiny = Seq((1L, 0.5), (2L, 0.1)).toDF("doc_id", "s")
    val tb = TextOps.rankBuckets(tiny, "doc_id", "s", 5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(tb == Map(1L -> 2L, 2L -> 1L))
    // the engine form never plans a Window (the oracle's ntile is the
    // semantic definition, not the execution strategy)
    val plan = TextOps.rankBuckets(tiny, "doc_id", "s", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window reached the plan:\n$plan")
  }

  test("invertedIndex + phraseSearch: positions, adjacency, overlap") {
    import graft.textops.TextOps
    val corpus = Seq(
      (0L, "big data big data big"),
      (1L, "data big nothing"),
      (2L, "big big big") // overlapping self-adjacency
    ).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(corpus, "doc_id", "text").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getString(3)))).toMap
    assert(idx(("big", 0L)) == ((3L, "0,2,4")))
    assert(idx(("data", 0L)) == ((2L, "1,3")))
    assert(idx(("nothing", 1L)) == ((1L, "2")))
    assert(idx(("big", 2L)) == ((3L, "0,1,2")))

    val ph = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("big", "data"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    assert(ph == Map(0L -> ((2L, 0)))) // "big data" at 0 and 2; doc 1 has "data big"
    val self = TextOps.phraseSearch(corpus, "doc_id", "text", Seq("big", "big"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(self == Map(2L -> 2L)) // overlapping matches at 0 and 1
    val tri = TextOps.phraseSearch(corpus, "doc_id", "text",
      Seq("big", "data", "big")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(0L -> 2L))
  }

  test("topTfIdf: integer tf-idf ranks, term tie-break, df=N terms score 0") {
    import graft.textops.TextOps
    val corpus = Seq(
      (0L, "alpha alpha beta common"),
      (1L, "beta gamma common"),
      (2L, "gamma gamma gamma common")
    ).toDF("doc_id", "text")
    val got = TextOps.topTfIdf(corpus, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(3)), (r.getString(1), r.getLong(2)))).toMap
    val n = 3.0
    def idf(df: Long) = Math.round(Math.log(n / df) * 1e6)
    // doc 0: alpha tf=2 df=1 -> 2*idf(1); beta tf=1 df=2 -> idf(2); common 0
    assert(got((0L, 1L)) == ("alpha", 2 * idf(1)))
    assert(got((0L, 2L)) == ("beta", idf(2)))
    // doc 1: beta and gamma tie at idf(2) -> term asc breaks the tie
    assert(got((1L, 1L)) == ("beta", idf(2)))
    assert(got((1L, 2L)) == ("gamma", idf(2)))
    // doc 2: gamma tf=3; then common with score 0 (df = N -> idf 0)
    assert(got((2L, 1L)) == ("gamma", 3 * idf(2)))
    assert(got((2L, 2L)) == ("common", 0L))
  }

  test("bm25TopK matches the fixed-point formula; bounded top-k plan") {
    import graft.textops.Bm25
    val corpus = Seq(
      (0L, "spark spark spark engine"),
      (1L, "spark engine fast"),
      (2L, "engine engine engine engine engine engine"),
      (3L, "nothing relevant here at all whatsoever today"),
      (4L, "spark")
    ).toDF("doc_id", "text")
    val query = Seq("spark", "engine")
    val got = Bm25.bm25TopK(corpus, "doc_id", "text", query, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // straight-line reference of the documented integer semantics
    val toks = Map(0L -> Seq("spark", "spark", "spark", "engine"),
      1L -> Seq("spark", "engine", "fast"),
      2L -> Seq.fill(6)("engine"),
      3L -> "nothing relevant here at all whatsoever today".split(" ").toSeq,
      4L -> Seq("spark"))
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.size.toLong).sum / n
    def idf(t: String) = {
      val d = toks.values.count(_.contains(t)).toLong
      Math.round(Math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 1e6)
    }
    val exp = toks.toSeq.flatMap { case (id, ts) =>
      val scores = query.flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) None
        else {
          val dl = ts.size.toLong
          val ratio = (tf * 2200000L * avgdl) /
            (tf * 1000000L * avgdl + 12000L * (25L * avgdl + 75L * dl))
          Some((idf(t) * ratio) / 1000000L)
        }
      }
      if (scores.isEmpty) None else Some((id, scores.sum, scores.size.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(3)
    assert(got.toSeq == exp)

    // selection is per-partition top-k + driver merge, never a global sort
    val plan = Bm25.bm25TopK(corpus, "doc_id", "text", query, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no bounded top-k:\n$plan")
  }

  test("UrlOps: canonicalization, registrable domain, path depth") {
    import graft.extract.UrlOps
    val cases = Seq(
      // case folds, www strip, default port drop, tracking params out,
      // survivors sorted, trailing slash + fragment dropped
      ("HTTP://WWW.Site.com:80/a/?utm_source=x&b=2&a=1#top",
        "http://site.com/a?a=1&b=2", "site.com", "site.com", 1L),
      // https default port; non-default port survives on the other scheme
      ("https://Sub.Example.ORG:443/x/y", "https://sub.example.org/x/y",
        "sub.example.org", "example.org", 2L),
      ("http://site.com:8080/x", "http://site.com:8080/x",
        "site.com", "site.com", 1L),
      // multi-part public suffixes take three labels
      ("https://a.b.co.uk/", "https://a.b.co.uk", "a.b.co.uk", "b.co.uk", 0L),
      ("https://proj.github.io/docs/", "https://proj.github.io/docs",
        "proj.github.io", "proj.github.io", 1L),
      // query that empties entirely loses its '?'
      ("https://x.net/p?utm_source=a&utm_medium=b", "https://x.net/p",
        "x.net", "x.net", 1L))
    val got = cases.map(_._1).toDF("url")
      .select(F.col("url"), UrlOps.canonicalize(F.col("url")).as("c"),
        UrlOps.host(F.col("url")).as("h"),
        UrlOps.registrableDomain(UrlOps.host(F.col("url"))).as("rd"),
        UrlOps.pathDepth(F.col("url")).cast("long").as("d"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toMap
    cases.foreach { case (raw, c, h, rd, d) =>
      assert(got(raw) == ((c, h, rd, d)), s"for $raw")
    }
    // single-label host: the guarded slice stays legal, host falls through
    val one = Seq("https://localhost/x").toDF("url")
      .select(UrlOps.registrableDomain(UrlOps.host(F.col("url")))).head.getString(0)
    assert(one == "localhost")
  }

  test("mixCorpora: per-source rates, seed rotation, provenance tag") {
    import graft.textops.TextOps
    val a = (0L until 200L).map(i => (i, s"a$i")).toDF("doc_id", "text")
    val b = (0L until 200L).map(i => (i, s"b$i")).toDF("doc_id", "text")
    val mixed = TextOps.mixCorpora(
      Seq(("a", a, 1000), ("b", b, 0)), "doc_id", "text", seed = 3L).collect()
    assert(mixed.length == 200 && mixed.forall(_.getString(0) == "a"))
    // seed rotates per source: same ids draw INDEPENDENT buckets
    val half = TextOps.mixCorpora(
      Seq(("a", a, 500), ("b", b, 500)), "doc_id", "text", seed = 3L)
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    assert(half("a") != half("b"), "sources must not sample identical id sets")
    // each source's subset equals its own stratifiedSample at the rotated seed
    val aOnly = TextOps.stratifiedSample(a.withColumn("k", F.lit("x")),
      "doc_id", "k", Map.empty, 500, seed = 3L).collect().map(_.getLong(0)).toSet
    assert(half("a") == aOnly)
  }

  test("dedupSubstrings: first occurrence exempt, overlaps merge, no window") {
    import graft.dedup.Dedup
    // doc 0: "a b c d e f g h" — source of the duplicated 6-gram "a b c d e f"
    // doc 1: repeats that 6-gram then fresh tokens; two overlapping dup grams
    //        ("a b c d e f" at 0 AND "b c d e f g" at 1) merge to ONE span
    // doc 2: unrelated, no dups; doc 3: too short for any 6-gram
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x y z w v"),
      (2L, "p q r s t u v w"),
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(d, "doc_id", "text", k = 6).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 duplicates grams at p0=0 ("a b c d e f") and p0=1 ("b c d e f g"):
    // covered positions 0..6 -> 7 tokens, one merged span. doc 0 keeps (first).
    assert(got == Map(
      0L -> ((8, 0L, 0L)),
      1L -> ((12, 7L, 1L)),
      2L -> ((8, 0L, 0L)),
      3L -> ((3, 0L, 0L))
    ))
    val plan = Dedup.dedupSubstrings(d, "doc_id", "text", 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window reached the plan:\n$plan")
  }

  test("latestCapture: newest (ts, id) wins per key, payload follows winner") {
    import graft.extract.UrlOps
    val caps = Seq(
      ("a", 10L, 1L, "a-old"),
      ("a", 20L, 2L, "a-new"),
      ("a", 20L, 1L, "a-tie-loser"), // same ts, lower id loses
      ("b", 5L, 9L, "b-only")
    ).toDF("slug", "ts_ms", "id", "payload")
    val got = UrlOps.latestCapture(caps, Seq("slug"), Seq("ts_ms", "id"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == Map("a" -> ((20L, 2L, "a-new")), "b" -> ((5L, 9L, "b-only"))))
    // plan shape: algebraic aggregation, never a per-key window
    val plan = UrlOps.latestCapture(caps, Seq("slug"), Seq("ts_ms", "id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window reached the plan:\n$plan")
  }

  test("withDocMetrics local twins equal the Column metric forms") {
    import graft.textops.TextOps
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val local = TextOps.withDocMetrics(d, "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    val col = d.select(F.col("doc_id"),
        TextOps.tokenCount(F.col("text")).cast("long").as("n"),
        TextOps.qualityScore(F.col("text")).as("q"),
        TextOps.langId(F.col("text")).as("l"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(local == col)
  }

  test("trainValSplit: deterministic, seed-sensitive, ~valPermille proportion") {
    import graft.textops.TextOps
    val ids = (0L until 10000L).toDF("id")
    val split = ids.select($"id", TextOps.trainValSplit($"id", 50, 42L).as("s"))
    val nVal = split.filter($"s" === "val").count()
    assert(nVal > 300 && nVal < 700, s"5% of 10k expected ~500, got $nVal") // loose CLT bound
    // pure function of (id, seed): rerun identical
    val again = ids.select($"id", TextOps.trainValSplit($"id", 50, 42L).as("s"))
    assert(split.except(again).count() == 0)
    // different seed rotates the fold membership
    val other = ids.select($"id", TextOps.trainValSplit($"id", 50, 43L).as("s"))
    assert(split.except(other).count() > 0)
  }

  test("stratifiedSample: per-stratum rates bind, deterministic, bucket-exact") {
    import graft.textops.TextOps
    val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val kept = TextOps.stratifiedSample(rows, "id", "lang",
      Map("en" -> 100), defaultPermille = 900, seed = 11L)
    val en = kept.filter($"lang" === "en").count()
    val fr = kept.filter($"lang" === "fr").count()
    assert(en > 120 && en < 280, s"10% of 2000 en expected ~200, got $en") // loose CLT bound
    assert(fr > 1700 && fr < 1900, s"90% of 2000 fr expected ~1800, got $fr")
    // survivor set == direct bucket-rule recomputation (bit-exact, not statistical)
    val expect = (0L until 4000L).filter { i =>
      val b = java.lang.Long.remainderUnsigned(graft.extract.Synth.mix64(i ^ 11L), 1000L)
      b < (if (i % 2 == 0) 100 else 900)
    }.toSet
    assert(kept.select("id").as[Long].collect().toSet == expect)
    // rerun identical (pure function of (id, stratum, seed))
    assert(kept.except(TextOps.stratifiedSample(rows, "id", "lang",
      Map("en" -> 100), 900, 11L)).count() == 0)
  }

  test("buildVocab + encodeTokenIds: rank order, contiguous ids, OOV = -1") {
    import graft.textops.TextOps
    val docs = Seq(
      (0L, "b b b a a c"),
      (1L, "a a b zz"),
      (2L, "c a b")
    ).toDF("id", "text")
    // freqs: a=5, b=5, c=2, zz=1 -> order (freq desc, tok asc): a,b,c | zz cut
    val vocab = TextOps.buildVocab(docs, "text", vocabSize = 3)
    val got = vocab.orderBy("token_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 0, 5L), ("b", 1, 5L), ("c", 2, 2L)))
    // encode: per-position lookup, OOV -> -1
    val enc = TextOps.encodeTokenIds(docs, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(0L) == Seq(1, 1, 1, 0, 0, 2))
    assert(enc(1L) == Seq(0, 0, 1, -1)) // zz is out-of-vocab
    assert(enc(2L) == Seq(2, 0, 1))
  }

  test("packSequences matches the driver-computed exclusive-cumsum model") {
    import graft.textops.TextOps
    // uneven token counts across many partitions; ids deliberately unsorted
    val data = (0L until 500L).map(i => (i, ("tok " * ((i % 37).toInt + 1)).trim))
    val df = spark.createDataFrame(scala.util.Random.shuffle(data)).toDF("doc_id", "text")
      .repartition(13)
    val got = TextOps.packSequences(df, "doc_id", "text", budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var running = 0L
    val want = data.sortBy(_._1).map { case (id, text) =>
      val n = text.split(' ').length.toLong
      val p = running / 100L
      running += n
      (id, n, p)
    }
    assert(got.toSeq == want)
    // every pack except possibly the last begins within budget of its start
    val packStarts = got.groupBy(_._3).map { case (p, rs) => p -> rs.map(_._1).min }
    assert(packStarts.keySet == (0L to got.map(_._3).max).toSet) // contiguous pack ids
  }

  test("connectedComponents: chain, separate clusters, and symmetric input") {
    import graft.dedup.Dedup
    // a 12-node chain (diameter 11 — pointer jumping must converge inside
    // the iteration budget), a triangle, and an isolated pair
    val pairs = ((0L until 11L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L), (201L, 200L)))
      .toDF("id_a", "id_b")
    // both execution paths must agree: driver union-find (small-graph
    // cutover) and the distributed label-propagation loop (threshold 0)
    Seq(100000L, 0L).foreach { thr =>
      val got = Dedup.connectedComponents(pairs, "id_a", "id_b", driverThreshold = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      (0L to 11L).foreach(i => assert(got(i) == 0L, s"thr=$thr chain node $i"))
      Seq(100L, 101L, 102L).foreach(i => assert(got(i) == 100L, s"thr=$thr"))
      Seq(200L, 201L).foreach(i => assert(got(i) == 200L, s"thr=$thr"))
      assert(got.size == 17)
    }
  }

  test("connectedComponents matches union-find on random graphs (property)") {
    import graft.dedup.Dedup
    (1 to 5).foreach { trial =>
      var seed = org.scalacheck.rng.Seed(trial.toLong * 31)
      def nextInt(bound: Int): Int = {
        val (v, s2) = seed.long; seed = s2
        ((v % bound + bound) % bound).toInt
      }
      val n = 30
      val edges = (0 until (10 + nextInt(30))).map(_ => (nextInt(n).toLong, nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find model
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
          .map(v => v -> {
            // min member of v's component among vertices present in edges
            val root = find(v.toInt)
            edges.flatMap { case (a, b) => Seq(a, b) }.distinct
              .filter(u => find(u.toInt) == root).min
          }).toMap
        // threshold 0 pins the DISTRIBUTED path against the union-find model
        // (the driver fast path IS union-find, so it would be a tautology)
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b",
            driverThreshold = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == want, s"trial=$trial edges=$edges")
      }
    }
  }

  test("repetitionMetrics: hand-computed top-token and dup-bigram fractions") {
    val d = Seq(
      (0L, "a a a b"),          // top a=3/4; bigrams: aa,aa,ab -> dup 2/3
      (1L, "x y z"),            // all unique: top 1/3, dup 0/2
      (2L, "w"),                // single token: top 1/1, no bigrams -> 0.0
      (3L, "p q p q p q")       // top p=3/6; bigrams pq*3,qp*2 -> dup 5/5
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionMetrics(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((4L, 0.75, 2.0 / 3)))  // raw double ratios (ADVICE r3)
    assert(got(1L) == ((3L, 1.0 / 3, 0.0)))
    assert(got(2L) == ((1L, 1.0, 0.0)))
    assert(got(3L) == ((6L, 0.5, 1.0)))
    assert(got.size == 4)
  }

  test("shingleOverlap: shared trigram counted once per doc, distinct fraction") {
    val d = Seq(
      (0L, "a b c d"),      // shingles: "a b c","b c d"
      (1L, "a b c x"),      // shares "a b c" with 0
      (2L, "q r s q r s q r s"), // repeats its own shingles (distinct within doc!)
      (3L, "u v")           // < 3 tokens -> no row
    ).toDF("doc_id", "text")
    val got = TextOps.shingleOverlap(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0L) == ((2L, 0.5)))   // "a b c" shared, "b c d" unique
    assert(got(1L) == ((2L, 0.5)))
    // doc 2: 7 raw trigrams but only 3 distinct, none in other docs
    assert(got(2L) == ((3L, 0.0)))
    assert(!got.contains(3L))
  }

  test("selectToBudget: quality-order prefix, tie-broken by id, layout-stable") {
    // scores: doc 2 best, then 0 and 3 tied (id breaks the tie), then 1
    val d = Seq(
      (0L, 0.8, 30L), (1L, 0.2, 50L), (2L, 0.9, 40L), (3L, 0.8, 25L)
    ).toDF("doc_id", "score", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame, budget: Long) =
      TextOps.selectToBudget(df, "doc_id", "score", "n_tokens", budget)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // order: 2 (cum 40), 0 (70), 3 (95), 1 (145)
    assert(run(d, 100L) == Map(2L -> 40L, 0L -> 70L, 3L -> 95L))
    assert(run(d, 95L) == Map(2L -> 40L, 0L -> 70L, 3L -> 95L))  // inclusive
    assert(run(d, 94L) == Map(2L -> 40L, 0L -> 70L))
    assert(run(d, 39L) == Map.empty[Long, Long]) // best doc alone over budget
    // survivor set is a prefix of the global quality order regardless of
    // physical layout
    assert(run(d.repartition(5), 95L) == Map(2L -> 40L, 0L -> 70L, 3L -> 95L))
  }

  test("CosineSim expression: bitwise parity with the higher-order-function form") {
    // the codegen'd native expression must produce the EXACT double bits of
    // the zip_with/aggregate reference (same fold order) — the oracles hash
    // rounded values derived from these
    val rng = new scala.util.Random(7)
    val d = (0L until 200L).map { i =>
      (i, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "va", "vb")
    val both = d.select(
      Similarity.cosine(F.col("va"), F.col("vb")).as("fast"),
      Similarity.cosineColumns(F.col("va"), F.col("vb")).as("ref")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // and the generated-code path actually ran compiled (no codegen fallback
    // marker in the plan)
    val plan = d.select(Similarity.cosine(F.col("va"), F.col("vb")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("semanticDedup: within-cell cosine dups drop higher id; cap keeps all") {
    // centroids at the two axes; vectors cluster around them
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val d = Seq(
      (0L, Array(1.0f, 0.01f, 0f, 0f)),   // cell 0
      (1L, Array(0.99f, 0.02f, 0f, 0f)),  // cell 0, ~identical to 0 -> dropped
      (2L, Array(0.7f, 0f, 0.7f, 0f)),    // cell 0, dissimilar (cos ~0.7) -> kept with tau .95
      (3L, Array(0f, 1.0f, 0f, 0f)),      // cell 1
      (4L, Array(0.01f, 0.99f, 0f, 0f))   // cell 1, dup of 3 -> dropped
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(d, "vec_id", "embedding", cents, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(0L, 2L, 3L))
    assert(kept(0L) == 0 && kept(2L) == 0 && kept(3L) == 1)
    // over-cap cell: evidence dropped, members KEPT (cap drops pairs, not docs)
    val keptCapped = Similarity.semanticDedup(d, "vec_id", "embedding", cents,
      tau = 0.95, maxCell = 2).collect().map(_.getLong(0)).toSet
    // cell 0 (3 members) exceeds the cap -> no pairs, all kept; cell 1 (2
    // members) still dedups, so 4 drops
    assert(keptCapped == Set(0L, 1L, 2L, 3L))
  }

  test("dedupLines: first occurrence wins, docs reassemble, full dups vanish") {
    val d = Seq(
      (0L, "alpha\nshared banner\nbody zero"),
      (1L, "beta\nshared banner\nbody one"),   // loses "shared banner" to doc 0
      (2L, "alpha\nshared banner"),            // every line seen before -> gone
      (3L, "shared banner\ngamma")             // keeps only "gamma"
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(0L) == ((3L, "alpha\nshared banner\nbody zero")))
    assert(got(1L) == ((2L, "beta\nbody one")))
    assert(!got.contains(2L)) // fully-duplicate doc dropped
    assert(got(3L) == ((1L, "gamma")))
  }

  test("capPerDomain: bounded, deterministic, stable under repartitioning") {
    val d = (0L until 300L).map(i => (i, s"doc $i", s"host${i % 3}"))
      .toDF("doc_id", "text", "domain")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.capPerDomain(df, "doc_id", "domain", cap = 10, seed = 42L)
        .select("doc_id", "domain", "domain_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val a = run(d)
    assert(a.size == 30) // 3 domains x cap 10
    assert(a.groupBy(_._2).forall { case (_, rows) =>
      rows.size == 10 && rows.map(_._3).toSeq.sorted == (1 to 10)
    })
    // survivor set is a pure function of (id, domain, seed): identical under
    // a different physical layout — never "first N encountered"
    assert(run(d.repartition(7)) == a)
    // and a different seed picks a different (but equally bounded) set
    val b = TextOps.capPerDomain(d, "doc_id", "domain", cap = 10, seed = 43L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b.size == 30 && b != a.map(_._1))
  }

  test("topKPerQuery degenerate scores: NaN ranks first, -0.0 ties 0.0 on id") {
    // Spark SQL desc ordering treats NaN as the LARGEST double and
    // normalizes -0.0 == 0.0; the bounded aggregator's comparator must match
    // the row_number window it replaced on exactly these edge cases
    val scored = Seq(
      (1L, 10L, Double.NaN),
      (1L, 11L, 0.9),
      (1L, 12L, -0.0),
      (1L, 13L, 0.0),
      (1L, 14L, 0.5)
    ).toDF("query_id", "neighbor_id", "sim")
    val got = Similarity.topKPerQuery(scored, 4)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 10L), (2, 11L), (3, 14L), (4, 12L)))
    // parity with the window form on the same degenerate input
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    val win = scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= 4)
      .orderBy("rank").collect().map(r => (r.getInt(3), r.getLong(1))).toSeq
    assert(got == win, s"aggregator $got != window $win")
  }

  test("hashed-key wire format: jaccard and shingle overlap match string keys") {
    // the at-scale option (8-byte xxhash64 keys on the shuffle instead of
    // gram strings) must be a pure wire-format change: identical pairs,
    // scores and per-doc fractions on a corpus with shared + unique grams
    val d = (0L until 40L).map { i =>
      (i, s"shared prefix tokens alpha beta gamma doc${i % 8} tail${i % 5} w$i")
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(Dedup.tokenJaccardPairs(d, "doc_id", "text", 0.5)) ==
      canon(Dedup.tokenJaccardPairs(d, "doc_id", "text", 0.5, hashKeys = true)))
    assert(canon(Dedup.ngramJaccardPairs(d, "doc_id", "text", 4, 0.5)) ==
      canon(Dedup.ngramJaccardPairs(d, "doc_id", "text", 4, 0.5, hashKeys = true)))
    assert(canon(TextOps.shingleOverlap(d, "doc_id", "text")) ==
      canon(TextOps.shingleOverlap(d, "doc_id", "text", hashShingles = true)))
  }

  test("shingleContainmentPairs: a quoted document is fully contained " +
    "(1000 pm) while Jaccard stays low; short-doc single-shingle fallback") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),                 // the quote
      (2L, "intro words here alpha beta gamma delta epsilon " +
        "plus a very long tail of unrelated commentary tokens " +
        "stretching the union far beyond the quote"),         // quotes doc 1
      (3L, "totally different content nothing shared at all"),
      (4L, "tiny doc"),                                       // < 3 tokens
      (5L, "tiny doc")                                        // identical tiny
    ).toDF("doc_id", "text")
    val rows = Dedup.shingleContainmentPairs(d, "doc_id", "text", thresholdPm = 500L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r).toMap
    // doc 1's 3 shingles all appear in doc 2 -> containment(1 in 2) = 1000
    val q = rows((1L, 2L))
    assert(q.getAs[Long]("cont_a_pm") == 1000L)
    assert(q.getAs[Long]("cont_b_pm") < 500L) // asymmetric: big side low
    // the same pair would FAIL a 0.5 Jaccard gate — the metric's whole point
    val inter = q.getAs[Long]("inter").toDouble
    val uni = q.getAs[Long]("sz_a") + q.getAs[Long]("sz_b") - inter
    assert(inter / uni < 0.5)
    // short docs fall back to one full-join shingle; identical tiny docs
    // are mutually contained
    val t = rows((4L, 5L))
    assert(t.getAs[Long]("cont_a_pm") == 1000L && t.getAs[Long]("cont_b_pm") == 1000L)
    // unrelated doc pairs produce no row
    assert(!rows.contains((1L, 3L)) && !rows.contains((2L, 3L)))
  }

  test("shingleContainmentPairs: the df cap excludes boilerplate shingles " +
    "from intersections (blocking stays bounded on a shared-banner corpus)") {
    // every doc shares one banner trigram; with maxDf below the corpus
    // size that shingle may not create candidate pairs, so only the two
    // genuinely-overlapping docs survive
    val d = (0L until 30L).map { i =>
      (i, s"banner line here unique$i token$i word$i extra$i")
    } :+ (100L, "banner line here unique5 token5 word5 extra5")
    val df = d.toDF("doc_id", "text")
    val rows = Dedup.shingleContainmentPairs(df, "doc_id", "text",
      thresholdPm = 500L, maxDf = 5)
    val pairs = rows.collect().map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // docs 5 and 100 share their whole shingle set minus the capped banner
    assert(pairs == Set((5L, 100L)), s"got $pairs")
  }

  test("ngramDecontaminate: shared k-gram drops, short-doc fallback, subset of exact") {
    import graft.dedup.Dedup
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // blocklisted verbatim
      (1L, "x y alpha beta gamma delta epsilon w"), // shares the 5-gram, not the text
      (2L, "completely different words here with no overlap at all"),
      (3L, "short doc"), // < k tokens, fallback = whole token string
      (4L, "short doc"), // exact dup of a short blocklist item -> caught
      (5L, "short")
    ).toDF("id", "text")
    val bl = Seq("alpha beta gamma delta epsilon zeta", "short doc").toDF("text")
    val kept = Dedup.ngramDecontaminate(corpus, "text", bl, "text", k = 5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L))
    // n-gram-clean is a SUBSET of exact-clean (a verbatim copy always shares
    // its own shingles)
    val exactKept = Dedup.exactDecontaminate(corpus, "text", bl, "text")
      .select("id").as[Long].collect().toSet
    assert(kept.subsetOf(exactKept))
  }

  test("bloom decontamination: zero false negatives, bounded over-drop") {
    val corpus = (0L until 500L).map(i => (i, s"training document number $i"))
      .toDF("doc_id", "text")
    val blocked = Seq(7L, 123L, 400L)
    val blocklist = blocked.map(i => Tuple1(s"training document number $i"))
      .toDF("bench_text")
    val kept = Dedup.bloomDecontaminate(corpus, "text", blocklist, "bench_text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the one-sided guarantee: every contaminated doc is gone
    assert(blocked.forall(b => !kept.contains(b)))
    // false positives are rare at fpp=0.01 over 500 docs (allow generous slack)
    assert(kept.size >= 480 && kept.size <= 497)
    // agreement with the exact anti-join up to false positives only
    val exact = corpus.join(blocklist,
        F.col("text") === F.col("bench_text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(exact)) // bloom never keeps what exact drops

    // the exact gate (the audited semantics): equals the text-level anti
    // join, and the bloom keep set is a subset of it by construction
    val exactOp = Dedup.exactDecontaminate(corpus, "text", blocklist, "bench_text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactOp == exact)
    assert(kept.subsetOf(exactOp))
    // expectedItems hint path: same result, no count pass over the blocklist
    val hinted = Dedup.bloomDecontaminate(corpus, "text", blocklist, "bench_text",
      expectedItems = Some(3L)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(blocked.forall(b => !hinted.contains(b)))
    assert(hinted.subsetOf(exactOp))
  }

  test("int8 quantization: codes, scale and zero-vector guard hand-checked") {
    val d = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        (r.getDouble(1), r.getSeq[Int](2).toList, r.getDouble(3)))).toMap
    val s = 1.0 / 127.0
    // 0.5/s = 63.5 rounds HALF-AWAY-FROM-ZERO to 64 (pins rounding parity)
    assert(got(0L)._2 == List(64, -127, 32, 0))
    assert(got(0L)._1 == s) // raw double scale: exactly 1.0/127.0
    val exp = (math.pow(0.5 - 64 * s, 2) + 0 + math.pow(0.25 - 32 * s, 2) + 0) / 4
    assert(math.abs(got(0L)._3 - exp) < 1e-9)
    assert(got(1L) == ((0.0, List(0, 0, 0, 0), 0.0)))
  }

  test("PII: counts and redaction on crafted text") {
    val d = Seq(
      (0L, "mail me at jane.doe@example.com or call 555-0123 now"),
      (1L, "server at 10.0.42.7 and backup 192.168.1.1"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c.d@e-f.org one phone 123-4567")
    ).toDF("doc_id", "text")
    val got = d.select(F.col("doc_id"),
        TextOps.piiEmailCount($"text").cast("int").as("e"),
        TextOps.piiPhoneCount($"text").cast("int").as("p"),
        TextOps.piiIpCount($"text").cast("int").as("i"),
        TextOps.redactPii($"text").as("r"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got(0L) == ((1, 1, 0, "mail me at <EMAIL> or call <PHONE> now")))
    assert(got(1L) == ((0, 0, 2, "server at <IP> and backup <IP>")))
    assert(got(2L) == ((0, 0, 0, "no pii here at all")))
    assert(got(3L)._1 == 2 && got(3L)._2 == 1)
  }

  test("contaminationReport: shared-shingle fraction per eval doc") {
    val corpus = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val ev = Seq(
      (1L, "a b c d e x"), // shingles {a b c d e, b c d e x} → 1 of 2 hit
      (2L, "z z z") // short fallback shingle, no hit
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus, "text", ev, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((2L, 1L, 0.5)), 2L -> ((1L, 0L, 0.0))))
  }

  test("vocabCoverage: OOV counts against the vocab; zero-token docs rate 0") {
    val d = Seq((0L, "a a b"), (1L, ""), (2L, "c")).toDF("doc_id", "text")
    val vocab = Seq(("a", 0, 2L)).toDF("token", "token_id", "freq")
    val got = TextOps.vocabCoverage(d, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      0L -> ((3L, 1L, 1.0 / 3.0)),
      1L -> ((0L, 0L, 0.0)),
      2L -> ((1L, 1L, 1.0))))
  }

  test("clusterRepresentatives: longest-member-min-id per cluster, singletons kept") {
    val d = Seq(
      (0L, "aaaa"), (1L, "bbbbbb"), (2L, "cc"), // cluster {0,1,2} via pairs
      (3L, "dddd"), (4L, "eeee"), // cluster {3,4}, equal lengths → min id
      (5L, "solo")
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.clusterRepresentatives(d, "doc_id", "text", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 6L), (3L, 2L, 4L), (5L, 1L, 4L)))
  }

  test("DSIR: codegen'd scalar fold equals the explode-join relational form") {
    import graft.textops.Dsir
    val raw = Seq(
      (0L, "spark engines compile query plans"),
      (1L, "spark engines shuffle data across executors"),
      (2L, "the cat sat on the mat"),
      (3L, "a dog barked at the mailman"),
      (4L, "query plans optimize spark shuffles"),
      (5L, "")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id".isin(0L, 1L))
    val q = Dsir.learnQ(raw, target, "text")
    val got = Dsir.weights(raw, q, "doc_id", "text")

    // relational reference: explode feature buckets, join the same q table
    val qDf = q.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq.toDF("b", "q")
    val ref = raw
      .select($"doc_id", Dsir.featureBucketsCol(
        TextOps.tokens($"text"), Dsir.DefaultBuckets, Dsir.DefaultSeed).as("bs"))
      .select($"doc_id", F.explode($"bs").as("b"))
      .join(qDf, "b")
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_feats"), F.sum("q").as("q_milli"))
    val g = got.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e = ref.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g == e)
    assert(!g.contains(5L)) // empty doc has no features and drops out
  }

  test("chunkBlocks: spans tile every document and fill every block") {
    val d = Seq(
      (0L, Seq.fill(5)("w").mkString(" ")),   // 5 tokens
      (1L, Seq.fill(9)("w").mkString(" ")),   // 9 → crosses a block boundary
      (2L, ""),                                // empty → no rows
      (3L, Seq.fill(3)("w").mkString(" ")),
      (4L, Seq.fill(20)("w").mkString(" "))    // longer than 2 blocks
    ).toDF("doc_id", "text")
    val got = TextOps.chunkBlocks(d, "doc_id", "text", blockSize = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // global stream: doc0 [0,5), doc1 [5,14), doc3 [14,17), doc4 [17,37)
    val expected = Set(
      (0L, 0L, 0L, 5L),
      (1L, 0L, 0L, 3L), (1L, 1L, 3L, 6L),
      (3L, 1L, 0L, 2L), (3L, 2L, 2L, 1L), // straddles the block-1/2 boundary
      (4L, 2L, 0L, 7L), (4L, 3L, 7L, 8L), (4L, 4L, 15L, 5L))
    assert(got.toSet == expected)
    // per-document spans are contiguous and sum to the token count
    val byDoc = got.groupBy(_._1)
    assert(byDoc(4L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq((0L, 7L), (7L, 8L), (15L, 5L)))
    // every block except the last holds exactly blockSize tokens
    val byBlock = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(byBlock == Map(0L -> 8L, 1L -> 8L, 2L -> 8L, 3L -> 8L, 4L -> 5L))
  }

  test("normalizeText: NFC + zero-width strip + CRLF + space collapse + trim") {
    val d = Seq(
      (0L, "cafe\u0301 x"),                  // NFD -> NFC
      (1L, "a\u200Bb\u200C c\u200Dd\uFEFFe"), // zero-width family removed
      (2L, "l1\r\nl2\rl3\nl4"),              // CR / CRLF / LF → LF
      (3L, "  a\t\tb   c\t "),               // runs collapse, outer trim
      (4L, "caf\u00E9")                       // already NFC → unchanged
    ).toDF("doc_id", "text")
    val got = d.select($"doc_id", TextOps.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "caf\u00E9 x")
    assert(got(1L) == "ab cde")
    assert(got(2L) == "l1\nl2\nl3\nl4")
    assert(got(3L) == "a b c")
    assert(got(4L) == "caf\u00E9")
  }

  test("Links: extraction, RFC 3986 resolution, non-fetchable dropped") {
    import graft.extract.Links
    val html =
      """<html><body>
        |<a href="https://ext.example.net/x/1">abs</a>
        |<a class="m" href="/r/3">rooted</a>
        |<a href="a/b2">relative</a>
        |<a href="../up1">parent</a>
        |<a href="#frag">frag-only</a>
        |<a href="mailto:x@y.example">mail</a>
        |<a href="javascript:void(0)">js</a>
        |<a href="sib#sec">frag-stripped</a>
        |</body></html>""".stripMargin
    val d = Seq((7L, "https://site.example.org/dir/page7", html))
      .toDF("id", "url", "html")
    val got = Links.pageLinks(d, "id", "url", "html")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("https://ext.example.net/x/1", "https://ext.example.net/x/1", "ext.example.net"),
      ("/r/3", "https://site.example.org/r/3", "site.example.org"),
      ("a/b2", "https://site.example.org/dir/a/b2", "site.example.org"),
      ("../up1", "https://site.example.org/up1", "site.example.org"),
      ("sib#sec", "https://site.example.org/dir/sib", "site.example.org")))
    // host graph roll-up
    val hg = Links.hostGraph(Links.pageLinks(d, "id", "url", "html"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hg == Map(
      ("site.example.org", "ext.example.net") -> 1L,
      ("site.example.org", "site.example.org") -> 4L))
  }

  test("shardManifest: stable assignment, order-free checksum") {
    import graft.textops.TextOps
    val d = Seq((1L, "aa"), (2L, "bbb"), (3L, "c"), (4L, "dddd")).toDF("doc_id", "text")
    val got = TextOps.shardManifest(d, "doc_id", "text", nShards = 3, seed = 9L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // straight-line reference
    val ref = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 4L)).map { case (id, nc) =>
      val mx = graft.extract.Synth.mix64(9L ^ id)
      (java.lang.Long.remainderUnsigned(mx, 3L), nc, mx)
    }.groupBy(_._1).map { case (s, rows) =>
      s -> ((rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).reduce(_ ^ _)))
    }
    assert(got == ref)
    // checksum is order-free: reversed input yields identical manifests
    val rev = TextOps.shardManifest(
      d.orderBy(F.col("doc_id").desc), "doc_id", "text", nShards = 3, seed = 9L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rev == got)
  }

  test("temperatureSample: sqrt quotas, distributed rank == window rank") {
    import graft.textops.TextOps
    import org.apache.spark.sql.expressions.Window
    // skewed corpus: 64 "en", 16 "de", 4 "fr" docs; T = 42
    val d = ((0L until 64L).map((_, "en")) ++ (100L until 116L).map((_, "de")) ++
      (200L until 204L).map((_, "fr"))).toDF("doc_id", "lang")
    val got = TextOps.temperatureSample(d, "doc_id", "lang",
      targetTotal = 42L, seed = 5L)
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // S = sqrt(16) + 8 + 2 = 14 exactly; quotas floor(42*w/14): en 24, de 12, fr 6
    assert(rows.values.collect { case ("en", _, q, _) => q }.head == 24L)
    assert(rows.values.collect { case ("de", _, q, _) => q }.head == 12L)
    assert(rows.values.collect { case ("fr", _, q, _) => q }.head == 6L)
    // selected = min(quota, supply) per language: 24 + 12 + 4 = 40
    assert(rows.values.count(_._4) == 40)
    // fr has 4 docs but quota 6: all selected, quota not silently clamped
    assert(rows.filter(_._2._1 == "fr").values.forall(_._4))
    // distributed rank equals the per-lang window rank on the same key
    val mixU = F.udf((id: Long) => java.lang.Long.remainderUnsigned(
      graft.extract.Synth.mix64(5L ^ id), 1000000000L))
    val w = Window.partitionBy("lang").orderBy(F.col("mxr"), F.col("doc_id"))
    val ref = d.withColumn("mxr", mixU(F.col("doc_id")))
      .withColumn("rn", F.row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, (_, rank, _, _)) => assert(rank == ref(id)) }
  }

  test("domainStats: hosts roll up through multi-part suffixes, host pre-dedup") {
    import graft.extract.UrlOps
    val d = Seq(
      ("https://a.x.co.uk/1", "one two"),
      ("https://b.x.co.uk/2", "three"),
      ("https://a.x.co.uk/3", "four five six"),   // same host as row 1
      ("https://y.org/4", "seven")
    ).toDF("url", "text")
    val got = UrlOps.domainStats(d, "url", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("x.co.uk") == ((3L, 2L, 25L, 6L)))
    assert(got("y.org") == ((1L, 1L, 5L, 1L)))
  }

  test("scriptProfile: per-script counts and fixed-priority dominant") {
    val d = Seq(
      (0L, "hello world 123"),          // pure latin, digits are Common
      (1L, "Привет мир"),               // cyrillic
      (2L, "abc Привет"),               // tie 3-6 -> cyrillic wins count
      (3L, "你好 abc"),                  // han 2, latin 3 -> latin
      (4L, "مرحبا"),                    // arabic
      (5L, "")                          // empty -> all zero, dominant latin
    ).toDF("doc_id", "text")
    val cols = graft.textops.TextOps.scriptProfile(F.col("text"))
      .map { case (n, c) => c.as(n) }
    val got = d.select(F.col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got(0L) == ((15L, 10L, 0L, 0L, 0L, "latin")))
    assert(got(1L) == ((10L, 0L, 9L, 0L, 0L, "cyrillic")))
    assert(got(2L) == ((10L, 3L, 6L, 0L, 0L, "cyrillic")))
    assert(got(3L) == ((6L, 3L, 0L, 2L, 0L, "latin")))
    assert(got(4L) == ((5L, 0L, 0L, 0L, 5L, "arabic")))
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L, "latin")))
  }

  test("resolveRedirects: log-round pointer jumping, min-dst tie, cycle flagged") {
    import graft.extract.UrlOps
    val edges = Seq(
      // chain of 5: a->b->c->d->e->T (resolves in 3 doublings, 2^3 >= 5)
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "T"),
      // duplicate-src: keeps the lexicographic min target
      ("x", "z"), ("x", "y"),
      // 2-cycle: never terminal -> resolved = false
      ("p", "q"), ("q", "p")
    ).toDF("src", "dst")
    val got = UrlOps.resolveRedirects(edges, rounds = 3).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got("a") == (("T", 5L, true)))
    assert(got("b") == (("T", 4L, true)))
    assert(got("e") == (("T", 1L, true)))
    assert(got("x") == (("y", 1L, true)))   // min("y","z") = "y", terminal
    assert(got("p")._3 == false)            // cycle: still a source
    assert(got("q")._3 == false)
    // insufficient rounds leave a long chain unresolved (truthful flag)
    val short = UrlOps.resolveRedirects(edges, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(short("a") == false)             // 2^1 = 2 hops < 5
    assert(short("e") == true)
  }

  test("Links.anchors: text pairs positionally with href across dropped links") {
    import graft.extract.Links
    // a mailto link BETWEEN two fetchable ones: positional pairing must
    // survive the post-pairing fetchability filter (texts keep their own
    // match positions, not the filtered ones)
    val html =
      """<a href="/a">first</a>
        |<a href="mailto:x@y.example">mail</a>
        |<a href="/b">second</a>
        |<a href="#f">frag</a>
        |<a href="/a">third</a>""".stripMargin
    val d = Seq((1L, "https://h.example.org/p", html)).toDF("id", "url", "html")
    val got = Links.anchors(d, "id", "url", "html")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("https://h.example.org/a", "first"),
      ("https://h.example.org/b", "second"),
      ("https://h.example.org/a", "third")))
  }

  test("Links.anchorTextProfile: counts, distinct texts, argmax tie by text asc") {
    import graft.extract.Links
    val a = Seq(
      ("t1", "x"), ("t1", "x"), ("t1", "y"),          // clear winner x (2)
      ("t2", "b"), ("t2", "a"),                        // tie 1-1 → "a" (asc)
      ("t3", "only")
    ).toDF("resolved", "anchor")
    val got = Links.anchorTextProfile(a).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(got("t1") == ((3L, 2L, "x", 2L)))
    assert(got("t2") == ((2L, 2L, "a", 1L)))
    assert(got("t3") == ((1L, 1L, "only", 1L)))
  }

  test("bpePairCounts: adjacent pairs counted, top order (freq desc, pair asc)") {
    val d = Seq(
      (0L, "a b a b c"),   // pairs: "a b", "b a", "a b", "b c"
      (1L, "a b"),          // pair: "a b"
      (2L, "x"),            // single token -> nothing
      (3L, "")              // empty -> nothing
    ).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(d, "text", topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    // topK binds: asking for 2 returns the 2 best under the same order
    val top2 = TextOps.bpePairCounts(d, "text", topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top2.toSeq == Seq(("a b", 3L), ("b a", 1L)))
  }

  /** Straight-line reference of the same integer Lloyd recurrence. */
  private def refKMeans(
      vecs: Seq[(Long, Seq[Float])], k: Int, rounds: Int
  ): Map[Long, (Int, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong + 1024L)
    }.toMap
    var cents: Seq[Seq[Long]] = vecs.map(_._1).sorted.take(k).map(q)
    def assign() = q.map { case (id, v) =>
      val ds = cents.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
      id -> ((best._2, best._1))
    }
    var out: Map[Long, (Int, Long)] = null
    for (r <- 1 to rounds) {
      out = assign()
      if (r < rounds) {
        val members = out.toSeq.groupBy(_._2._1)
        cents = cents.zipWithIndex.map { case (old, ci) =>
          members.get(ci) match {
            case Some(ms) =>
              val vs = ms.map(m => q(m._1))
              vs.head.indices.map(i => vs.map(_(i)).sum / vs.size).toSeq
            case None => old
          }
        }
      }
    }
    out
  }

  test("kMeansInt: integer Lloyd matches the straight-line reference") {
    // two tight clusters around (0.1, 0.1) and (-0.3, 0.4), seeds ids 0/1
    val vecs = Seq(
      (0L, Seq(0.10f, 0.11f)), (1L, Seq(-0.30f, 0.40f)),
      (2L, Seq(0.12f, 0.09f)), (3L, Seq(-0.28f, 0.41f)),
      (4L, Seq(0.09f, 0.10f)), (5L, Seq(-0.31f, 0.39f)),
      (6L, Seq(0.11f, 0.12f)))
    val d = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kMeansInt(d, "vec_id", "embedding", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == refKMeans(vecs, k = 2, rounds = 2))
    // the two geometric clusters separate
    assert(Set(got(0L)._1, got(2L)._1, got(4L)._1, got(6L)._1).size == 1)
    assert(Set(got(1L)._1, got(3L)._1, got(5L)._1).size == 1)
    assert(got(0L)._1 != got(1L)._1)
    // determinism across invocations
    val again = Similarity.kMeansInt(d, "vec_id", "embedding", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(again == got)
  }

  test("int8Outliers: matches a straight-line reference incl. negative-sum floor division") {
    // 3 vectors chosen so a per-dimension code sum is NEGATIVE and not
    // divisible by n — pins floorDiv (not truncation) centroid semantics
    val vecs = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(-0.9f, 0.3f, 0.1f, 0.2f)),
      (2L, Array(0.05f, -0.4f, 0.9f, -0.6f)))
    val d = vecs.toDF("vec_id", "embedding")
    val codes = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val n = codes.size.toLong
    val dim = codes.values.head.length
    val cent = (0 until dim).map { i =>
      Math.floorDiv(codes.values.map(_(i).toLong).sum, n)
    }
    val expScores = codes.map { case (id, cs) =>
      id -> (0 until dim).map(i => (cs(i) - cent(i)) * (cs(i) - cent(i))).sum
    }
    // at least one dimension exercises the negative-floor branch
    assert((0 until dim).exists(i => codes.values.map(_(i).toLong).sum < 0))
    val got = Similarity.int8Outliers(d, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expOrder = expScores.toSeq.sortBy { case (id, s) => (-s, id) }.take(2)
    assert(got.toSeq == expOrder)
  }

  test("fuzzyVocabPairs: complete and precise vs brute-force levenshtein; bucket cap drops hot keys") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val terms = Seq(
      ("cat", 10L), ("cut", 5L), ("cart", 3L), ("dog", 7L), ("dg", 2L),
      ("a", 1L), ("xy", 1L), ("zebra", 4L), ("zebras", 2L))
    val vocab = terms.toDF("token", "freq")
    val exp = (for {
      (a, fa) <- terms; (b, fb) <- terms
      if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b).toLong, fa, fb)).toSet
    val got = TextOps.fuzzyVocabPairs(vocab, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == exp)
    // sanity: the short-pair brute slice genuinely contributes ("a","dg")
    assert(exp.contains(("a", "dg", 2L, 1L, 2L)))
    // maxDist=1 subset
    val got1 = TextOps.fuzzyVocabPairs(vocab, maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got1 == exp.filter(_._3 == 1L).map(t => (t._1, t._2)))
    // the SymSpell bucket cap: "cat"/"bat"/"rat" share only generic keys held
    // by all three, so maxBucket=2 silences the block (non-silent cap spec)
    val hot = Seq(("cat", 1L), ("bat", 1L), ("rat", 1L)).toDF("token", "freq")
    assert(TextOps.fuzzyVocabPairs(hot, maxDist = 1, maxBucket = 2L).count() == 0L)
    assert(TextOps.fuzzyVocabPairs(hot, maxDist = 1).count() == 3L)
  }

  test("DSIR: target-like documents score above off-target documents") {
    import graft.textops.Dsir
    val raw = Seq(
      (0L, "spark engines compile query plans into stages"),
      (1L, "spark engines shuffle partitions across executors"),
      (2L, "the cat sat on the warm mat all day"),
      (3L, "a dog barked at the mailman this morning"),
      (4L, "spark engines compile query plans for executors")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id".isin(0L, 1L))
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 4 shares the target's feature mass; docs 2/3 share almost none
    assert(w(4L) > w(2L) && w(4L) > w(3L))
    assert(w(0L) > w(2L) && w(1L) > w(3L))
  }

  test("winnowing: shared >= w+k-1 substring shares a fingerprint value; rightmost ties; determinism") {
    val k = 8; val w = 4
    // two docs share a 40-char normalized run (>= w+k-1 = 11) inside
    // otherwise different prose; a third shares nothing
    val shared = "the winnowing guarantee holds for this run"
    val a = s"alpha prologue text $shared and an epilogue"
    val b = s"completely other framing $shared closing words"
    val c = "unrelated content speaking about graphs and executors only"
    def fpVals(t: String) =
      graft.dedup.Dedup.winnow(t, k, w, 0x5eed5eedL).map(_._2).toSet
    assert((fpVals(a) intersect fpVals(b)).nonEmpty, "guarantee violated")
    assert((fpVals(a) intersect fpVals(c)).isEmpty)
    // tie case: a periodic string makes equal window hashes; selection must
    // be deterministic and positions strictly increasing
    val tie = graft.dedup.Dedup.winnow("ab ab ab ab ab ab ab ab", k, w, 1L)
    assert(tie.map(_._1).toSeq == tie.map(_._1).toSeq.sorted)
    assert(tie.nonEmpty &&
      tie.sameElements(graft.dedup.Dedup.winnow("ab ab ab ab ab ab ab ab", k, w, 1L)))
    // shorter than k after normalization -> empty
    assert(graft.dedup.Dedup.winnow("a b", k, w, 1L).isEmpty)
  }

  test("pqEncode: exact argmin per subspace, reference parity, determinism") {
    val m = 4; val subDim = 16; val kSub = 16
    def cent(s: Int, j: Int): Seq[Long] =
      Seq.tabulate(subDim)(d => 24L + (211L * j + 97L * d + 59L * s) % 2001L)
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 31 + d * 7) % 2000 - 1000) / 1000.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // straight-line reference: same grid, same argmin with lowest-j ties
    vecs.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1000).toLong + 1024L)
      val perSub = (0 until m).map { s =>
        val slice = q.slice(s * subDim, (s + 1) * subDim)
        val dists = (0 until kSub).map { j =>
          slice.zip(cent(s, j)).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        val best = dists.zipWithIndex.minBy { case (dd, j) => (dd, j) }
        (best._2, best._1)
      }
      val expCodes = perSub.map(_._1).mkString(",")
      val expDist = perSub.map(_._2).sum
      assert(got(id) == ((expCodes, expDist)), s"vec $id: ${got(id)} vs ($expCodes, $expDist)")
    }
  }

  test("codeProfile: line-shape and keyword signals, integer score, verdict") {
    val rows = Seq(
      (1L, "plain prose with no code at all"),
      (2L, "function f(x) {\n  let y = x + 1;\n  return y;\n}"),
      (3L, "a story where someone must return home\nand import goods"), // 2 kw, no shape
      (4L, "x;\ny;\nz;\nplain")
    ).toDF("doc_id", "text")
    val got = graft.textops.TextOps.codeProfile(rows, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L, 0L, false)))
    // 4 lines: `{`-ending, 2x indented+;, `}` => punct 4 (incl braces), indent 2
    assert(got(2L) == ((4L, 4L, 2L, 3L, 1500L, true)))
    // keywords in prose alone don't trip the n_kw >= 3 gate
    assert(got(3L) == ((2L, 0L, 0L, 2L, 0L, false)))
    // 3 of 4 lines end in ';' => 750 pm, is_code by score alone
    assert(got(4L) == ((4L, 3L, 0L, 0L, 750L, true)))
  }

  test("pqAdcTopK: LUT distance equals code-table distance; (dist, id) ranks; k binds") {
    val m = 4; val subDim = 16; val kSub = 16
    def cent(s: Int, j: Int): Seq[Long] =
      Seq.tabulate(subDim)(d => 24L + (211L * j + 97L * d + 59L * s) % 2001L)
    val vecs = Seq.tabulate(30)(i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 31 + d * 7) % 2000 - 1000) / 1000.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(df, df.filter($"vec_id" < 3),
        "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // straight-line reference: codes via exact argmin, ADC dist via LUT
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000).toLong + 1024L)
    def codesOf(v: Array[Float]): Seq[Int] = {
      val q = quant(v)
      (0 until m).map { s =>
        val slice = q.slice(s * subDim, (s + 1) * subDim)
        (0 until kSub).minBy { j =>
          (slice.zip(cent(s, j)).map { case (a, b) => (a - b) * (a - b) }.sum, j)
        }
      }
    }
    for (qid <- 0L until 3L) {
      val qv = quant(vecs(qid.toInt)._2)
      def lut(s: Int, j: Int): Long =
        qv.slice(s * subDim, (s + 1) * subDim)
          .zip(cent(s, j)).map { case (a, b) => (a - b) * (a - b) }.sum
      val expect = vecs.map { case (id, v) =>
        val dist = codesOf(v).zipWithIndex.map { case (c, s) => lut(s, c) }.sum
        (dist, id)
      }.sorted.take(5)
      expect.zipWithIndex.foreach { case ((dist, id), i) =>
        assert(got((qid, i + 1)) == ((id, dist)),
          s"query $qid rank ${i + 1}: ${got((qid, i + 1))} vs ($id, $dist)")
      }
    }
    // exactly k rows per query
    assert(got.size == 15)
  }

  test("winnowCandidates: dup/near-dup pairs surface, unrelated docs don't; cap silences mega-buckets") {
    val got = graft.dedup.Dedup.winnowCandidates(docs, "doc_id", "text",
        minShared = 3L, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0/2 exact dups, 1 a near-dup of both; 3 is unrelated prose
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)) && got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
    // an exact-dup cluster larger than maxBucket produces ZERO pairs (the
    // non-silent cap: exact dedup owns that cluster, not the fuzzy pass)
    val clones = (0L until 150L).map(i => (i, "same content everywhere repeated verbatim"))
      .toDF("doc_id", "text")
    assert(graft.dedup.Dedup.winnowCandidates(clones, "doc_id", "text",
      minShared = 1L, maxBucket = 100).count() == 0L)
  }

  test("exactQuantiles matches the global-sort definition, dupes and ties included") {
    // heavy duplication: values cycle 0..6, ids shuffled — ties must break on id
    val vals = Seq.tabulate(101)(i => ((i * 37 % 101).toLong, ((i * 13) % 7).toLong))
    val df = vals.toDF("id", "v")
    val ps = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p90", 9L, 10L), ("max", 1L, 1L))
    val got = TextOps.exactQuantiles(df, "id", "v", ps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sorted = vals.map { case (id, v) => (v, id) }.sorted
    val n = sorted.length.toLong
    val exp = ps.map { case (l, num, den) =>
      val rk = math.max(1L, (n * num + den - 1) / den)
      (l, rk, sorted((rk - 1).toInt)._1)
    }.toSet
    assert(got == exp)
  }

  test("stripHostBoilerplate: host-local verdict, minPages gate, vanishing docs") {
    // host A: banner on ALL 10 pages (stripped at 3/5); 'half' on 5/10 (kept);
    // page 10 is banner-only (vanishes). host B: 1 page (< minPages, untouched).
    val rows =
      (0L to 9L).map(i => (i, "A", s"banner\nunique $i\nhalf ${i % 2}")) ++
        Seq((10L, "A", "banner"), (11L, "B", "banner\nsolo"))
    val df = rows.toDF("doc_id", "host", "text")
    val got = TextOps.stripHostBoilerplate(df, "doc_id", "host", "text",
        minPages = 2L, fracNum = 3L, fracDen = 5L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(!got.contains(10L), "banner-only doc must vanish")
    assert(got(11L) == ((2L, "banner\nsolo")), "below-minPages host untouched")
    (0L to 9L).foreach { i =>
      assert(got(i) == ((2L, s"unique $i\nhalf ${i % 2}")), s"doc $i wrong: ${got(i)}")
    }
    // salt level must not change semantics
    val s1 = TextOps.stripHostBoilerplate(df, "doc_id", "host", "text",
        2L, 3L, 5L, salt = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(s1 == got.map { case (k, (a, b)) => (k, a, b) }.toSet)
  }

  test("sentences: hand cases — terminator runs, tail, leading dots, offsets") {
    val df = Seq(
      (0L, "One. Two!! Three?"),
      (1L, "No terminator at all"),
      (2L, "...leading dots. Then text."),
      (3L, "Gap.\n\nNext line!  Spaced.  "),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.sentences(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      (0L, 0L, 0L, 5L, "One."), (0L, 1L, 5L, 6L, "Two!!"), (0L, 2L, 11L, 6L, "Three?"),
      (1L, 0L, 0L, 20L, "No terminator at all"),
      // leading terminator run forms its own match (alt-1 with an empty
      // [^.!?]* prefix) — same in RE2, so the oracle agrees
      (2L, 0L, 0L, 3L, "..."), (2L, 1L, 3L, 14L, "leading dots."),
      (2L, 2L, 17L, 10L, "Then text."),
      (3L, 0L, 0L, 6L, "Gap."), (3L, 1L, 6L, 12L, "Next line!"),
      (3L, 2L, 18L, 9L, "Spaced.")
    ), s"got $got")
  }

  test("sentences: complete partition — offsets = prefix sums, substrings match") {
    val texts = Seq(
      "Dr. No!! A b c. d\ne f? g  ",
      "x",
      "!!!",
      "a.b.c",
      "  spaced start. end")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = TextOps.sentences(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val ss = rows.getOrElse(i.toLong, Array.empty)
      // raw matches tile the text exactly: starts are running sums, total = len
      var pos = 0L
      for ((_, _, start, rawLen, sent) <- ss) {
        assert(start == pos, s"doc $i: gap before offset $start")
        val raw = t.substring(start.toInt, (start + rawLen).toInt)
        assert(raw.replaceAll("[ \t\n\r]+$", "") == sent, s"doc $i: substring mismatch")
        pos += rawLen
      }
      assert(pos == t.length.toLong, s"doc $i: partition incomplete ($pos/${t.length})")
    }
  }

  test("bitextCandidates: lang parsed from URL, ambiguity gate, length band, " +
    "non-language URLs excluded") {
    import spark.implicits._
    val pages = Seq(
      // clean en/fr pair, comparable lengths
      ("https://m.org/en/alpha", "x" * 100),
      ("https://m.org/fr/alpha", "y" * 160),
      // de version exists but fails the 0.5..2.0 band vs both
      ("https://m.org/de/alpha", "z" * 400),
      // ambiguous slot: two en pages on slug beta -> en side dropped,
      // so beta yields nothing even though fr exists
      ("https://m.org/en/beta", "a" * 50),
      ("https://m.org/en/beta", "b" * 55),
      ("https://m.org/fr/beta", "c" * 50),
      // same slug on ANOTHER host: independent key, pairs fine
      ("https://n.org/en/beta", "d" * 80),
      ("https://n.org/zh/beta", "e" * 41),
      // first segment not a 2-letter code -> excluded entirely
      ("https://m.org/wiki/alpha", "f" * 100),
      ("ftp://m.org/en/alpha", "g" * 100)
    ).toDF("url", "text")
    val got = graft.textops.TextOps.bitextCandidates(pages, "url", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(4),
        r.getLong(3), r.getLong(6)))
      .toSet
    assert(got == Set(
      ("m.org/alpha", "en", "fr", 100L, 160L),
      ("n.org/beta", "en", "zh", 80L, 41L)))
    // band boundary is inclusive: 41*2 >= 80 passes; de(400) vs fr(160)
    // fails 160*2 >= 400, and vs en(100) fails 100*2 >= 400
    val langs = got.map(t => (t._2, t._3))
    assert(!langs.exists { case (a, b) => a == "de" || b == "de" })
  }

  test("dedupParagraphs: first occurrence survives in original form, " +
    "trim-normalized matching, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      // p3 is p1 whitespace-padded (drops, p1's ORIGINAL form kept);
      // p4 repeats p2 verbatim (drops); p5 unique
      (1L, "alpha one\n\nbeta two\n\n  alpha one \n\nbeta two\n\ngamma"),
      // all distinct
      (2L, "a\n\nb"),
      // single paragraph, no separator at all
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((5L, 3L, "alpha one\n\nbeta two\n\ngamma".length.toLong,
      md5("alpha one\n\nbeta two\n\ngamma"))))
    assert(got(2L) == ((2L, 2L, 4L, md5("a\n\nb"))))
    assert(got(3L) == ((1L, 1L, 4L, md5("solo"))))
    // pure projection: no exchange anywhere in the plan
    val plan = graft.dedup.Dedup.dedupParagraphs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in plan:\n$plan")
  }

  test("bitextCandidates plan: no window, no cartesian") {
    import spark.implicits._
    val pages = Seq(("https://m.org/en/a", "t")).toDF("url", "text")
    val plan = graft.textops.TextOps.bitextCandidates(pages, "url", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }

  test("bpeMergeTrain: argmax selection order and greedy left-to-right " +
    "rewrite on a hand-checked corpus") {
    // pairs in round 1: "a b" x3 (docs 0,1), "b a" x2, "a a" x2 (doc 2:
    // a a a -> pairs (a,a),(a,a)), "b c" x1 ... construct explicitly:
    val d = Seq(
      (0L, "a b a b"), // pairs: (a,b) (b,a) (a,b)
      (1L, "a b c"),   // pairs: (a,b) (b,c)
      (2L, "a a a")    // pairs: (a,a) (a,a)
    ).toDF("doc_id", "text")
    val got = TextOps.bpeMergeTrain(d, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // round 1: (a,b) freq 3 wins -> a_b. Greedy left-to-right rewrite with
    // SHARED delimiter spaces merges only alternate occurrences:
    // "a b a b" -> "a_b a b" (the second occurrence lost its leading space
    // to the first match — the canonical non-overlapping replace contract,
    // identical in Spark and DuckDB). States: "a_b a b", "a_b c", "a a a"
    // -> "a_a a" in round 2.
    // round 2 pairs: (a_b,a)+(a,b)+(a_b,c) x1 each, (a,a) x2 -> "a a" wins
    got.foreach { case (_, (_, m1, m2)) =>
      assert(m1 == "a b"); assert(m2 == "a a")
    }
    assert(got(0)._1 == 3L) // "a_b a b"
    assert(got(1)._1 == 2L) // "a_b c"
    assert(got(2)._1 == 2L) // "a_a a" — greedy left-to-right, NOT "a a_a"
    // digest pins the actual string, not just counts
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val gotFull = TextOps.bpeMergeTrain(d, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotFull(2) == h("a_a a"))
  }

  test("knContinuationCounts: hand-checked type counts") {
    val d = Seq((0L, "a b"), (1L, "c b"), (2L, "a b"), (3L, "b d")).toDF("doc_id", "text")
    val got = TextOps.knContinuationCounts(d, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // b: freq 4; left types {a, c} = 2; right types {d} = 1
    // a: freq 2; left 0; right {b} = 1
    // c: freq 1; left 0; right {b} = 1
    // d: freq 1; left {b} = 1; right 0
    assert(got == Map(
      "a" -> ((2L, 0L, 1L)),
      "b" -> ((4L, 2L, 1L)),
      "c" -> ((1L, 0L, 1L)),
      "d" -> ((1L, 1L, 0L))
    ))
  }

  test("indexSizeEstimate: hand-checked EF bit accounting") {
    // 4 docs; 'common' in all 4 (df=4, U div df=1, l=0, bits=8);
    // 'rare' in 1 (df=1, U div df=4, l=2, bits=4)
    val d = Seq(
      (0L, "common rare"), (1L, "common"), (2L, "common"), (3L, "common")
    ).toDF("doc_id", "text")
    val got = TextOps.indexSizeEstimate(d, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "common" -> ((4L, 0L, 8L, 1L)),
      "rare" -> ((1L, 2L, 4L, 1L))
    ))
  }

  test("mlmMaskPlan: reproducible, ~permille selection, 80-10-10 actions, " +
    "zero shuffle") {
    val d = spark.range(200)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon zeta eta theta iota kappa ', id) AS text")
    val a = TextOps.mlmMaskPlan(d, "doc_id", "text", seed = 23L, permille = 150)
    val b = TextOps.mlmMaskPlan(d, "doc_id", "text", seed = 23L, permille = 150)
    val rowsA = a.collect().map(_.toSeq).toSet
    assert(rowsA == b.collect().map(_.toSeq).toSet, "not reproducible")
    val total = 200 * 11 // 11 tokens per doc
    val frac = rowsA.size.toDouble / total
    assert(frac > 0.10 && frac < 0.20, s"selection fraction $frac off 15%")
    val acts = rowsA.groupBy(_.apply(3)).map { case (k, v) => k -> v.size }
    assert(acts("mask").toDouble / rowsA.size > 0.7)
    assert(acts.contains("random") && acts.contains("keep"))
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in a pure projection:\n$plan")
  }

  test("eventFunnel semantics: views before signup don't count; stage " +
    "reflects the deepest ORDERED conversion") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val dir = SparkSuite.tmpDir("funnel-fixture")
    Seq(
      // u1: full ordered funnel
      (1L, "signup", ts(10)), (1L, "view", ts(20)), (1L, "purchase", ts(30)),
      // u2: view BEFORE signup only -> stage 1 (no view after signup)
      (2L, "view", ts(5)), (2L, "signup", ts(10)),
      // u3: purchase BEFORE the qualifying view -> stage 2
      (3L, "signup", ts(10)), (3L, "purchase", ts(15)), (3L, "view", ts(20)),
      // u4: never signed up -> absent from the funnel
      (4L, "view", ts(1)), (4L, "purchase", ts(2)),
      // u5: signup only
      (5L, "signup", ts(42))
    ).toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Queries.eventFunnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1))
  }

  test("transeScores: matches a straight-line reference scorer") {
    val enc = Seq((0L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 0L), (5L, 2L, 3L))
      .toDF("h_id", "r_id", "t_id")
    val dim = 8
    val (es, rs, ns) = (101L, 202L, 13L)
    val got = graft.kg.GraphOps.transeScores(enc, dim, es, rs, ns)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getBoolean(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    def emb(seed: Long, id: Long, d: Int): Long =
      java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(seed ^ (id * 1000003L + d)), 2001L) - 1000L
    def l1(h: Long, r: Long, t: Long): Long =
      (0 until dim).map(d => math.abs(emb(es, h, d) + emb(rs, r, d) - emb(es, t, d))).sum
    val nEnt = 6L // max id 5 + 1
    val pos = Set((0L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 0L), (5L, 2L, 3L))
    assert(got.size == 4)
    got.foreach { case ((h, r, t), (tNeg, clean, sp, sn, m)) =>
      val expNeg = java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(ns ^ (h * 1000003L + r * 7919L + t)), nEnt)
      assert(tNeg == expNeg)
      assert(clean == !pos.contains((h, r, expNeg)))
      assert(sp == l1(h, r, t))
      assert(sn == l1(h, r, expNeg))
      assert(m == sn - sp)
    }
  }
}
