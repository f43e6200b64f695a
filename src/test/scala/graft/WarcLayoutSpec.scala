package graft

import graft.extract.{UrlOps, Warc}
import graft.layout.Layout
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** WARC container parsing, SURT/CDX keys, and physical-layout operators
  * (Z-order clustering, compaction binpack planning).
  */
class WarcLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val CRLF = "\r\n"

  private def rec(headers: Seq[(String, String)], payload: String): String =
    "WARC/1.0" + CRLF +
      headers.map { case (k, v) => s"$k: $v" }.mkString(CRLF) + CRLF +
      s"Content-Length: ${payload.getBytes("ISO-8859-1").length}" + CRLF + CRLF +
      payload + CRLF + CRLF

  // --------------------------------------------------------------------
  // WARC parser
  // --------------------------------------------------------------------

  test("warc: length-delimited payload is consumed verbatim — an embedded " +
    "'WARC/1.0' + Content-Length marker must not resync the scanner") {
    val trap = "<html>quote: WARC/1.0" + CRLF + "Content-Length: 3" + CRLF + CRLF +
      "x</html>"
    val seg = rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://a.example/1",
      "Content-Type" -> "text/html"), trap) +
      rec(Seq("WARC-Type" -> "metadata",
        "WARC-Target-URI" -> "http://a.example/1",
        "Content-Type" -> "application/warc-fields"), "k: v" + CRLF)
    val out = Warc.parseSegment(7L, seg.getBytes("ISO-8859-1"))
    assert(out.map(_.warc_type) == Seq("response", "metadata"))
    assert(out.head.content_length == trap.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val wantMd5 = md.digest(trap.getBytes("ISO-8859-1"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(out.head.payload_md5 == wantMd5)
    assert(out(1).rec_idx == 1 && out(1).content_type == "application/warc-fields")
  }

  test("warc: header names case-insensitive, order-free, unknown headers and " +
    "colon-less lines tolerated") {
    val seg = "WARC/1.0" + CRLF +
      "content-LENGTH: 5" + CRLF +
      "X-Unknown-Header: whatever" + CRLF +
      "a line with no colon at position zero is skipped, not fatal" + CRLF +
      "WARC-TYPE: Response" + CRLF +
      "warc-target-uri: http://b.example/2" + CRLF + CRLF +
      "hello" + CRLF + CRLF
    val out = Warc.parseSegment(1L, seg.getBytes("ISO-8859-1"))
    assert(out.size == 1)
    val r = out.head
    assert(r.warc_type == "response" && r.target_uri == "http://b.example/2" &&
      r.content_length == 5L)
  }

  test("warc: truncated tail / garbage never poisons preceding records") {
    val good = rec(Seq("WARC-Type" -> "response"), "payload-one")
    // tail record claims more bytes than remain
    val bad = "WARC/1.0" + CRLF + "Content-Length: 9999" + CRLF + CRLF + "short"
    val out = Warc.parseSegment(3L, (good + bad).getBytes("ISO-8859-1"))
    assert(out.size == 1 && out.head.content_length == "payload-one".length)
    // missing Content-Length ends the scan truthfully
    val noLen = good + "WARC/1.0" + CRLF + "WARC-Type: response" + CRLF + CRLF + "x"
    assert(Warc.parseSegment(3L, noLen.getBytes("ISO-8859-1")).size == 1)
    // pure garbage -> empty, null-safe through the Dataset path
    assert(Warc.parseSegment(4L, "not a warc".getBytes("ISO-8859-1")).isEmpty)
    assert(Warc.parseSegment(5L, Array.emptyByteArray).isEmpty)
  }

  test("warc: records() Dataset path parses per-row with doc co-partitioning") {
    val seg1 = rec(Seq("WARC-Type" -> "response"), "aaa")
    val seg2 = rec(Seq("WARC-Type" -> "response"), "bb") +
      rec(Seq("WARC-Type" -> "metadata"), "c")
    val df = Seq((10L, seg1.getBytes("ISO-8859-1")), (11L, seg2.getBytes("ISO-8859-1")))
      .toDF("doc_id", "warc")
    val got = Warc.records(df, "doc_id", "warc").collect()
      .map(r => (r.doc_id, r.rec_idx, r.content_length)).sorted.toSeq
    assert(got == Seq((10L, 0, 3L), (11L, 0, 2L), (11L, 1, 1L)))
  }

  // --------------------------------------------------------------------
  // SURT keys
  // --------------------------------------------------------------------

  test("surt: scheme/case/www/port/tracking noise collapses; subdomains of a " +
    "domain sort into one contiguous key range") {
    val urls = Seq(
      "HTTP://WWW.S5.Example.COM:80/Sec3/Item?id=7&utm_source=feed",
      "https://s5.example.com/Sec3/Item?id=7",
      "http://news.example.com/a",
      "http://example.com/z",
      "http://examples.com/a")
    val got = urls.toDF("u").select(UrlOps.surt(F.col("u")).as("s"))
      .as[String].collect().toSeq
    assert(got(0) == "com,example,s5)/sec3/item?id=7")
    assert(got(0) == got(1)) // both captures collapse to one key
    // every example.com host shares the 'com,example' prefix; examples.com
    // does NOT fall inside that range (the ',' separator guarantees it)
    assert(got(2).startsWith("com,example,news)"))
    assert(got(3).startsWith("com,example)"))
    assert(!got(4).startsWith("com,example,") && !got(4).startsWith("com,example)"))
  }

  // --------------------------------------------------------------------
  // Z-order
  // --------------------------------------------------------------------

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    (0 until 16).foreach { i =>
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue interleaves bits exactly (reference bit-loop parity)") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xabcdL, 0x1234L), (40000L, 7L))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(F.col("x"), F.col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => refZ(x, y) })
    // locality sanity: the curve value of (x,y) and (x+1,y) differ only in
    // even-position bits — y's bits are untouched
    val Seq(a, b) = Seq((100L, 200L), (101L, 200L)).map { case (x, y) => refZ(x, y) }
    assert(((a ^ b) & 0xaaaaaaaaL) == 0L)
  }

  // --------------------------------------------------------------------
  // Compaction plan
  // --------------------------------------------------------------------

  test("compactionPlan: binpack by exclusive prefix sum, per partition; an " +
    "oversized file claims its bin and pushes the remainder forward") {
    val files = Seq(
      ("p1", 1L, 60L), ("p1", 2L, 60L), ("p1", 3L, 250L), ("p1", 4L, 10L),
      ("p2", 1L, 10L)).toDF("part", "fid", "sz")
    val got = Layout.compactionPlan(files, "part", "fid", "sz", targetBytes = 100L)
      .select("part", "fid", "cum_before", "bin")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      ("p1", 1L, 0L, 0L),    // starts bin 0
      ("p1", 2L, 60L, 0L),   // still under 100
      ("p1", 3L, 120L, 1L),  // crossed -> bin 1 (oversized file owns it)
      ("p1", 4L, 370L, 3L),  // the 250-byte file pushed the next start to 370
      ("p2", 1L, 0L, 0L)))   // partitions are independent
  }

  test("compactionPlan is deterministic/idempotent over the same manifest") {
    val files = (1L to 50L).map(i => ("p", i, (i * 37) % 90 + 1)).toDF("part", "fid", "sz")
    val a = Layout.compactionPlan(files, "part", "fid", "sz", 128L)
      .select("fid", "bin").as[(Long, Long)].collect().sorted.toSeq
    val b = Layout.compactionPlan(files, "part", "fid", "sz", 128L)
      .select("fid", "bin").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
    // bins are contiguous, starting at 0, non-decreasing in file order
    assert(a.map(_._2).distinct == (0L to a.map(_._2).max).toSeq)
  }

  test("snapshotExpiryPlan: keepLast ranks win, window anchors to the table " +
    "head, ties break on snapshot id desc, tables independent") {
    val snaps = Seq(
      // t1: head at ts 1000; window = 200 back => >= 800
      ("t1", 1L, 100L), ("t1", 2L, 500L), ("t1", 3L, 850L),
      ("t1", 4L, 900L), ("t1", 5L, 1000L), ("t1", 6L, 500L), // tie with 2
      // t2: everything recent_n (only 2 snapshots)
      ("t2", 1L, 10L), ("t2", 2L, 20L)
    ).toDF("tbl", "snap", "ts")
    val got = Layout.snapshotExpiryPlan(snaps, "tbl", "snap", "ts",
        keepLast = 3, retainMs = 200L)
      .select("tbl", "snap", "rank_desc", "reason", "keep")
      .as[(String, Long, Long, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("t1", 5L)) == ((1L, "recent_n", true)))
    assert(got(("t1", 4L)) == ((2L, "recent_n", true)))
    assert(got(("t1", 3L)) == ((3L, "recent_n", true)))
    // rank 4 but inside the 200ms window anchored at 1000
    assert(got(("t1", 2L))._2 == "expire" && !got(("t1", 2L))._3)
    // ts tie 500/500: snap 6 ranks BEFORE snap 2 (id desc)
    assert(got(("t1", 6L))._1 < got(("t1", 2L))._1)
    assert(got(("t1", 1L)) == ((6L, "expire", false)))
    // t2: both kept by rank regardless of window
    assert(got(("t2", 2L)) == ((1L, "recent_n", true)))
    assert(got(("t2", 1L)) == ((2L, "recent_n", true)))
  }

  test("crawlSchedule: distributed rank equals the per-host window form on " +
    "a 90%-hot-host frontier; waves cap per-host concurrency") {
    import org.apache.spark.sql.{functions => F}
    // 90% of the frontier on one host, the rest spread over 5
    val urls = (0 until 200).map { i =>
      val host = if (i % 10 != 9) "hot.example.com" else s"h${i % 5}.example.org"
      (host, f"https://$host/p/$i%04d")
    }.toDF("host", "url")
    val got = graft.extract.UrlOps.crawlSchedule(urls, "host", "url", 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // window-form reference
    val ref = urls.withColumn("host_rank",
        F.row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("host").orderBy("url")).cast("long"))
      .withColumn("wave", F.expr("(host_rank - 1) div 4L"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == ref)
    // no wave holds more than `concurrency` URLs of one host
    val perWave = got.toSeq.groupBy { case ((h, _), (_, w)) => (h, w) }
      .map(_._2.size)
    assert(perWave.max <= 4 && perWave.min >= 1)
  }

  test("scd2History: intervals tile each key's timeline; current row open; " +
    "ties ordered by id") {
    val caps = Seq(
      ("u1", 1L, 100L), ("u1", 2L, 300L), ("u1", 3L, 200L),
      ("u1", 4L, 200L), // ts tie with 3 -> id order
      ("u2", 9L, 50L)
    ).toDF("key", "id", "ts")
    val got = graft.extract.UrlOps.scd2History(caps, Seq("key"), "ts", "id")
      .select("key", "id", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Long, Option[Long], Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("u1", 1L)) == ((100L, Some(200L), false)))
    assert(got(("u1", 3L)) == ((200L, Some(200L), false))) // zero-length, id 3 < 4
    assert(got(("u1", 4L)) == ((200L, Some(300L), false)))
    assert(got(("u1", 2L)) == ((300L, None, true)))
    assert(got(("u2", 9L)) == ((50L, None, true)))
  }

  test("writeRecord round trip: parse(write(r)) == r for text, binary, " +
    "empty, and header-quoting payloads") {
    val payloads = Seq(
      "plain body".getBytes("UTF-8"),
      Array.emptyByteArray,
      (0 until 256).map(_.toByte).toArray, // every byte value incl. CR/LF
      // the resync trap: a payload QUOTING a full WARC header block
      ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n")
        .getBytes("ISO-8859-1"))
    val recs = payloads.zipWithIndex.map { case (p, i) =>
      Warc.writeRecord(
        if (i % 2 == 0) "response" else "metadata",
        s"http://w.example.org/p/$i", s"application/x-test-$i", p)
    }
    val seg = Warc.writeSegment(recs)
    val parsed = Warc.parseSegment(7L, seg)
    assert(parsed.length == payloads.length, s"record count: ${parsed.length}")
    for ((p, i) <- payloads.zipWithIndex) {
      val r = parsed(i)
      assert(r.rec_idx == i && r.doc_id == 7L)
      assert(r.warc_type == (if (i % 2 == 0) "response" else "metadata"))
      assert(r.target_uri == s"http://w.example.org/p/$i")
      assert(r.content_type == s"application/x-test-$i")
      assert(r.content_length == p.length.toLong)
      assert(r.payload_md5 == Warc.md5Hex(p), s"payload $i digest drift")
    }
  }

  test("partitionPrune: stats pruning is SOUND (files with matches are " +
    "always read) and actually prunes on the fixture corpus") {
    val rows = graft.queries.Queries
      .partitionPrune(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val mustRead = r.getAs[Boolean]("must_read")
      val matching = r.getAs[Long]("n_matching")
      assert(matching == 0 || mustRead,
        s"UNSOUND prune: file ${r.getAs[Int]("file_id")} has $matching matches")
      // verdict re-derivable from the published bounds (inclusive projection)
      val expect = r.getAs[String]("min_lang") <= "en" &&
        "en" <= r.getAs[String]("max_lang") &&
        r.getAs[Long]("max_chars") >= 500 && r.getAs[Long]("min_chars") <= 2000
      assert(mustRead == expect)
    }
    assert(rows.exists(!_.getAs[Boolean]("must_read")),
      "fixture demonstrates no pruning — every file read")
  }
}
