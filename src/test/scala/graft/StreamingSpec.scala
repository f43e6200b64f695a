package graft

import graft.streaming.EventStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("windowed streaming aggregation replays the batch events table") {
    val dir = SparkSuite.tmpDir("stream-in")
    // stage the parquet into a dedicated dir (readStream takes a directory)
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val got = EventStream.replayWindowed(spark, dir, "win_test")
    // append mode + watermark: only windows older than (max ts - watermark)
    // are emitted; replaying a bounded table emits all but the last window(s)
    assert(got.count() > 0)
    // batch equivalence on the emitted windows
    val batch = spark.read.parquet(dir)
      .groupBy(F.window($"ts", "1 hour"), $"event_type")
      .agg(F.count(F.lit(1)).as("n"), F.round(F.sum("value"), 4).as("total_value"))
      .select(F.col("window.start").as("win_start"), $"event_type", $"n", $"total_value")
    // float sums accumulate in a different order under incremental execution;
    // compare counts exactly and values within tolerance
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("win_start", F.col("win_start").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val gotMap = keyed(got)
    val batchMap = keyed(batch)
    gotMap.foreach { case (k, (n, v)) =>
      assert(batchMap.contains(k), s"window $k missing from batch")
      assert(batchMap(k)._1 == n)
      assert(math.abs(batchMap(k)._2 - v) < 1e-4)
    }
  }

  test("streaming page ingestion reproduces the batch summary counts") {
    import graft.streaming.PageStream
    val dir = SparkSuite.tmpDir("page-stream")
    // two "crawl segments" as separate files
    graft.extract.Synth.pages(spark, 150).toDF()
      .write.mode("overwrite").parquet(dir)
    val registry = {
      // fix the registry once (as the batch pipeline would after inference)
      val out = SparkSuite.tmpDir("page-stream-reg")
      graft.pipeline.Pipeline.run(spark, graft.extract.Synth.pages(spark, 150),
        graft.pipeline.Pipeline.Config(outDir = out, minOccurs = 1,
          minNsSize = 50, minDomainOccurs = 5, resume = false)).registry
    }
    val q = PageStream.startMemorySummary(spark, dir, registry, "page_sum")
    q.awaitTermination()
    // Update-mode memory sink appends the UPDATED rows of every micro-batch;
    // counts grow monotonically per key, so the final value is the max
    val streamed = spark.table("page_sum")
      .groupBy("s_ns", "p_ns", "o_ns", "is_datatype")
      .agg(F.max("occurs").as("occurs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)) -> r.getLong(4))
      .toMap
    // batch equivalent over the same pages with the same fixed registry
    val bc = spark.sparkContext.broadcast(registry)
    val batch = graft.summarize.Normalize
      .summarize(graft.summarize.Normalize.normalize(
        graft.pipeline.Pipeline.extractTriples(graft.extract.Synth.pages(spark, 150)).toDF(), bc))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)) -> r.getLong(4))
      .toMap
    assert(streamed == batch)
  }

  test("Complete-mode summary drains AvailableNow across multiple micro-batches") {
    import graft.streaming.PageStream
    val dir = SparkSuite.tmpDir("page-stream-complete")
    // 8 segment files, 2-file micro-batches => 4 state-store accumulations
    graft.extract.Synth.pages(spark, 120).toDF()
      .repartition(8).write.mode("overwrite").parquet(dir)
    val registry = {
      val out = SparkSuite.tmpDir("page-stream-complete-reg")
      graft.pipeline.Pipeline.run(spark, graft.extract.Synth.pages(spark, 120),
        graft.pipeline.Pipeline.Config(outDir = out, minOccurs = 1,
          minNsSize = 50, minDomainOccurs = 5, resume = false)).registry
    }
    val q = PageStream.startCompleteSummary(spark, dir, registry,
      "page_sum_complete", maxFilesPerTrigger = 2)
    q.awaitTermination()
    // the backlog genuinely drained across >1 micro-batch (state-store path)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    val streamed = spark.table("page_sum_complete").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)) -> r.getLong(4))
      .toMap
    val bc = spark.sparkContext.broadcast(registry)
    val batch = graft.summarize.Normalize
      .summarize(graft.summarize.Normalize.normalize(
        graft.pipeline.Pipeline.extractTriples(graft.extract.Synth.pages(spark, 120)).toDF(), bc))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)) -> r.getLong(4))
      .toMap
    assert(streamed == batch)
  }

  test("streaming content dedup (watermark-bounded state) matches batch distinct") {
    import graft.streaming.DocStream
    val dir = SparkSuite.tmpDir("doc-stream")
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def batch(ids: Range, mod: Int) = ids.map { i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 1000L), s"doc body ${i % mod}")
    }
    // two "crawl segments" as separate files; duplicates within AND across
    // segments (texts cycle mod 4 in both)
    batch(0 until 10, 4).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    batch(10 until 16, 4).toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val q = DocStream.startMemoryDedup(spark, dir, "1 hour", "doc_dedup")
    q.awaitTermination()
    val got = spark.table("doc_dedup").collect()
      .map(r => r.getAs[String]("text")).toSeq
    // one survivor per distinct content; survivor set == batch distinct
    assert(got.sorted == (0 until 4).map(m => s"doc body $m"))
    // and the same operator on a BATCH frame degrades to plain distinct
    val asBatch = DocStream.dedupByContent(
      batch(0 until 16, 4).toDF("doc_id", "ts", "text"), "1 hour")
    assert(asBatch.count() == 4)
    assert(asBatch.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      (0 until 4).map(m => s"doc body $m"))
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    val dir = SparkSuite.tmpDir("stream-sess")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(EventStream.schema).parquet(dir)
      .withWatermark("ts", "10 minutes")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.sessionize(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_test").start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_test").collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall(_.getAs[Int]("n_events") > 0))
  }

  test("streaming ingest drains across multiple micro-batches and equals " +
    "the batch chain bit-for-bit (stateless => batch-equivalent)") {
    val segs = graft.queries.Queries.ingestSegmentsDf(spark, "/root/testdata/sf0.001")
    val dir = SparkSuite.tmpDir("ingest-stream")
    segs.repartition(8).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.IngestStream.startMemoryIngest(
      spark, dir, "ingest_stream_test", maxFilesPerTrigger = 2)
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    val streamed = spark.table("ingest_stream_test").collect()
      .map(_.toSeq).toSet
    val batch = graft.extract.Ingest
      .ingestSegments(segs, "doc_id", "warc").toDF().collect()
      .map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("append-mode watermark: late rows drop, windows emit once at " +
    "eviction, the trailing no-data batch flushes the final horizon") {
    import org.apache.spark.sql.{functions => F}
    // hand-built schedule (same as WatermarkProbeMain): one file per batch,
    // minute offsets per file; delay 10 min, window 10 min
    val buckets = Seq(Seq(2, 50), Seq(30, 39), Seq(35), Seq(70))
    val stage = java.nio.file.Files.createTempDirectory("late-sem")
    val tmpRoot = java.nio.file.Files.createTempDirectory("late-sem-tmp")
    buckets.zipWithIndex.foreach { case (mins, k) =>
      val df = mins.toDF("min")
        .select(F.col("min").cast("long").as("event_id"),
          F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,min,0)").as("ts"),
          F.lit(1L).as("user_id"), F.lit("x").as("event_type"),
          F.lit(0.0).as("value"), F.lit(null).cast("string").as("props"))
      val tmp = s"$tmpRoot/seg-$k"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(stage.toFile, s"seg-$k.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(1700000000000L + k * 1000L))
    }
    val q = graft.streaming.EventStream.startMemoryLateWindows(
      spark, stage.toString, "late_sem_test", maxFilesPerTrigger = 1)
    q.awaitTermination()
    // wmEvict(b1) = 00:50 − 10 = 00:40  →  [0,10) and [30,40) emit at b1
    // (end == wm boundary INCLUSIVE); b2's 35 targets the evicted [30,40)
    // → dropped; b3's 70 advances the final watermark to 01:00 via the
    // no-data flush batch → [50,60) emits; [70,80) stays unflushed.
    val got = spark.table("late_sem_test")
      .select(F.col("wstart").cast("string"), F.col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00", 1L),
      ("2024-01-01 00:30:00", 2L),
      ("2024-01-01 00:50:00", 1L)), s"got $got")
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 1L, s"expected exactly the one late row dropped, got $dropped")
  }

  test("hopping-window streaming drain combines cross-batch window " +
    "fragments through the state store and equals the batch aggregation") {
    import org.apache.spark.sql.{functions => F}
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", F.lit(null).cast("string"))
    val dir = SparkSuite.tmpDir("hop-stream")
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventStream.startMemoryHopping(
      spark, dir, "hop_stream_test", maxFilesPerTrigger = 2)
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("wstart").cast("string"), F.col("wend").cast("string"),
          F.col("event_type"), F.col("n_events"), F.col("user_sum"))
        .collect().map(_.toSeq).toSet
    val batch = events
      .groupBy(F.window(F.col("ts"), "60 minutes", "15 minutes"),
        F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n_events"), F.sum("user_id").as("user_sum"))
      .select(F.col("window.start").as("wstart"), F.col("window.end").as("wend"),
        F.col("event_type"), F.col("n_events"), F.col("user_sum"))
    assert(norm(spark.table("hop_stream_test")) == norm(batch))
  }

  test("native session_window streaming drain merges cross-batch sessions " +
    "through the state store and equals the batch aggregation") {
    import org.apache.spark.sql.{functions => F}
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", F.lit(null).cast("string"))
    val dir = SparkSuite.tmpDir("sess-stream")
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventStream.startMemorySessionWindows(
      spark, dir, "sess_stream_test", maxFilesPerTrigger = 2)
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    // normalize timestamps to epoch micros: the memory sink and a batch
    // collect surface different external JVM types for the same values
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("user_id"),
          F.col("session_start").cast("string").as("s"),
          F.col("session_end").cast("string").as("e"),
          F.col("n_events"), F.col("value_micro"))
        .collect().map(_.toSeq).toSet
    val streamed = norm(spark.table("sess_stream_test"))
    val batch = norm(graft.queries.Queries
      .sessionWindowEvents(spark, "/root/testdata/sf0.001"))
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture produced no sessions")
  }

  test("stream-static broadcast enrichment drains across micro-batches and " +
    "equals the batch join + aggregation") {
    import org.apache.spark.sql.{functions => F}
    val sf = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", F.lit(null).cast("string"))
    val dir = SparkSuite.tmpDir("enrich-stream")
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val dim = spark.read.parquet(s"$sf/customer.parquet")
    val q = graft.streaming.EventStream.startMemoryEnriched(
      spark, dir, dim, "c_custkey", "c_mktsegment", "enrich_stream_test",
      maxFilesPerTrigger = 2)
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    val streamed = spark.table("enrich_stream_test")
      .collect().map(_.toSeq).toSet
    val batch = events
      .join(dim.select(F.col("c_custkey").cast("long").as("dim_key"),
        F.col("c_mktsegment").as("segment")),
        F.col("user_id") === F.col("dim_key"))
      .groupBy("segment", "event_type")
      .agg(F.count(F.lit(1)).as("n_events"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).as("value_micro"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture produced no enriched groups")
  }

  test("stream-stream attribution join drains across micro-batches and " +
    "equals the batch join (no state eviction under the span-sized delay)") {
    import org.apache.spark.sql.{functions => F}
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", F.lit(null).cast("string"))
    val dir = SparkSuite.tmpDir("join-stream")
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventStream.startMemoryAttribution(
      spark, dir, "join_stream_test", maxFilesPerTrigger = 2)
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length > 1,
      s"expected multiple micro-batches, got ${batches.length}")
    val streamed = spark.table("join_stream_test").collect().map(_.toSeq).toSet
    val batch = graft.streaming.EventStream.attributionJoin(
        events.filter(F.col("event_type") === "signup"),
        events.filter(F.col("event_type") === "purchase"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture produced no attribution pairs")
  }
}
