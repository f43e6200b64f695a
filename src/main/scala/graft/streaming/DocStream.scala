package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming document ingestion with exact content-dedup — the streaming
  * counterpart of `Dedup.exact` for a corpus that arrives continuously
  * (new crawl segments landing as files/Kafka topics).
  *
  * The scale-critical choice is `dropDuplicatesWithinWatermark`, NOT
  * `dropDuplicates`: a plain streaming dropDuplicates keeps every key ever
  * seen in the state store — unbounded growth, the 100-TB failure mode. The
  * watermarked variant expires state once the event-time watermark passes a
  * key's window, so the store holds only the recent horizon (duplicates in
  * web crawls cluster in time: recrawls and mirror bursts, which a
  * few-hours watermark catches; far-apart duplicates are the batch dedup's
  * job over the materialized table).
  *
  * Dedup is keyed on `(xxhash64(text), md5(text))` — the same dual-hash
  * collision guarantee as the batch path (`Dedup.exact` keys on
  * md5+xxhash64+length precisely so a single 64-bit collision cannot drop a
  * distinct document). The state store carries ~40 bytes per key in the
  * horizon, never the body.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)
  ))

  /** Streaming doc source over a directory of parquet files (new files =
    * new crawl segments). `maxFilesPerTrigger > 0` bounds each micro-batch so
    * an `AvailableNow` drain spans several batches (exercising state-store
    * carry-over between them) instead of one giant batch.
    */
  def readDocs(spark: SparkSession, dir: String,
               maxFilesPerTrigger: Int = 0): DataFrame = {
    val base = spark.readStream.schema(docSchema)
    val r = if (maxFilesPerTrigger > 0)
      base.option("maxFilesPerTrigger", maxFilesPerTrigger) else base
    r.parquet(dir)
  }

  /** First-arrival-wins exact dedup by content hash, state bounded by the
    * event-time watermark `delay`. On a batch DataFrame the same call
    * degrades to a plain `dropDuplicates` on the hash (Spark rejects
    * `dropDuplicatesWithinWatermark` outside streaming) — the spec pins
    * that the streaming survivor set equals the batch distinct.
    */
  def dedupByContent(docs: DataFrame, delay: String): DataFrame = {
    val hashed = docs
      .withColumn("content_hash", F.xxhash64(F.col("text")))
      .withColumn("content_md5", F.md5(F.col("text")))
    if (docs.isStreaming)
      hashed.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("content_hash", "content_md5")
    else hashed.dropDuplicates("content_hash", "content_md5")
  }

  /** Wire source -> dedup -> in-memory sink (tests / demos). */
  def startMemoryDedup(
      spark: SparkSession,
      docsDir: String,
      delay: String,
      name: String,
      maxFilesPerTrigger: Int = 0
  ): StreamingQuery =
    dedupByContent(readDocs(spark, docsDir, maxFilesPerTrigger), delay)
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(name)
      .start()
}
