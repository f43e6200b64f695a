package graft.streaming

import graft.model.Page
import graft.ns.Registry
import graft.pipeline.Pipeline
import graft.summarize.Normalize
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingestion of the page table (north-rule input_hint shape): the
  * SAME extraction stage the batch pipeline runs
  * ([[Pipeline.extractTriples]]), expressed as a Structured Streaming flow —
  * at 100 TB the corpus arrives continuously (new crawl segments landing in
  * the Iceberg table), and re-running batch extraction over the full table per
  * segment is the anti-pattern. The file source here swaps for Kafka or an
  * Iceberg streaming read unchanged.
  *
  *   - per-micro-batch triple extraction is embarrassingly parallel
  *     (stateless flatMap — no shuffle, no state store);
  *   - the running namespace summary is a streaming group-count in Update
  *     mode: Spark keeps the (s_ns, p_ns, o_ns, is_datatype) counts in the
  *     state store, and each batch shuffles only its own normalized rows
  *     (partial-aggregated map-side first — the same two-phase shape as the
  *     batch job).
  */
object PageStream {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  /** Streaming page source over a directory of parquet files (new files =
    * new crawl segments). `maxFilesPerTrigger > 0` bounds each micro-batch to
    * that many files — with `Trigger.AvailableNow` the backlog still drains
    * to completion, but across SEVERAL micro-batches, which is what exercises
    * the state-store accumulation path (a single giant batch would be
    * indistinguishable from the batch job).
    */
  def readPages(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = spark.readStream.schema(pageSchema)
    val r = if (maxFilesPerTrigger > 0)
      base.option("maxFilesPerTrigger", maxFilesPerTrigger) else base
    r.parquet(dir).as[Page]
  }

  /** Streaming triple extraction: identical per-row logic to the batch
    * Stage A (OpenIE over mentions, canonicalized), stateless.
    */
  def extractTriples(pages: Dataset[Page]): DataFrame =
    Pipeline.extractTriples(pages).toDF()

  /** Running namespace summary (Update mode): normalize against the
    * broadcast registry, then a streaming group-count over the group keys.
    */
  def runningSummary(triples: DataFrame, registry: Registry): DataFrame = {
    val bc = triples.sparkSession.sparkContext.broadcast(registry)
    Normalize.normalize(triples, bc)
      .groupBy("s_ns", "p_ns", "o_ns", "is_datatype")
      .agg(F.count(F.lit(1)).as("occurs"))
  }

  /** Wire the full flow to an in-memory sink (tests / demos): returns the
    * started query; the caller `processAllAvailable()`s and reads
    * `spark.table(name)`.
    */
  def startMemorySummary(
      spark: SparkSession,
      pagesDir: String,
      registry: Registry,
      name: String
  ): StreamingQuery =
    runningSummary(extractTriples(readPages(spark, pagesDir)), registry)
      .writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(name)
      .start()

  /** Complete-mode variant for the driver's correctness gate: after
    * `AvailableNow` drains the staged segments (in `maxFilesPerTrigger`-file
    * micro-batches), the memory table holds EXACTLY the final summary — the
    * same (s_ns, p_ns, o_ns, is_datatype) -> occurs rows the batch job
    * produces, so the batch DuckDB oracle applies verbatim to the streaming
    * path.
    */
  def startCompleteSummary(
      spark: SparkSession,
      pagesDir: String,
      registry: Registry,
      name: String,
      maxFilesPerTrigger: Int
  ): StreamingQuery =
    runningSummary(extractTriples(readPages(spark, pagesDir, maxFilesPerTrigger)), registry)
      .writeStream
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(name)
      .start()
}
