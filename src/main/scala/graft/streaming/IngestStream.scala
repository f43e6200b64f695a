package graft.streaming

import graft.extract.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming crawl ingestion: the fused WARC → HTTP → charset → text chain
  * ([[graft.extract.Ingest]]) applied to a STREAM of crawl segments — the
  * continuous-ingest shape of a production crawl (segments land as they are
  * fetched; pages flow out as they are parsed). The chain is stateless
  * per-row work, so the streaming plan is the batch plan under a file
  * source: no state store, no watermark, every micro-batch independent —
  * which is exactly why the drained result must equal the batch run
  * bit-for-bit (pinned by q_stream_ingest under the SAME oracle as
  * q_ingest_e2e).
  */
object IngestStream {

  private val SegmentSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("warc", BinaryType)))

  /** File-source stream over staged (doc_id, warc) parquet segments. */
  def readSegments(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(SegmentSchema)
    (if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r)
      .parquet(dir)
  }

  /** Wire source → fused ingest → in-memory sink, drained AvailableNow. */
  def startMemoryIngest(
      spark: SparkSession,
      segmentsDir: String,
      name: String,
      maxFilesPerTrigger: Int = 0
  ): StreamingQuery =
    Ingest.ingestSegments(readSegments(spark, segmentsDir, maxFilesPerTrigger),
        "doc_id", "warc")
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(name)
      .start()
}
