package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run batched per partition.
  *
  * The decode step is STUBBED (no image/audio libraries in this container):
  * [[decodeStub]] derives deterministic fake metadata from the bytes. The
  * Spark-side plumbing — schema, batching via `mapPartitions` on a typed
  * Dataset, partition-parallel feature extraction, frame-sample explode — is
  * real and tested; swapping the stub for a real codec touches only
  * `decodeStub`.
  */
object Media {

  final case class MediaRow(id: Long, payload: Array[Byte], kind: String)
  final case class MediaMeta(
      id: Long, kind: String, n_bytes: Long, width: Int, height: Int, format: String)
  final case class Frame(id: Long, frame_idx: Int, offset: Long, checksum: Long)

  /** STUB decode: deterministic fake dimensions/format from the byte length.
    * A real implementation would parse the container header here.
    */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      id = id,
      kind = kind,
      n_bytes = n,
      width = (16 + n % 32).toInt,
      height = (16 + (n * 7) % 32).toInt,
      format = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }
    )
  }

  /** Batched decode over partitions (the mapInPandas-equivalent shape in Scala:
    * one iterator per partition, amortized per-batch setup).
    */
  def extractMeta(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition setup would initialize the codec once here
      it.map(r => decodeStub(r.id, r.kind, r.payload))
    }
  }

  /** Frame sampling: `1 + n_bytes % 8` frames per payload, deterministic
    * offsets and checksums — the explode shape of a real frame sampler.
    */
  def sampleFrames(rows: Dataset[MediaRow]): Dataset[Frame] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.flatMap { r =>
      val n = r.payload.length.toLong
      val frames = (1 + n % 8).toInt
      (0 until frames).map { i =>
        val off = if (frames == 0) 0L else i * (n / math.max(frames, 1))
        val cs = if (n == 0) 0L else r.payload(math.min(off, n - 1).toInt).toLong & 0xffL
        Frame(r.id, i, off, cs)
      }
    }
  }

  /** STUB resize: deterministic target-box fit (aspect-preserving integer
    * math). A real implementation would transcode `payload`; the stub keeps
    * the metadata transform (the part the pipeline plans around) real.
    */
  def resizeStub(meta: MediaMeta, maxDim: Int): MediaMeta = {
    val scaleNum = maxDim
    val scaleDen = math.max(meta.width, meta.height)
    if (scaleDen <= maxDim) meta
    else meta.copy(
      width = math.max(1, meta.width * scaleNum / scaleDen),
      height = math.max(1, meta.height * scaleNum / scaleDen))
  }

  def resize(metas: Dataset[MediaMeta], maxDim: Int): Dataset[MediaMeta] = {
    val spark = metas.sparkSession
    import spark.implicits._
    metas.map(m => resizeStub(m, maxDim))
  }

  /** Columnar variant of the stub metadata (oracle-parity path): identical
    * output to [[extractMeta]] purely with built-in functions.
    */
  def metaColumns(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      F.col(idCol).as("id"),
      F.lit(kind).as("kind"),
      F.length(F.col(payloadCol)).cast("long").as("n_bytes"))
      .withColumn("width", (F.lit(16) + F.col("n_bytes") % 32).cast("int"))
      .withColumn("height", (F.lit(16) + (F.col("n_bytes") * 7) % 32).cast("int"))
      .withColumn("format",
        F.when(F.col("n_bytes") % 3 === 0, "png")
          .when(F.col("n_bytes") % 3 === 1, "jpeg")
          .otherwise("webp"))
}
