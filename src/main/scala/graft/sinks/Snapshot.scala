package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Iceberg-style snapshot emulation (north rule: per-partition checkpoint with
  * lineage + metrics, idempotent resume).
  *
  * No Iceberg runtime jars exist in the sandbox (`/opt/spark/jars`), so the
  * snapshot layout is emulated — documented in BASELINE.md: a Parquet directory
  * plus a `manifest.json` carrying schema, row count, per-partition row counts,
  * input lineage, and the wall time of the producing job. A snapshot is
  * complete iff the manifest exists and its row count matches; `resumeOrWrite`
  * is the idempotent-resume primitive every pipeline stage goes through.
  */
object Snapshot {

  final case class Manifest(
      table: String,
      rows: Long,
      partitions: Seq[(Int, Long)],
      inputs: Seq[String],
      schemaJson: String,
      wallMs: Long,
      writtenAtMs: Long
  )

  private def jstr(s: String) = graft.ns.Registry.jstr(s)

  def manifestJson(m: Manifest): String = {
    val parts = m.partitions
      .map { case (id, n) => s"""    {"id": $id, "rows": $n}""" }
      .mkString("[\n", ",\n", "\n  ]")
    s"""{
  "table": ${jstr(m.table)},
  "rows": ${m.rows},
  "partitions": $parts,
  "inputs": ${m.inputs.map(jstr).mkString("[", ", ", "]")},
  "schema": ${jstr(m.schemaJson)},
  "wall_ms": ${m.wallMs},
  "written_at_ms": ${m.writtenAtMs}
}"""
  }

  // underscore prefix: Spark's file readers ignore it inside the data dir
  def manifestPath(dir: String): Path = Paths.get(dir, "_manifest.json")

  def isComplete(dir: String): Boolean = Files.exists(manifestPath(dir))

  /** Write `df` as a snapshot at `dir` with a per-partition lineage manifest. */
  def write(df: DataFrame, dir: String, table: String, inputs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dir)
    val written = spark.read.parquet(dir)
    val perPart = written
      .groupBy(F.spark_partition_id().as("pid"))
      .agg(F.count(F.lit(1)).as("rows"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq
    val rows = perPart.map(_._2).sum
    val m = Manifest(
      table, rows, perPart, inputs, written.schema.json,
      (System.nanoTime() - t0) / 1000000, System.currentTimeMillis())
    Files.write(manifestPath(dir), manifestJson(m).getBytes(StandardCharsets.UTF_8))
    written
  }

  /** Snapshot for driver-materialized tiny tables (e.g. the summary): writes
    * the parquet and a single-partition manifest without the read-back pass.
    */
  def writeSmall(df: DataFrame, dir: String, table: String, inputs: Seq[String], rows: Long): Unit = {
    val t0 = System.nanoTime()
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val m = Manifest(table, rows, Seq((0, rows)), inputs, df.schema.json,
      (System.nanoTime() - t0) / 1000000, System.currentTimeMillis())
    Files.write(manifestPath(dir), manifestJson(m).getBytes(StandardCharsets.UTF_8))
  }

  /** Idempotent resume: reuse a complete snapshot, else compute + write it. */
  def resumeOrWrite(
      spark: SparkSession,
      dir: String,
      table: String,
      inputs: Seq[String]
  )(compute: => DataFrame): DataFrame =
    if (isComplete(dir)) spark.read.parquet(dir)
    else write(compute, dir, table, inputs)
}
