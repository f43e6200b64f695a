package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1.1/§1.4): times an arbitrary subset
  * of the declared catalog with the SAME session shape and action as the
  * frozen `Bench` sweep (count() after warmup, per-query minimum over reps),
  * and optionally dumps `.explain("formatted")` per query for the
  * plans/r06/ before/after evidence. Never used by the driver — `Bench`
  * remains the measurement contract.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q_kg_hits,q_stream_join"   # subset
  *   sbt "runMain graft.BenchExtra all"                       # full catalog
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     local[] cores + shuffle partitions (default 32)
  *   SPARK_GRAFT_XREPS    timed reps after 1 warmup (default 2)
  *   SPARK_GRAFT_PLAN_DIR if set, write <name>.txt formatted plans there
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_XREPS", "2").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val wanted: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    planDir.foreach(d => new java.io.File(d).mkdirs())
    val results = wanted.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      spark.sparkContext.setJobDescription(name)
      // warmup (JIT/codegen/catalog caches) then timed reps, min — the frozen
      // Bench sweep's exact shape
      fn(spark, sfDir).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      planDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      System.err.println(f"[extra] $name%-28s ${times.min}%.3f s  (all: ${times.map(t => f"$t%.3f").mkString(" ")})")
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","total":${f"${results.map(_._2).sum}%.3f"},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
