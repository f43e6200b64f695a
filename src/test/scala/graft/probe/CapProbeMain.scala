package graft.probe

import graft.dedup.Dedup
import org.apache.spark.sql.{SparkSession, functions => F}

/** Manual diagnostic for the dedup/LSH caps on a skewed corpus (one
  * 3000-identical-doc cluster): run with `Test/runMain graft.probe.CapProbeMain`.
  * The same bounds are asserted by SkewStressSpec.
  */
object CapProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("cap-probe")
      .config("spark.sql.shuffle.partitions", 8).config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dup = (0 until 3000).map(i => (i.toLong, "the same boilerplate text repeated for every page in this cluster exactly"))
    val uniq = (3000 until 5000).map(i => (i.toLong, s"unique document number $i with entirely distinct words w$i x${i * 7} y${i * 13} z${i * 31} plus filler"))
    val docs = (dup ++ uniq).toDF("doc_id", "text")
    val capped = Dedup.minHashLsh(docs, "doc_id", "text", k = 3, threshold = 0.6, maxBucket = 100)
    println("CAPPED_MINHASH_PAIRS=" + capped.count())
    val sigUdf = F.udf((t: String) => Dedup.bandKeys(Dedup.minHashSignature(t, 3, 64), 16))
    val banded = docs.select($"doc_id".as("id"), F.posexplode(sigUdf($"text")).as(Seq("band", "bkey")))
    val ovf = Dedup.bucketOverflow(banded, Seq("band", "bkey"), 100)
    println("OVERFLOW_ROWS=" + ovf.count() + " DISTINCT_OVERFLOW_BUCKETS=" + ovf.select("band", "bkey").distinct().count())
    val tj = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.5, maxDf = 100)
    println("TOKENJACCARD_CAPPED_PAIRS=" + tj.count())
    val tjsmall = Dedup.tokenJaccardPairs(docs.filter($"doc_id" < 40), "doc_id", "text", 0.5, maxDf = 100000)
    println("TOKENJACCARD_UNCAPPED_SMALL=" + tjsmall.count())
    val sp = Dedup.simHashPairs(docs.filter($"doc_id" >= 2990), "doc_id", "text", maxDist = 3, maxBucket = 100)
    println("SIMHASH_CAPPED_PAIRS=" + sp.count())
    spark.stop()
  }
}
