package graft.ns

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's namespace functions in
  * the SQL function registry so plain `spark.sql(...)` users get them —
  * the (c) extension path from the build plan, complementing the Column API.
  *
  *   spark.sql("SELECT graft_resolve_ns(iri).alias FROM iris")
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.ns.GraftExtensions")` or inject
  * programmatically with `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * The SQL function resolves against the vendored community registry (built
  * once per driver, shipped inside the serialized expression). Pipelines
  * whose registry grows by inference use the Column API
  * ([[ResolveNs.column]]) with their own registry instance — a SQL function
  * signature has nowhere to carry runtime state.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.resolveNsDescriptor)
    ext.injectFunction(GraftExtensions.segPrefixesDescriptor)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.hashedScoreDescriptor)
    ext.injectFunction(GraftExtensions.dsirBucketsDescriptor)
  }
}

object GraftExtensions {

  /** Community-registry trie, built once per JVM for the SQL function. */
  lazy val communityTrie: Utf8PrefixTrie[NsEntry] = Registry.community().utf8Trie

  val resolveNsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_resolve_ns"),
    new ExpressionInfo(classOf[ResolveNs].getName, "graft_resolve_ns"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_resolve_ns(iri) takes exactly one argument")
      ResolveNs(children.head, communityTrie)
    }
  )

  /** `graft_cosine_sim(array<float>, array<float>) -> double` — the ANN
    * family's codegen'd hot scalar ([[graft.sim.CosineSim]]).
    */
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine_sim"),
    new ExpressionInfo(classOf[graft.sim.CosineSim].getName, "graft_cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine_sim(a, b) takes exactly two arguments")
      graft.sim.CosineSim(children.head, children(1))
    }
  )

  /** `graft_hashed_score(array<string>) -> bigint` — hashed-feature linear
    * classifier milli-score at the catalog defaults
    * ([[graft.textops.HashedLinearScore]]).
    */
  val hashedScoreDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hashed_score"),
    new ExpressionInfo(classOf[graft.textops.HashedLinearScore].getName, "graft_hashed_score"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_hashed_score(toks) takes exactly one argument")
      graft.textops.HashedLinearScore(children.head,
        graft.textops.HashedLinearScore.DefaultBuckets,
        graft.textops.HashedLinearScore.DefaultSeed)
    }
  )

  /** `graft_dsir_buckets(array<string>) -> array<bigint>` — DSIR hashed
    * feature-bucket ids at the catalog defaults ([[graft.textops.Dsir]]).
    */
  val dsirBucketsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_buckets"),
    new ExpressionInfo(classOf[graft.textops.Dsir.FeatureBuckets].getName, "graft_dsir_buckets"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_dsir_buckets(toks) takes exactly one argument")
      graft.textops.Dsir.FeatureBuckets(children.head,
        graft.textops.Dsir.DefaultBuckets, graft.textops.Dsir.DefaultSeed)
    }
  )

  /** Table-generating: `SELECT seg_prefixes(iri) FROM ...` (like explode). */
  val segPrefixesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_seg_prefixes"),
    new ExpressionInfo(classOf[SegPrefixesGen].getName, "graft_seg_prefixes"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_seg_prefixes(iri) takes exactly one argument")
      SegPrefixesGen(children.head)
    }
  )
}
