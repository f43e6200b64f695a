package graft.ns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for longest-prefix namespace resolution — the
  * optional performance upgrade from SURVEY.md §4.3: unlike a Scala UDF it
  * stays inside whole-stage codegen (no encoder round trip, no Option
  * boxing), and the lookup walks the input `UTF8String`'s bytes directly
  * through the packed [[Utf8PrefixTrie]] with zero per-call allocation (the
  * result rows are precomputed immutable `InternalRow`s, one per registered
  * namespace). The trie ships with the serialized expression (a few hundred
  * KB for a ~6k-prefix registry, broadcast once per stage with the task
  * binary).
  *
  * Semantics identical to `Registry.resolve` / reference
  * `longest_prefix(must_be_terminal = true)` with the empty-prefix miss rule
  * (chilon_rs `src/trie.rs:249-296`, `src/prefixes.rs:195-196`) — parity
  * with the UDF reference implementation is property-tested.
  */
case class ResolveNs(child: Expression, trie: Utf8PrefixTrie[NsEntry])
    extends UnaryExpression {

  override def dataType: DataType = ResolveNs.outType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_ns"

  /** One immutable result row per registered namespace, built once per
    * deserialized expression instance (per executor, not per row).
    */
  @transient private lazy val resultRows: Array[InternalRow] =
    Array.tabulate(trie.valueCount) { i =>
      InternalRow(
        UTF8String.fromString(trie.valueAt(i).alias),
        UTF8String.fromString(trie.prefixAt(i)))
    }

  /** Shared by interpreted eval and generated code. */
  def resolveRow(s: UTF8String): InternalRow = {
    val i = trie.resolveIdx(s)
    if (i < 0) null else resultRows(i)
  }

  override protected def nullSafeEval(input: Any): Any =
    resolveRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("resolveNs", this, classOf[ResolveNs].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |InternalRow ${ev.value}_r = $self.resolveRow($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ResolveNs {
  val outType: StructType = StructType(Seq(
    StructField("alias", StringType, nullable = false),
    StructField("ns", StringType, nullable = false)))

  /** Column wrapper: `resolve_ns(iriCol)` against a driver-built registry. */
  def column(iri: Column, registry: Registry): Column =
    ColumnShim.column(ResolveNs(ColumnShim.expression(iri), registry.utf8Trie))
}
