package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the hot scalar of the whole ANN family
  * (brute/IVF scoring, LSH verification, semantic dedup runs it per
  * candidate pair; at corpus scale that is billions of evaluations).
  *
  * The `zip_with` + `aggregate` Column form it replaces is a higher-order
  * function: evaluated per element through lambda interpretation, outside
  * whole-stage codegen (~16 µs per 64-dim pair measured). This expression
  * compiles to a tight primitive loop inside the generated code
  * (`doGenCode`), no per-element boxing, no closure dispatch.
  *
  * Numerical contract: IDENTICAL double arithmetic and fold order as the
  * Column form — each float widens exactly to double; dot, |a|² and |b|²
  * accumulate left-to-right in index order; result = dot/(√na·√nb). The
  * DuckDB oracles replicate the same ordered folds, so swapping this in is
  * bit-invisible to every q_sim_* / q_dedup_embedding / q_sem_dedup hash.
  * Parity with the Column form is property-tested (TrainOpsSpec).
  *
  * One deliberate difference: a zero-norm input yields IEEE NaN (raw double
  * division) where the Column form under ANSI mode FAILS THE JOB with
  * DIVIDE_BY_ZERO. At corpus scale a single all-zero embedding must not
  * kill a billion-pair stage; NaN compares false against any threshold, so
  * zero vectors simply never match.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column wrapper: codegen'd cosine over two array<float> columns. */
  def column(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))
}
