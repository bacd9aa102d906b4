package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two `array<float>` vectors as a native Catalyst
  * expression — the SQL spelling of [[VecKernels.cosine]] (identical double
  * fold, so a score computed through `graft_cosine(...)` is bit-equal to
  * the kernel and ANN-index paths).
  *
  * This is the MATCHABLE anchor for the vector top-k rewrite (VERDICT r12
  * next #3): `ORDER BY round(graft_cosine(emb, <query literal>), 6) DESC
  * LIMIT k` over a graft base table is a structural pattern
  * [[graft.catalog.VectorTopKRewriteRule]] recognizes and serves from a
  * fresh [[graft.store.AnnIndex]]. Un-rewritten (no index, stale index,
  * extra filters) it executes as a codegen'd brute-force scan — correct
  * either way, the rewrite only changes the plan. */
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
      s"graft_cosine expects array<float> inputs (CAST the query vector), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosineAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.cosineAD($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
