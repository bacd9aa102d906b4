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

  /** The usual shape is `graft_cosine(col, <query literal>)`: hoist the
    * foldable side ONCE (per plan in codegen, per deserialized instance
    * interpreted) so the per-row work is a single no-copy fold over the
    * column's ArrayData instead of two dim-sized array copies per row. */
  @transient private lazy val hoistedRight: Option[Array[Float]] =
    if (right.foldable) Option(right.eval())
      .map(_.asInstanceOf[ArrayData].toFloatArray())
    else None

  override protected def nullSafeEval(a: Any, b: Any): Any =
    hoistedRight match {
      case Some(q) => VecKernels.cosineADQ(a.asInstanceOf[ArrayData], q)
      case None =>
        VecKernels.cosineAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    hoistedRight match {
      case Some(q) =>
        val ref = ctx.addReferenceObj("graftCosineQuery", q, "float[]")
        nullSafeCodeGen(ctx, ev, (a, _) =>
          s"${ev.value} = graft.functions.VecKernels.cosineADQ($a, $ref);")
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.functions.VecKernels.cosineAD($a, $b);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
