package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Standard KMV pairwise Jaccard estimate over two SORTED k-minimum-value
  * sketches: J ≈ |K_k(A∪B) ∩ A' ∩ B'| / |K_k(A∪B)| — the intersection ratio
  * restricted to the k SMALLEST elements of the union of the sketches.
  *
  * Why not |A'∩B'|/|A'∪B'| (ADVICE r4): that naive form is biased DOWNWARD
  * for size-asymmetric pairs — for A ⊂ B with |B| = 2|A| and true J = 0.5,
  * capped sketches estimate ≈ 1/3, because B's sketch reaches only half as
  * deep into the hash order as A's and the unmatched tail of A' deflates the
  * ratio. Restricting both the numerator and the denominator to the k
  * smallest union elements samples A and B at the SAME hash depth, which is
  * the textbook KMV estimator and unbiased.
  *
  * With k ≥ |A'∪B'| (uncapped sketches) this degrades to exact Jaccard —
  * the registered dedup queries keep their exact semantics; the cap is the
  * 100 TB shuffle-bound knob.
  *
  * Same codegen shape as [[SortedIntersectCount]]: primitive two-pointer
  * merge, no allocation, inlined into the surrounding stage. */
case class SortedKmvJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, "KMV cutoff k must be positive")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_kmv_jaccard expects array<bigint> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var union = 0; var inter = 0
    while (union < k && (i < x.numElements() || j < y.numElements())) {
      if (i < x.numElements() && j < y.numElements()) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u == v) { inter += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      } else if (i < x.numElements()) i += 1
      else j += 1
      union += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val un = ctx.freshName("un"); val in = ctx.freshName("in")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $i = 0; int $j = 0; int $un = 0; int $in = 0;
         |while ($un < $k && ($i < $a.numElements() || $j < $b.numElements())) {
         |  if ($i < $a.numElements() && $j < $b.numElements()) {
         |    long $u = $a.getLong($i);
         |    long $v = $b.getLong($j);
         |    if ($u == $v) { $in++; $i++; $j++; }
         |    else if ($u < $v) { $i++; }
         |    else { $j++; }
         |  } else if ($i < $a.numElements()) { $i++; }
         |  else { $j++; }
         |  $un++;
         |}
         |${ev.value} = ($un == 0) ? 0.0 : ((double) $in) / $un;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedKmvJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedKmvJaccard {
  /** Column API: KMV Jaccard estimate at cutoff `k`. */
  def apply(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(SortedKmvJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}
