package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) code: interleave the low `bits` bits of each child into
  * one Long, child 0 contributing the least-significant bit of each group.
  *
  * Why a custom Catalyst expression (SURVEY §2.J preference order (b)): the
  * z-value is evaluated once per row during a full-table compaction rewrite —
  * a 100 TB-scale pass — and a built-in composition would be `bits × n`
  * chained shiftleft/or calls (a ~64-node expression tree per row, deep
  * codegen splits). This is a tight two-level loop generated inline into the
  * rewrite stage's whole-stage codegen.
  *
  * Children MUST already be normalized to `[0, 2^bits)` Longs (done by
  * `TableStore.compact(zorderBy)` via min/max scaling — see there for why
  * linear scaling preserves the locality that makes the curve useful). A NULL
  * child contributes 0 bits for that dimension (nulls cluster at the low
  * corner of the curve); the code itself is never NULL, so the rewrite's
  * range partitioner sees a total order.
  *
  * Analog of the z-ordering rewrite strategy in Iceberg/Delta `OPTIMIZE
  * ZORDER BY` (public docs); the reference's managed tables get the same
  * effect from its maintenance service (reference README.md:132-137).
  */
case class ZOrderCode(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.nonEmpty, "zorder_code needs at least one column")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits=$bits × ${children.size} columns must fit in a positive Long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_code expects bigint inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Long]
        var b = 0
        while (b < bits) {
          z |= ((x >>> b) & 1L) << (b * n + c)
          b += 1
        }
      }
      c += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val z = ctx.freshName("z")
    val b = ctx.freshName("b")
    val perChild = children.zipWithIndex.map { case (child, c) =>
      val cg = child.genCode(ctx)
      s"""
         |${cg.code}
         |if (!${cg.isNull}) {
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $z |= ((${cg.value} >>> $b) & 1L) << ($b * $n + $c);
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $z = 0L;
        |$perChild
        |long ${ev.value} = $z;
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode =
    copy(children = newChildren)
}

object ZOrderCode {
  /** Column API: `zorder_code(cols, bits)` over pre-normalized bigint cols. */
  def apply(cols: Seq[Column], bits: Int): Column =
    ColumnBridge.column(ZOrderCode(cols.map(ColumnBridge.expression), bits))
}
