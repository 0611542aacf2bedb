package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `slot_sum(values, slots)`: Σ values(slot) over `slots`, skipping
  * slots whose value element is NULL; returns NULL when EVERY
  * addressed slot is null (or `slots` is empty). The dense-scoring
  * kernel of [[graft.operators.Retrieval.bm25TopK]]'s pivoted path: a
  * document's per-query-term contributions sit in a fixed slot array,
  * a query is ≤ a handful of slot indices, and the score is a few
  * array fetches per (doc, query) pair — no join fan-out, no
  * per-pair aggregation state. The all-null → NULL contract encodes
  * "no query term occurs in this document", which keeps the dense
  * path's output row set identical to the sparse (inverted-index)
  * path's inner joins.
  *
  * Out-of-range slots count as absent (defensive; the caller builds
  * both sides from the same dictionary, so they do not occur).
  */
case class SlotSum(values: Expression, slots: Expression)
    extends BinaryExpression {

  override def left: Expression = values
  override def right: Expression = slots

  override def checkInputDataTypes(): TypeCheckResult =
    (values.dataType, slots.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<int>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  // all-addressed-slots-null → null, even over non-nullable children
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "slot_sum"

  override def nullSafeEval(v: Any, s: Any): Any =
    SlotSumImpl.sum(v.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("slotSum")
    nullSafeCodeGen(ctx, ev, (v, s) => {
      s"""
         |java.lang.Long $r = graft.expressions.SlotSumImpl.sum($v, $s);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlotSum =
    copy(values = newLeft, slots = newRight)
}

object SlotSumImpl {
  /** Null ⇔ no addressed slot holds a value. */
  def sum(values: ArrayData, slots: ArrayData): java.lang.Long = {
    val n = values.numElements()
    val m = slots.numElements()
    var acc = 0L
    var any = false
    var i = 0
    while (i < m) {
      if (!slots.isNullAt(i)) {
        val s = slots.getInt(i)
        if (s >= 0 && s < n && !values.isNullAt(s)) {
          acc += values.getLong(s)
          any = true
        }
      }
      i += 1
    }
    if (any) java.lang.Long.valueOf(acc) else null
  }
}
