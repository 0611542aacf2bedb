package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| of two SORTED-ascending, duplicate-free string arrays via a
  * single merge walk — the set-similarity verify kernel
  * ([[graft.operators.TextDedup.prefixFilterJoin]] runs it once per
  * surviving candidate pair, the hottest spot of the exact PPJoin
  * path). `size(array_intersect(a, b))` computes the same number but
  * builds a hash set PLUS the materialized intersection array per pair
  * (profiled as the dominant q128 frames: OpenHashSet.rehash +
  * UnsafeArrayData.get churn); the merge walk allocates nothing and
  * compares bytes.
  *
  * CONTRACT: both inputs ascending in UTF8String binary order — exactly
  * what `array_sort` produces on a string array (same comparator), so
  * `sorted_intersect_count(array_sort(a), array_sort(b))` ≡
  * `size(array_intersect(a, b))` on duplicate-free inputs
  * (spec-asserted against the built-in on fuzzed corpora). Unsorted
  * input silently undercounts — callers own the sort, which they pay
  * once per DOCUMENT instead of hashing once per PAIR.
  *
  * Null semantics: null array or null element → null (mirrors the
  * engine's other kernels; array_distinct/array_sort feeds never
  * produce element nulls here). Element nulls are detected EVERYWHERE,
  * including tail positions the merge walk never reaches — `array_sort`
  * places nulls LAST, so without the tail sweep the typical null-bearing
  * input would return a count instead of NULL (r10 ADVICE fix; the
  * sweep is a bitmask read per remaining element, paid only on the
  * shorter-array-exhausted suffix).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // introduces nulls (element nulls) even over non-nullable children —
  // see FixedDot.nullable
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = SortedIntersectCountImpl.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: emitted code can nest inside another expression's
    // generated block (see the r9 CosineSim shadowing find)
    val c = ctx.freshName("sicCount")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |long $c = graft.expressions.SortedIntersectCountImpl.count($a, $b);
         |if ($c < 0) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountImpl {
  /** Merge-walk intersection count; −1 encodes NULL (element null). */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return -1L
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    // null-sweep the unvisited tails: array_sort puts nulls LAST, so a
    // null element usually sits exactly where the walk stopped looking
    while (i < na) { if (a.isNullAt(i)) return -1L; i += 1 }
    while (j < nb) { if (b.isNullAt(j)) return -1L; j += 1 }
    c
  }
}
