package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of a float/double array column against a
  * CONSTANT double hyperplane — the per-plane projection inside the
  * sign-pattern LSH bucket id
  * ([[graft.operators.Similarity.lshBucket]]: `planes` of these per
  * band per row on the q29 cosine-near-dup path). Replaces the
  * interpreted `aggregate(zip_with(vec, lit(plane), ...))` tower — the
  * same megamorphic-HOF family measured degrading 100x+ in long-lived
  * JVMs (see TextKernels scaladoc).
  *
  * Exact parity with the HOF form (asserted in SimilaritySpec):
  * left-to-right double accumulation (bucket assignment depends on the
  * SIGN, so the bit-exact sum order matters near zero), null on length
  * mismatch or any null element, 0.0 for empty-vs-empty.
  */
case class PlaneDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got $t")
  }

  override def dataType: DataType = DoubleType

  // introduces nulls (length mismatch / null element) even over a
  // non-nullable child — same contract note as FixedDot
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "plane_dot"

  // Array is mutable and reference-compared by case-class equality;
  // compare content so equal plane literals canonicalize equal (and
  // subexpression elimination can kick in).
  override def equals(other: Any): Boolean = other match {
    case PlaneDot(c, w) => c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != weights.length) return null
    val dbl = elemIsDouble
    var s = 0.0
    var i = 0
    while (i < weights.length) {
      if (v.isNullAt(i)) return null
      s += (if (dbl) v.getDouble(i) else v.getFloat(i).toDouble) * weights(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("planeWeights", weights, "double[]")
    // every local goes through freshName: emitted code can NEST inside
    // another expression's generated block (CASE WHEN branches and HOF
    // bodies inline child code), where a raw `i`/`s` shadows an
    // enclosing local — Janino rejects shadowing and the whole
    // projection silently falls back to interpreted eval
    val s = ctx.freshName("pdSum")
    val i = ctx.freshName("pdIdx")
    val getter = if (elemIsDouble) s"getDouble($i)" else s"getFloat($i)"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.numElements() != $w.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $w.length; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $c.$getter) * $w[$i];
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDot =
    copy(child = newChild)
}
