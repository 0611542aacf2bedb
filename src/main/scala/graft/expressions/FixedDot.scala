package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd fixed-point dot product over two float/double array
  * embedding columns: per element `floor(x·y·1e9 + 0.5)` accumulated in
  * an exact long — matching the HOF formulation
  * ([[graft.operators.Similarity.dotFixedHof]]) bit for bit on FINITE
  * inputs, including null semantics (null result on length mismatch or
  * any null element, which is what `zip_with` + `aggregate` produce),
  * but compiled to a tight Java loop inside whole-stage codegen instead
  * of an interpreted lambda tower that allocates per element. This is
  * the ANN scoring kernel (q28/q50/q53): it runs once per candidate
  * pair, the hottest expression in the engine.
  *
  * Documented deviation: a non-finite term (NaN/Inf from a corrupt
  * vector) yields NULL — under ANSI mode the HOF's `cast("long")` would
  * throw and kill the job; here the corrupt pair instead scores null
  * and ranks last (descending score windows put nulls last), which is
  * the behavior a 100 TB batch wants.
  *
  * Preference-order note (SURVEY §2.5 had "no custom Expression needed"
  * for the reference surface — this one exists for the LLM-pipeline
  * extension where the hot loop is real): native Expression with
  * doGenCode > HOF > UDF.
  */
case class FixedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // the expression introduces nulls (length mismatch, null/non-finite
  // elements) even when both children are non-nullable; without this
  // override nullSafeCodeGen's non-nullable branch would emit
  // `false = true;` (Janino compile failure) and the optimizer would
  // fold IS NULL checks incorrectly
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "dot_fixed"

  private def elemIsDouble(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == DoubleType

  private def elemAt(arr: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = elemIsDouble(left.dataType)
    val yd = elemIsDouble(right.dataType)
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = elemAt(x, i, xd) * elemAt(y, i, yd) * 1e9 + 0.5
      if (p.isNaN || p.isInfinite) return null
      s += math.floor(p).toLong
      i += 1
    }
    s
  }

  private def getter(side: Expression, arr: String, i: String): String =
    if (elemIsDouble(side.dataType)) s"$arr.getDouble($i)"
    else s"(double) $arr.getFloat($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName everything: this code can nest inside another
    // expression's generated block (CASE WHEN / HOF bodies), where raw
    // `i`/`n`/`s`/`p` shadow enclosing locals — Janino rejects shadowing
    // and the projection silently falls back to interpreted eval
    val n = ctx.freshName("fdLen")
    val s = ctx.freshName("fdSum")
    val i = ctx.freshName("fdIdx")
    val p = ctx.freshName("fdProd")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $p = ${getter(left, a, i)} * ${getter(right, b, i)} * 1.0E9 + 0.5;
         |    if (Double.isNaN($p) || Double.isInfinite($p)) { ${ev.isNull} = true; break; }
         |    $s += (long) Math.floor($p);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedDot =
    copy(left = newLeft, right = newRight)
}
