package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd fixed-point dot product over two `array<float>`
  * embedding columns: per element `floor(x·y·1e9 + 0.5)` accumulated in
  * an exact long — bit-identical to the HOF formulation
  * ([[graft.operators.Similarity.dotFixedHof]]) including its null
  * semantics (null result on length mismatch or any null element, which
  * is what `zip_with` + `aggregate` produce), but compiled to a tight
  * Java loop inside whole-stage codegen instead of an interpreted
  * lambda tower that allocates per element. This is the ANN scoring
  * kernel (q28/q50/q53): it runs once per candidate pair, the hottest
  * expression in the engine.
  *
  * Preference-order note (SURVEY §2.5 had "no custom Expression
  * needed" for the reference surface — this one exists for the
  * LLM-pipeline extension where the hot loop is real): native
  * Expression with doGenCode > HOF > UDF.
  */
case class FixedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "dot_fixed"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e9
        + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = $a.numElements();
         |if ($b.numElements() != n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long s = 0L;
         |  for (int i = 0; i < n; i++) {
         |    if ($a.isNullAt(i) || $b.isNullAt(i)) { ${ev.isNull} = true; break; }
         |    s += (long) Math.floor((double) $a.getFloat(i)
         |      * (double) $b.getFloat(i) * 1.0E9 + 0.5);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedDot =
    copy(left = newLeft, right = newRight)
}
