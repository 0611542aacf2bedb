package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns —
  * one loop accumulating dot and both squared norms, replacing three
  * interpreted higher-order towers (zip_with+aggregate × dot, norm(a),
  * norm(b)) on the near-dup verification hot path
  * ([[graft.operators.Similarity.cosineNearDup]] runs it once per
  * candidate pair).
  *
  * Bit-exact mirror of the HOF formulation including its edge
  * semantics and float-op order: `sqrt(na2) * sqrt(nb2)` (NOT
  * `sqrt(na2*nb2)` — differs in the last ulp), zero denominator → 0.0,
  * a null ELEMENT → 0.0 (null norms make the `when(d > 0)` guard fall
  * through to otherwise), mismatched lengths → null (zip_with pads with
  * null, nulling the dot while the guard stays true).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return 0.0
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na2 += xv * xv
      nb2 += yv * yv
      i += 1
    }
    val d = math.sqrt(na2) * math.sqrt(nb2)
    if (d > 0) dot / d else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = $a.numElements();
         |if ($b.numElements() != n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double dot = 0.0, na2 = 0.0, nb2 = 0.0;
         |  boolean nullElem = false;
         |  for (int i = 0; i < n; i++) {
         |    if ($a.isNullAt(i) || $b.isNullAt(i)) { nullElem = true; break; }
         |    double xv = (double) $a.getFloat(i);
         |    double yv = (double) $b.getFloat(i);
         |    dot += xv * yv; na2 += xv * xv; nb2 += yv * yv;
         |  }
         |  if (nullElem) {
         |    ${ev.value} = 0.0;
         |  } else {
         |    double d = Math.sqrt(na2) * Math.sqrt(nb2);
         |    ${ev.value} = d > 0 ? dot / d : 0.0;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
