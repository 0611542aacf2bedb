package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float/double array
  * columns — one fused pass accumulating dot and both squared norms,
  * replacing three interpreted higher-order towers (zip_with+aggregate
  * × dot, norm(a), norm(b)) on the near-dup verification hot path
  * ([[graft.operators.Similarity.cosineNearDup]] runs it once per
  * candidate pair).
  *
  * Mirrors the HOF formulation's values and edge semantics exactly
  * (spec-asserted against [[graft.operators.Similarity.cosineHof]]):
  *   - float-op order `sqrt(na2) * sqrt(nb2)` (NOT `sqrt(na2*nb2)` —
  *     differs in the last ulp);
  *   - a null ELEMENT in either array → 0.0 (the null norm makes the
  *     HOF's `when(d > 0)` guard fall through to `otherwise(0.0)`);
  *   - zero norm product (either side empty or all-zero) → 0.0,
  *     REGARDLESS of length mismatch — the d=0 guard wins;
  *   - mismatched lengths with both norms positive → null (`zip_with`
  *     pads with null, nulling the dot while the guard stays true).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // introduces nulls (length mismatch with positive norms) even over
  // non-nullable children — see FixedDot.nullable
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  private def elemIsDouble(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == DoubleType

  private def elemAt(arr: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = elemIsDouble(left.dataType)
    val yd = elemIsDouble(right.dataType)
    val na = x.numElements()
    val nb = y.numElements()
    // norms scan their FULL arrays (the HOF's norm(a) does); a null
    // element anywhere nulls that norm -> guard falls through to 0.0
    var na2 = 0.0
    var i = 0
    while (i < na) {
      if (x.isNullAt(i)) return 0.0
      val v = elemAt(x, i, xd); na2 += v * v; i += 1
    }
    var nb2 = 0.0
    i = 0
    while (i < nb) {
      if (y.isNullAt(i)) return 0.0
      val v = elemAt(y, i, yd); nb2 += v * v; i += 1
    }
    val d = math.sqrt(na2) * math.sqrt(nb2)
    if (!(d > 0)) return 0.0 // empty / all-zero (either side) -> 0.0
    if (na != nb) return null // padded dot is null while the guard held
    var dot = 0.0
    i = 0
    while (i < na) {
      dot += elemAt(x, i, xd) * elemAt(y, i, yd); i += 1
    }
    dot / d
  }

  private def getter(side: Expression, arr: String, i: String): String =
    if (elemIsDouble(side.dataType)) s"$arr.getDouble($i)"
    else s"(double) $arr.getFloat($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName everything: this code can nest inside another
    // expression's generated block (CASE WHEN / HOF bodies), where raw
    // `i`/`na`/`v` shadow enclosing locals — Janino rejects shadowing
    // and the projection silently falls back to interpreted eval (the
    // r9 fix: the banded near-dup verify ran INTERPRETED through r8)
    val na = ctx.freshName("csNa")
    val nb = ctx.freshName("csNb")
    val na2 = ctx.freshName("csNa2")
    val nb2 = ctx.freshName("csNb2")
    val nullElem = ctx.freshName("csNullElem")
    val v = ctx.freshName("csV")
    val d = ctx.freshName("csD")
    val dot = ctx.freshName("csDot")
    val i = ctx.freshName("csIdx")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |double $na2 = 0.0, $nb2 = 0.0;
         |boolean $nullElem = false;
         |for (int $i = 0; $i < $na; $i++) {
         |  if ($a.isNullAt($i)) { $nullElem = true; break; }
         |  double $v = ${getter(left, a, i)}; $na2 += $v * $v;
         |}
         |if (!$nullElem) {
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if ($b.isNullAt($i)) { $nullElem = true; break; }
         |    double $v = ${getter(right, b, i)}; $nb2 += $v * $v;
         |  }
         |}
         |if ($nullElem) {
         |  ${ev.value} = 0.0;
         |} else {
         |  double $d = Math.sqrt($na2) * Math.sqrt($nb2);
         |  if (!($d > 0)) {
         |    ${ev.value} = 0.0;
         |  } else if ($na != $nb) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $na; $i++) {
         |      $dot += ${getter(left, a, i)} * ${getter(right, b, i)};
         |    }
         |    ${ev.value} = $dot / $d;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
