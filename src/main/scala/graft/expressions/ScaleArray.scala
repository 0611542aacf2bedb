package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native elementwise float-array scaling: `transform(v, x => x * c)`
  * without the higher-order lambda (the last interpreted HOF shape on a
  * query path — q29's mutated-copy synthesis; see TextKernels scaladoc
  * for why interpreted lambda shapes are banned from hot paths).
  * Float multiply per element, exactly like the HOF form (the q29
  * oracle's planted-pair determinism rides on sign(w·cv) = sign(w·v)
  * up to THIS float rounding). Null elements stay null.
  */
case class ScaleArray(child: Expression, factor: Float)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got $t")
  }

  override def dataType: DataType = child.dataType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "scale_array"

  override def nullSafeEval(input: Any): Any =
    ScaleArrayImpl.scale(input.asInstanceOf[ArrayData], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ScaleArrayImpl.scale($c, ${factor}f)")

  override protected def withNewChildInternal(newChild: Expression): ScaleArray =
    copy(child = newChild)
}

object ScaleArrayImpl {
  def scale(v: ArrayData, factor: Float): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) out(i) = v.getFloat(i) * factor
      i += 1
    }
    new GenericArrayData(out)
  }
}
