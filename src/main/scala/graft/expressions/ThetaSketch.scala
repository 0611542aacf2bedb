package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch aggregates + set-operation scalars (Apache
  * DataSketches): the mergeable distinct-count family that supports
  * INTERSECTION and DIFFERENCE, which HLL (q111's store) cannot —
  * audience-overlap questions ("users active in BOTH weeks", "docs in
  * snapshot A but not B") answered from constant-size per-segment state
  * without rescanning raw history. Theta sketches are exact below
  * their nominal entry count (2^lgK) and unbiased samples above it
  * (Dasgupta et al., "Theta-Sketch Framework", 2016).
  *
  * Custom Catalyst surface: the aggregates are
  * `TypedImperativeAggregate[Union]` (the same physical shape as
  * Spark's own `hll_sketch_agg` — ObjectHashAggregate, buffers
  * serialized as compact ordered sketch bytes between partial and
  * final passes), the scalars are codegen'd static calls like every
  * other graft kernel.
  */
object ThetaSketchImpl {
  def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrap(bytes: Array[Byte]): Sketch = Sketch.wrap(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(wrap(a), wrap(b)).toByteArray

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).toByteArray
}

/** `theta_sketch_agg(col, lgK)`: build a compact theta sketch of the
  * column's distinct values (long/int/string/binary inputs).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/int/string/binary input, got $t")
  }

  override def createAggregationBuffer(): Union = ThetaSketchImpl.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
      case s: UTF8String => buffer.update(s.getBytes)
      case b: Array[Byte] => buffer.update(b)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaSketchImpl.newUnion(lgK)
    u.union(Memory.wrap(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
}

/** `theta_union_agg(sketch_col, lgK)`: union stored compact sketches —
  * the store-merge aggregate (q111's `hll_union_agg` counterpart).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch input, got $t")
  }

  override def createAggregationBuffer(): Union = ThetaSketchImpl.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaSketchImpl.newUnion(lgK)
    u.union(Memory.wrap(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"
}

/** `theta_estimate(sketch)`: distinct-count estimate of a compact
  * sketch (exact while the sketch never exceeded 2^lgK entries).
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch argument, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(input: Any): Any =
    ThetaSketchImpl.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ThetaSketchImpl.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(a, b)`: compact sketch of the set intersection. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketches, got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchImpl.intersect(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ThetaSketchImpl.intersect($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_a_not_b(a, b)`: compact sketch of the set difference. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketches, got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchImpl.aNotB(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ThetaSketchImpl.aNotB($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}
