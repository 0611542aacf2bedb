package graft.expressions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Frequent-items (heavy-hitters) sketch aggregates + bound scalars
  * (Apache DataSketches frequencies, the Misra-Gries / space-saving
  * family): MERGEABLE constant-size frequency state — the counting
  * companion to the theta distinct-count store (q116). Per-segment
  * sketches materialize once; any segment union answers "how often did
  * item x occur" with DETERMINISTIC bounds: lowerBound ≤ true count ≤
  * upperBound always holds (not probabilistically), which is what the
  * q122 oracle checks against exact counts.
  *
  * `maxMapSize` (a power of two) caps memory; the error half-width is
  * ≤ 3.5·n/maxMapSize over a stream of length n.
  */
object FreqSketchImpl {
  def newSketch(maxMapSize: Int): LongsSketch = new LongsSketch(maxMapSize)

  def fromBytes(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  def lower(bytes: Array[Byte], item: Long): Long =
    fromBytes(bytes).getLowerBound(item)

  def upper(bytes: Array[Byte], item: Long): Long =
    fromBytes(bytes).getUpperBound(item)

  def estimate(bytes: Array[Byte], item: Long): Long =
    fromBytes(bytes).getEstimate(item)
}

private[expressions] trait FreqAggBase
  extends TypedImperativeAggregate[LongsSketch] {
  def maxMapSize: Int
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def createAggregationBuffer(): LongsSketch =
    FreqSketchImpl.newSketch(maxMapSize)

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): LongsSketch =
    FreqSketchImpl.fromBytes(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `freq_sketch_agg(item, maxMapSize)`: sketch of long item counts. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/int input, got $t")
  }

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_agg"
}

/** `freq_merge_agg(sketch, maxMapSize)`: union of stored sketches. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch input, got $t")
  }

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(FreqSketchImpl.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_merge_agg"
}

/** `freq_lower_bound(sketch, item)` — guaranteed ≤ the true count. */
case class FreqLowerBound(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, long), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "freq_lower_bound"
  override def nullSafeEval(a: Any, b: Any): Any =
    FreqSketchImpl.lower(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.FreqSketchImpl.lower($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqLowerBound =
    copy(left = newLeft, right = newRight)
}

/** `freq_upper_bound(sketch, item)` — guaranteed ≥ the true count. */
case class FreqUpperBound(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, long), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "freq_upper_bound"
  override def nullSafeEval(a: Any, b: Any): Any =
    FreqSketchImpl.upper(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.FreqSketchImpl.upper($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqUpperBound =
    copy(left = newLeft, right = newRight)
}
