package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** KLL quantile-sketch aggregates + scalars (Apache DataSketches): the
  * MERGEABLE rank/quantile family that completes the engine's sketch
  * stores (HLL q111 = distinct counts, frequent-items q122 = heavy
  * hitters, theta q116 = set algebra; this = order statistics).
  * Per-day sketches materialize to parquet; any window is answered by
  * sketch MERGE over the store — constant-size state per segment, raw
  * history never rescanned. Exact while a sketch stays in its level-0
  * buffer (n ≤ k); beyond that the KLL compaction guarantees a
  * normalized RANK error ≈ 1.65%·(k/200)^-0.93 at 99% confidence
  * (Karnin, Lang, Liberty, FOCS'16) — an error bound on rank, not
  * value, independent of n, which is what makes it safe at any scale.
  *
  * Same physical shape as the theta family: aggregates are
  * `TypedImperativeAggregate[KllDoublesSketch]` (ObjectHashAggregate;
  * compact bytes between partial and final), scalars are codegen'd
  * static calls. Quantile queries use the INCLUSIVE search criterion:
  * the returned value is the smallest retained item whose inclusive
  * rank ≥ q — in exact mode that is precisely the ⌈q·n⌉-th order
  * statistic.
  */
object KllSketchImpl {
  def newSketch(k: Int): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  def fromBytes(k: Int, bytes: Array[Byte]): KllDoublesSketch = {
    val s = newSketch(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) null
    else java.lang.Double.valueOf(
      s.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE))
  }

  def rank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) null
    else java.lang.Double.valueOf(
      s.getRank(value, QuantileSearchCriteria.INCLUSIVE))
  }

  def n(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}

/** `kll_sketch_agg(col, k)`: KLL quantile sketch of a numeric column. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 800,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric input, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllSketchImpl.newSketch(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case d: Double => buffer.update(d)
      case f: Float => buffer.update(f.toDouble)
      case l: Long => buffer.update(l.toDouble)
      case i: Int => buffer.update(i.toDouble)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllSketchImpl.fromBytes(k, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_merge_agg(sketch_col, k)`: merge stored KLL sketches — the
  * store-merge aggregate (q111's `hll_union_agg` counterpart).
  */
case class KllMergeAgg(
    child: Expression,
    k: Int = 800,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch input, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllSketchImpl.newSketch(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllSketchImpl.fromBytes(k, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"
}

/** `kll_quantile(sketch, q)`: inclusive-rank quantile value; null for
  * an empty sketch. In exact mode (n never exceeded k) this is the
  * ⌈q·n⌉-th order statistic.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, double rank), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_quantile"
  override def nullSafeEval(a: Any, b: Any): Any =
    KllSketchImpl.quantile(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("kllq")
      s"""java.lang.Double $tmp = graft.expressions.KllSketchImpl.quantile($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, value)`: inclusive normalized rank of a value;
  * null for an empty sketch.
  */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, double value), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_rank"
  override def nullSafeEval(a: Any, b: Any): Any =
    KllSketchImpl.rank(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("kllr")
      s"""java.lang.Double $tmp = graft.expressions.KllSketchImpl.rank($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)`: EXACT total update count carried by the sketch
  * (n is tracked exactly through every compaction and merge).
  */
case class KllN(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch argument, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_n"
  override def nullSafeEval(input: Any): Any =
    KllSketchImpl.n(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.KllSketchImpl.n($c)")
  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}
