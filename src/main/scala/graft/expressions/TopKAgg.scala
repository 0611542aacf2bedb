package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k state: the k best (score, id) pairs under
  * (score DESC, id ASC), held in a worst-first binary heap so a row
  * that cannot enter the top k costs one comparison and no allocation.
  * This is the order-statistics reduction a 100 TB top-k needs: a
  * row_number window over an N·|Q| pair stream sorts every pair
  * (Exchange + per-partition spill at billions of rows), while this
  * aggregate's partial state is k pairs per group — the pair stream
  * collapses map-side and only |groups|·k rows cross the wire.
  */
final class TopKState(val k: Int) {
  // worst-first ordering: the head is the entry evicted first —
  // lowest score, ties broken by HIGHEST id (since ties prefer low id)
  private val heap = new java.util.PriorityQueue[Array[Long]](
    math.max(1, k),
    (a: Array[Long], b: Array[Long]) =>
      if (a(0) != b(0)) java.lang.Long.compare(a(0), b(0))
      else java.lang.Long.compare(b(1), a(1)))

  def update(score: Long, id: Long): Unit = {
    if (heap.size < k) { heap.add(Array(score, id)); () }
    else {
      val w = heap.peek()
      // better than the current worst: higher score, or same score
      // and lower id
      if (score > w(0) || (score == w(0) && id < w(1))) {
        heap.poll()
        heap.add(Array(score, id))
        ()
      }
    }
  }

  def merge(other: TopKState): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); update(e(0), e(1)) }
  }

  /** Entries best-first: (score DESC, id ASC). */
  def sorted: Array[Array[Long]] = {
    val arr = heap.toArray(Array.empty[Array[Long]])
    java.util.Arrays.sort(arr,
      (a: Array[Long], b: Array[Long]) =>
        if (a(0) != b(0)) java.lang.Long.compare(b(0), a(0))
        else java.lang.Long.compare(a(1), b(1)))
    arr
  }

  def serialize: Array[Byte] = {
    val es = sorted
    val bb = java.nio.ByteBuffer.allocate(8 + es.length * 16)
    bb.putInt(k).putInt(es.length)
    es.foreach { e => bb.putLong(e(0)).putLong(e(1)) }
    bb.array
  }
}

object TopKState {
  def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new TopKState(bb.getInt)
    var n = bb.getInt
    while (n > 0) { s.update(bb.getLong, bb.getLong); n -= 1 }
    s
  }
}

/** `topk_agg(score, id, k)`: the k best (score, id) pairs per group
  * under (score DESC, id ASC), returned as a sorted
  * `array<struct<score_fp: long, id: long>>`. The native exact top-k
  * reduction behind [[graft.operators.Similarity.topKReduce]] —
  * replaces rank-window top-k over huge scored pair streams (see
  * [[TopKState]] for the scale argument). Same
  * TypedImperativeAggregate physical shape as the sketch family
  * (ObjectHashAggregate, compact bytes between partial and final), but
  * EXACT: a bounded top-k is closed under merge, so the result is
  * bit-identical to the window formulation (TopKAggSpec pins it
  * against row_number on random data).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState]
  with BinaryLike[Expression] {

  require(k >= 1, s"topk_agg needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint score, bigint id), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.update(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKState): Any =
    new GenericArrayData(buffer.sorted.map { e =>
      new GenericInternalRow(Array[Any](e(0), e(1)))
    })

  override def serialize(buffer: TopKState): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score_fp", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"
}
