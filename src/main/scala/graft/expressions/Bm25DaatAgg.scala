package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Document-at-a-time BM25 top-k evaluation
  * (`bm25_daat_agg(contribVec, docId)`): ONE aggregate pass over the
  * per-document contribution vectors scores EVERY query against every
  * document inside a tight primitive loop and keeps a bounded
  * [[TopKState]] heap per query — the batch analog of the DAAT
  * traversal IR engines use for top-k evaluation.
  *
  * Why not score (doc, query) pairs as rows: |docs|·|queries| row
  * materializations dominate everything at scale — r11 measured the
  * per-pair formulation (BroadcastNestedLoopJoin → SlotSum →
  * topk_agg) at 538 s for 500k docs × 5k queries at sf10r, ~3.4 µs
  * per pair all spent in join/aggregate-iterator machinery. Here the
  * same 2.5e9 (doc, query) score evaluations run as array arithmetic
  * inside update(): per document, the contribution vector is copied
  * once into primitive arrays and the query loop costs a few adds and
  * one heap comparison per query.
  *
  * The query set (ids + slot indices into the contribution vector)
  * ships as constructor data — it is driver-collected by the caller
  * under the same "queries are broadcast-small" contract the sparse
  * path's broadcast join relies on. State is |queries| k-heaps
  * (≤ 16·k bytes each); grouping is GLOBAL (one group), so the
  * ObjectHashAggregate holds exactly one buffer per task.
  *
  * Output: `array<struct<query_id, id, rank, score_fp>>`, per query
  * the k best documents under (score DESC, id ASC) — bit-identical to
  * the sparse inverted-index path (Bm25DenseSpec pins it; the caller
  * computes identical contribution integers for both).
  */
case class Bm25DaatAgg(
    contribVec: Expression,
    docId: Expression,
    // Seq-typed, NOT Array (r12, ADVICE): case-class equals/hashCode on
    // Array fields use reference identity, so two semantically identical
    // instances would never compare equal and Catalyst canonicalization
    // could not dedup identical aggregates. Seq (ArraySeq) compares
    // structurally; the hot loop reads the primitive mirrors below.
    queryIds: Seq[Long],
    querySlots: Seq[Seq[Int]],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[TopKState]]
  with BinaryLike[Expression] {

  require(k >= 1, s"bm25_daat_agg needs k >= 1, got $k")
  require(queryIds.length == querySlots.length,
    "queryIds and querySlots must align")

  // primitive mirrors for update()/eval() — built once per instance,
  // excluded from equality (derived state)
  @transient private lazy val qIdArr: Array[Long] = queryIds.toArray
  @transient private lazy val qSlotArr: Array[Array[Int]] =
    querySlots.map(_.toArray).toArray

  override def left: Expression = contribVec
  override def right: Expression = docId

  override def checkInputDataTypes(): TypeCheckResult =
    (contribVec.dataType, docId.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got ($c, $d)")
    }

  override def createAggregationBuffer(): Array[TopKState] =
    Array.fill(queryIds.length)(new TopKState(k))

  override def update(buffer: Array[TopKState],
      input: InternalRow): Array[TopKState] = {
    val cvAny = contribVec.eval(input)
    val idAny = docId.eval(input)
    if (cvAny != null && idAny != null) {
      val cv = cvAny.asInstanceOf[ArrayData]
      val id = idAny.asInstanceOf[Long]
      val n = cv.numElements()
      // one pass into primitives: the query loop below reads plain
      // arrays instead of ArrayData virtual calls per (query, slot)
      val vals = new Array[Long](n)
      val has = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        if (!cv.isNullAt(i)) { vals(i) = cv.getLong(i); has(i) = true }
        i += 1
      }
      var q = 0
      val nq = qSlotArr.length
      while (q < nq) {
        val slots = qSlotArr(q)
        var acc = 0L
        var any = false
        var j = 0
        while (j < slots.length) {
          val s = slots(j)
          if (s >= 0 && s < n && has(s)) { acc += vals(s); any = true }
          j += 1
        }
        if (any) buffer(q).update(acc, id)
        q += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[TopKState],
      other: Array[TopKState]): Array[TopKState] = {
    var q = 0
    while (q < buffer.length) { buffer(q).merge(other(q)); q += 1 }
    buffer
  }

  override def eval(buffer: Array[TopKState]): Any = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var q = 0
    while (q < buffer.length) {
      val es = buffer(q).sorted
      var r = 0
      while (r < es.length) {
        rows += new GenericInternalRow(
          Array[Any](qIdArr(q), es(r)(1), (r + 1).toLong, es(r)(0)))
        r += 1
      }
      q += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buffer: Array[TopKState]): Array[Byte] = {
    val parts = buffer.map(_.serialize)
    val bb = java.nio.ByteBuffer.allocate(4 + parts.map(_.length + 4).sum)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKState] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n) {
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      TopKState.deserialize(p)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Bm25DaatAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Bm25DaatAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Bm25DaatAgg =
    copy(contribVec = newLeft, docId = newRight)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("score_fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bm25_daat_agg"
}
