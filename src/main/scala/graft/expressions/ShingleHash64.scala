package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd "tokenize → word-n-gram shingle → xxhash64" kernel:
  * one static call per document replacing the interpreted lambda tower
  * (`filter(split(...))` + `transform(sequence, concat_ws(slice))`) that
  * previously fed the MinHash/LSH family
  * ([[graft.operators.TextDedup.minHashLsh]] — q26's hottest per-row
  * expression). The HOF formulation was measured unstable run-over-run
  * in a shared JVM (interpreted higher-order call sites go megamorphic
  * as more lambda shapes execute; ROUND4.md) — this expression removes
  * every `lambdafunction` from the q26 plan family, asserted by
  * PlanAuditSpec.
  *
  * Semantics are byte-identical to the lambda formulation (spec-asserted
  * in TextOpsSpec against the reference HOF kept in the test):
  *   - tokens = split on single spaces, empty tokens dropped (so runs of
  *     spaces and leading/trailing spaces are ignored);
  *   - fewer than `n` tokens (including zero) → ONE shingle joining all
  *     tokens ("" for an empty/space-only document);
  *   - otherwise the `count-n+1` sliding windows, tokens joined by a
  *     single space;
  *   - each shingle hashed with Spark's `xxhash64` (seed 42) over its
  *     UTF-8 bytes — exactly `xxhash64(concat_ws(" ", slice(toks,i,n)))`.
  *
  * Null input yields null (callers coalesce to '' for the
  * empty-document policy, same as before).
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleHashImpl.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

/** Static implementation holder: a standalone object compiles to a
  * mirror class with true static forwarders, so the generated Java from
  * [[ShingleHash64.doGenCode]] can call it directly (no MODULE$
  * indirection inside whole-stage codegen).
  */
object ShingleHashImpl {
  private val SEED = 42L // xxhash64's fixed seed in Spark

  /** See [[ShingleHash64]] for the exact semantics contract. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // token boundaries: maximal runs of non-space bytes (UTF-8 multibyte
    // sequences never contain 0x20, so a byte scan is exact)
    var count = 0
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != ' ') {
        val s = i
        while (i < bytes.length && bytes(i) != ' ') i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = s; ends(count) = i; count += 1
      } else i += 1
    }
    if (count < n) {
      // single shingle: all tokens joined (empty string for 0 tokens)
      var len = math.max(count - 1, 0)
      var t = 0
      while (t < count) { len += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      t = 0
      while (t < count) {
        if (t > 0) { buf(off) = ' '; off += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, off, l); off += l
        t += 1
      }
      ArrayData.toArrayData(Array(hashBytes(buf, len)))
    } else {
      val out = new Array[Long](count - n + 1)
      // reusable window buffer sized to the widest window
      var maxLen = 0
      var w = 0
      while (w <= count - n) {
        val l = ends(w + n - 1) - starts(w) // window span includes gaps…
        if (l > maxLen) maxLen = l // …never shorter than the joined form
        w += 1
      }
      val buf = new Array[Byte](maxLen)
      w = 0
      while (w <= count - n) {
        var off = 0
        var t = w
        while (t < w + n) {
          if (t > w) { buf(off) = ' '; off += 1 }
          val l = ends(t) - starts(t)
          System.arraycopy(bytes, starts(t), buf, off, l); off += l
          t += 1
        }
        out(w) = hashBytes(buf, off)
        w += 1
      }
      ArrayData.toArrayData(out)
    }
  }

  private def hashBytes(buf: Array[Byte], len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromBytes(buf, 0, len), StringType, SEED)
}
