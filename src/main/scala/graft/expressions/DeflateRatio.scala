package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native compression-ratio quality signal: `deflate(text).length /
  * text.utf8Length` — the classic repetitiveness detector of web-scale
  * curation stacks (boilerplate loops, keyword stuffing, template spam
  * compress far better than natural prose; natural text lands ~0.4-0.8,
  * degenerate repetition well under 0.2). Complements the n-gram
  * repetition scorer ([[graft.operators.Repetition]]): deflate's 32 KiB
  * LZ77 window catches long-range and approximate repetition that fixed
  * n-gram statistics miss.
  *
  * Determinism: a fixed Deflater level (6) and strategy over exact UTF-8
  * bytes — same bytes, same JVM zlib, same output length everywhere in a
  * run, so the value is hash-stable. Cross-ENGINE the exact length is
  * zlib-version-dependent, which is why the oracle query (q101) checks
  * the thresholded DECISION on planted extremes (margins ≫ any zlib
  * drift), never the raw ratio.
  *
  * The Deflater is thread-local and `reset()` between rows: allocating
  * (and `end()`ing) a native zlib stream per row dominated the cost of
  * deflating short documents on the full-corpus q101 path. `reset()`
  * restores the exact initial state (level and strategy persist), so
  * output lengths are unchanged; the instance dies with its task thread
  * (native zlib memory is also reclaimed by the finalizer/Cleaner if a
  * pool thread is abandoned). Codegen'd as a direct static call — the
  * expression stays inside whole-stage codegen like every other kernel.
  *
  * Empty input: defined as ratio 1.0 (nothing to compress — "not
  * repetitive"). Null input: null.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatioImpl.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateRatioImpl.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatioImpl {
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))
  private val buffer: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    try {
      d.setInput(bytes)
      d.finish()
      val buf = buffer.get()
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    } finally d.reset()
  }
}
