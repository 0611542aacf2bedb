package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text kernels replacing the interpreted
  * higher-order-function towers that previously implemented
  * tokenization, shingling and token statistics
  * ([[graft.functions.TextFunctions]]).
  *
  * Why these exist (measured, ROUND4/ROUND5): Spark evaluates
  * higher-order array functions (`filter`, `transform`, `aggregate`)
  * through interpreted `Expression.eval` call sites. As a long-lived
  * JVM executes more distinct lambda shapes, those megamorphic call
  * sites deoptimize repeatedly until HotSpot pins them in the
  * interpreter — a round-5 bench run recorded the lang-id query (five
  * `filter(t -> array_contains(...))` towers per row) degrading
  * [0.9 s, 99.7 s, 156.5 s] across three identical back-to-back runs.
  * A static-call kernel inside whole-stage codegen has ONE call target,
  * nothing to deoptimize, and is faster in the best case too.
  *
  * Each kernel's semantics are byte-identical to the lambda formulation
  * it replaced; the lambda formulations live on in the specs as
  * reference implementations the natives are asserted against.
  */
object TextKernels {

  /** Thread-local MD5 digest — one instance per executor thread, reset
    * per call (MessageDigest.getInstance per row is the allocation the
    * kernel exists to avoid).
    */
  private val md5Tl: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Top 60 bits of md5(s) as a non-negative long — BIT-IDENTICAL to
    * the engine's portable-hash contract `conv(substr(md5(s),1,15),16,10)`
    * (the first 15 hex chars are the first 7.5 digest bytes = the
    * big-endian first-8-bytes word shifted right 4), computed straight
    * from the digest bytes: no hex-string materialization, no substring,
    * no NumberConverter parse (the three frames that dominated q130's
    * stall profile). See [[Md5Hash60]].
    */
  def md5Hash60(s: UTF8String): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    hi >>> 4
  }

  /** UTF-8 leading byte -> char byte length (continuation/malformed
    * bytes cannot start a char in Spark-produced UTF8Strings; the
    * fallthrough keeps the walk terminating on any input).
    */
  private def utf8CharLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
  }

  /** Character-count common prefix, capped; see [[CommonPrefixChars]]. */
  def commonPrefixChars(a: UTF8String, b: UTF8String, cap: Int): Long = {
    val n = Math.min(a.numBytes, b.numBytes)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    var p = 0
    var c = 0L
    while (p < i && c < cap) {
      val l = utf8CharLen(a.getByte(p))
      if (p + l > i) return c
      p += l
      c += 1
    }
    c
  }

  /** Shared byte-scan tokenizer: maximal runs of non-space bytes
    * (UTF-8 multibyte sequences never contain 0x20, so the byte scan is
    * exact). Returns (starts, ends, count) into `bytes` — equivalent to
    * `filter(split(text, " "), t => t =!= "")`.
    */
  private[expressions] def scanTokens(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
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
    (starts, ends, count)
  }

  /** Whitespace tokens of `text`, empties removed — the slices share
    * `text`'s (freshly copied) byte array, no per-token copy.
    */
  def tokenArray(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, count) = scanTokens(bytes)
    val out = new Array[Any](count)
    var t = 0
    while (t < count) {
      out(t) = UTF8String.fromBytes(bytes, starts(t), ends(t) - starts(t))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram shingle STRINGS (tokens joined by single spaces); fewer
    * than `n` tokens (incl. zero) yield ONE shingle joining all tokens.
    * Identical to `when(size(toks) < n, array(concat_ws(" ", toks)))
    * .otherwise(transform(sequence(1, size-n+1), i =>
    * concat_ws(" ", slice(toks, i, n))))` over [[tokenArray]] output.
    */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val count = toks.numElements()
    val tokens = new Array[UTF8String](count)
    var t = 0
    while (t < count) {
      tokens(t) = toks.getUTF8String(t)
      t += 1
    }
    if (count < n) {
      new GenericArrayData(Array[Any](
        UTF8String.concatWs(UTF8String.fromString(" "), tokens: _*)))
    } else {
      val out = new Array[Any](count - n + 1)
      val window = new Array[UTF8String](n)
      var w = 0
      while (w <= count - n) {
        System.arraycopy(tokens, w, window, 0, n)
        out(w) = UTF8String.concatWs(UTF8String.fromString(" "), window: _*)
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  /** One-pass token statistics; see [[TokenProfile]] for the schema and
    * field semantics. `wordSets` entries are byte-equality membership
    * sets (UTF8String hashes/compares by bytes, matching
    * `array_contains`' binary string equality).
    */
  def profile(text: UTF8String,
      wordSets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val bytes = text.getBytes
    val (starts, ends, count) = scanTokens(bytes)
    var chars = 0L
    val distinct = new java.util.HashSet[UTF8String](math.max(count * 2, 8))
    val hits = new Array[Long](wordSets.length)
    var t = 0
    while (t < count) {
      val tok = UTF8String.fromBytes(bytes, starts(t), ends(t) - starts(t))
      chars += tok.numChars() // numChars = what length() returns for strings
      distinct.add(tok)
      var l = 0
      while (l < wordSets.length) {
        if (wordSets(l).contains(tok)) hits(l) += 1
        l += 1
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](count.toLong, distinct.size.toLong,
      chars, new GenericArrayData(hits)))
  }
}

/** `token_array(text)` → array<string>: whitespace tokens, empties
  * removed. Drop-in native replacement for
  * `filter(split(text, " "), t => t =!= "")`.
  */
case class TokenArray(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_array"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.tokenArray($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenArray =
    copy(child = newChild)
}

/** `shingle_array(toks, n)` → array<string>: word n-gram shingles over
  * an already-tokenized array column (see [[TextKernels.shingles]] for
  * the exact `< n tokens` contract).
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_array"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** `token_profile(text)` → struct<n_tokens: long, n_unique: long,
  * n_chars: long, hits: array<long>>, all computed in ONE tokenizer
  * pass:
  *   - n_tokens — `size(tokens)`;
  *   - n_unique — `size(array_distinct(tokens))` (binary equality);
  *   - n_chars  — `aggregate(tokens, 0L, (acc, t) => acc + length(t))`
  *     (Unicode code points, exactly Spark's `length`);
  *   - hits(i)  — `size(filter(tokens, t => array_contains(lists(i), t)))`
  *     per word list, counting occurrences (not distinct hits).
  *
  * All downstream stats (quality score, language id) are flat Column
  * algebra over these fields; equal instances are eliminated to a
  * single evaluation by whole-stage codegen's subexpression
  * elimination, so selecting five stats costs one pass.
  */
case class TokenProfile(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_profile"

  @transient private lazy val wordSets: Array[java.util.HashSet[UTF8String]] =
    wordLists.map { words =>
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.profile(input.asInstanceOf[UTF8String], wordSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("wordSets", wordSets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.profile($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)
}

/** Common prefix length in CHARACTERS of two strings, capped at `cap`
  * — the prefix-cache locality kernel (q172). Byte-identical to the
  * statically-unrolled tower
  * `GREATEST(CASE WHEN i <= least(len(a),len(b)) AND
  * substring(a,1,i) = substring(b,1,i) THEN i ELSE 0 END for i in
  * 1..cap)` on NON-NULL inputs (the tower's CASE turns null inputs
  * into 0; this kernel is null-intolerant like the engine's other
  * kernels — q172 filters nulls before the pairing, and the fuzz spec
  * compares on non-null corpora): a shared byte prefix that splits a
  * multibyte character contributes only its complete characters,
  * which is exactly what character-substring equality sees. One byte
  * walk, zero allocation, vs `cap` substring materializations per
  * pair in the tower.
  */
case class CommonPrefixChars(left: Expression, right: Expression, cap: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "common_prefix_chars"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.commonPrefixChars(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextKernels.commonPrefixChars($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixChars =
    copy(left = newLeft, right = newRight)
}

/** Native portable md5-60 hash ([[TextKernels.md5Hash60]]): the
  * engine-wide cross-engine hash contract, minus the interpreted
  * hex/conv tower. Null-intolerant like every kernel.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $t")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_hash60"
  override def nullSafeEval(input: Any): Any =
    TextKernels.md5Hash60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.md5Hash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}
