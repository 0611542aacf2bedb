package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Per-frame spectral peak extraction over a WAV payload — the first
  * stage of constellation audio fingerprinting (Wang, "An Industrial-
  * Strength Audio Search Algorithm", ISMIR 2003): the signal is cut
  * into fixed non-overlapping frames, each frame's magnitude spectrum
  * is computed by a REAL direct DFT over the decoded 16-bit PCM
  * samples, and the dominant bin (argmax of |X[b]|², ties to the lower
  * bin) per frame becomes the constellation point. Pairing peaks into
  * (bin1, bin2, dt) hashes and offset-vote matching are plain
  * relational steps downstream ([[graft.operators.AudioFingerprint]]).
  *
  * Returns `array<int>` of one peak bin per COMPLETE frame (a trailing
  * partial frame is dropped), or null for malformed/non-PCM16 payloads
  * (same validation as `MediaCodec.pcmStats` — arbitrary bytes must
  * never throw). Bins examined are `1 .. frameSize/2 - 1` (DC excluded;
  * real-signal spectrum is symmetric above Nyquist).
  *
  * Evaluation is a codegen'd static call like every graft kernel; the
  * per-(frameSize) cos/sin basis is precomputed once per JVM and
  * shared across threads (read-only after construction).
  */
case class AudioPeaks(child: Expression, frameSize: Int)
  extends UnaryExpression {

  require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
    s"frameSize must be a power of two >= 8, got $frameSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary WAV input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // The kernel returns null for malformed/non-PCM16 payloads even when the
  // input bytes are non-null, so the expression must be declared nullable
  // and the codegen must propagate the kernel's null into ev.isNull —
  // defineCodeGen would silently drop it and downstream ArrayData access
  // would NPE under whole-stage codegen.
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "audio_peaks"

  override def nullSafeEval(input: Any): Any =
    AudioPeaksImpl.peaks(input.asInstanceOf[Array[Byte]], frameSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.AudioPeaksImpl.peaks($c, $frameSize);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioPeaks =
    copy(child = newChild)
}

object AudioPeaksImpl {
  /** (cos, sin) basis tables per frame size: [bin][n]. */
  private val bases =
    new ConcurrentHashMap[Int, (Array[Array[Double]], Array[Array[Double]])]()

  private def basis(n: Int): (Array[Array[Double]], Array[Array[Double]]) =
    bases.computeIfAbsent(n, { size =>
      val half = size / 2
      val cos = Array.ofDim[Double](half, size)
      val sin = Array.ofDim[Double](half, size)
      var b = 1
      while (b < half) {
        var i = 0
        while (i < size) {
          val a = 2.0 * math.Pi * b * i / size
          cos(b)(i) = math.cos(a)
          sin(b)(i) = math.sin(a)
          i += 1
        }
        b += 1
      }
      (cos, sin)
    })

  /** Null for malformed payloads, else one argmax bin per frame. */
  def peaks(wav: Array[Byte], frameSize: Int): GenericArrayData = {
    val samplesOpt = graft.operators.Multimodal.MediaCodec.pcmSamples(wav)
    if (samplesOpt.isEmpty) return null
    val s = samplesOpt.get
    val nFrames = s.length / frameSize
    val (cosT, sinT) = basis(frameSize)
    val half = frameSize / 2
    val out = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      val off = f * frameSize
      var bestBin = 1
      var bestMag = -1.0
      var b = 1
      while (b < half) {
        var re = 0.0
        var im = 0.0
        val cb = cosT(b)
        val sb = sinT(b)
        var i = 0
        while (i < frameSize) {
          val v = s(off + i).toDouble
          re += v * cb(i)
          im += v * sb(i)
          i += 1
        }
        val mag = re * re + im * im
        if (mag > bestMag) { bestMag = mag; bestBin = b }
        b += 1
      }
      out(f) = bestBin
      f += 1
    }
    new GenericArrayData(out)
  }
}
