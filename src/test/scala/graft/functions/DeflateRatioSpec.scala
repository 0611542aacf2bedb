package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[graft.expressions.DeflateRatio]] — the compression-ratio
  * repetitiveness signal: ordering between planted extremes, edge
  * semantics, and agreement with a direct JDK deflate reference.
  */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below high-entropy text") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 12),
      (2L, (1 to 8).map(k => s"block$k-" +
        java.util.UUID.nameUUIDFromBytes(Array(k.toByte)).toString).mkString(" "))
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < 0.15, s"repetitive ratio ${got(1L)}")
    assert(got(2L) > 0.3, s"high-entropy ratio ${got(2L)}")
  }

  test("empty text is 1.0, null is null, ratio is deterministic") {
    val rows = Seq((1L, ""), (2L, null: String), (3L, "some plain text here"))
      .toDF("id", "text")
    val twice = (1 to 2).map { _ =>
      rows.select(col("id"), TextFunctions.compressionRatio(col("text")))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    }
    assert(twice.head == twice.last, "ratio must be run-deterministic")
    val m = twice.head.toMap
    assert(m(1L).contains(1.0))
    assert(m(2L).isEmpty)
    assert(m(3L).exists(r => r > 0.0 && r < 2.0))
  }

  test("expression agrees with a direct JDK deflate reference") {
    val text = "alpha beta gamma " * 7
    val bytes = text.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    val expected = out.toDouble / bytes.length
    val got = Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.compressionRatio(col("text")))
      .head.getDouble(0)
    assert(got == expected)
  }
}
