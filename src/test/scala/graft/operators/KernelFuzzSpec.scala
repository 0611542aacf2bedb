package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded fuzz coverage for the native kernels and byte-level parsers:
  * the native expressions must agree with their HOF reference on
  * arbitrary finite inputs (values, nullness, lengths), and the media
  * header parsers must return cleanly on arbitrary bytes — they run on
  * untrusted payloads inside executor tasks, where an exception or a
  * non-terminating loop takes the stage down.
  */
class KernelFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("dotFixed/cosine fuzz: native == HOF over random lengths and nulls") {
    val rnd = new scala.util.Random(101)
    def vec(): Array[java.lang.Float] = {
      val n = rnd.nextInt(8) // 0..7, frequent mismatches
      Array.fill[java.lang.Float](n) {
        if (rnd.nextInt(20) == 0) null
        else java.lang.Float.valueOf(rnd.nextFloat() * 20 - 10)
      }
    }
    val pairs = (0 until 400).map(_ => (vec(), vec())).toDF("a", "b")
    val rows = pairs.select(
      Similarity.dotFixed(col("a"), col("b")).as("dn"),
      Similarity.dotFixedHof(col("a"), col("b")).as("dh"),
      Similarity.cosine(col("a"), col("b")).as("cn"),
      Similarity.cosineHof(col("a"), col("b")).as("ch")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"dot nullness diverged row $i: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"dot row $i")
      assert(r.isNullAt(2) === r.isNullAt(3), s"cos nullness diverged row $i: $r")
      if (!r.isNullAt(2))
        assert(r.getDouble(2) === r.getDouble(3), s"cos row $i: $r")
    }
  }

  test("media header parsers never throw on arbitrary or truncated bytes") {
    val rnd = new scala.util.Random(202)
    val magics = Seq(
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
      Array(0xFF, 0xD8).map(_.toByte),
      "GIF89a".getBytes, "BM".getBytes, "RIFF1234WAVE".getBytes)
    val cases = (0 until 3000).map { i =>
      val n = rnd.nextInt(64)
      val noise = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      if (i % 3 == 0) magics(i % magics.length) ++ noise else noise
    } ++ Seq(Array.emptyByteArray)
    cases.foreach { b =>
      Multimodal.MediaCodec.imageDims(b) // must return, not throw/hang
      Multimodal.MediaCodec.wavInfo(b)
      val meta = Multimodal.MediaCodec.decode(
        Multimodal.MediaRecord(1L, "image", b, "application/octet-stream", "fuzz"))
      assert(meta.n_bytes === b.length.toLong)
    }
  }

  test("BMP pixel decoder never throws on mutated valid containers") {
    val rnd = new scala.util.Random(303)
    // a valid 3x2 24-bit BMP, then thousands of single/multi-byte mutants
    val stride = ((3 * 3 + 3) / 4) * 4
    val valid = new Array[Byte](54 + stride * 2)
    def putLe32(at: Int, v: Int): Unit = (0 to 3).foreach(i =>
      valid(at + i) = (v >> (8 * i)).toByte)
    valid(0) = 'B'.toByte; valid(1) = 'M'.toByte
    putLe32(2, valid.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, 3); putLe32(22, 2); valid(26) = 1; valid(28) = 24
    assert(Multimodal.MediaCodec.bmpStats(valid).isDefined)
    (0 until 4000).foreach { _ =>
      val m = valid.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      val truncated = m.take(rnd.nextInt(m.length + 1))
      // every call must return an Option, never throw or read out of bounds
      Multimodal.MediaCodec.bmpStats(m)
      Multimodal.MediaCodec.bmpStats(truncated)
      Multimodal.MediaCodec.bmpResize(m, 1 + rnd.nextInt(8), 1 + rnd.nextInt(8))
    }
  }

  test("AVI parser/frame-sampler never throws on mutated valid containers") {
    val rnd = new scala.util.Random(505)
    val valid = AviCodec.aviEncode(5, 3, 1000, 4,
      (f, x, y) => (f * 31 + x * 7 + y * 13) & 0xFFFFFF)
    assert(AviCodec.frameStats(valid, 1).exists(_.size == 4))
    (0 until 4000).foreach { _ =>
      val m = valid.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      val truncated = m.take(rnd.nextInt(m.length + 1))
      // every call must return Option/empty, never throw, loop forever
      // on a negative size field, or read outside the payload
      AviCodec.aviInfo(m); AviCodec.aviInfo(truncated)
      AviCodec.frameChunks(m).foreach(_ => ())
      AviCodec.frameChunks(truncated).foreach(_ => ())
      AviCodec.frameStats(m, 1 + rnd.nextInt(3)).foreach(_.foreach(_ => ()))
      AviCodec.frameStats(truncated, 1).foreach(_.foreach(_ => ()))
    }
  }

  test("PNG pixel decoder never throws on mutated valid containers") {
    val rnd = new scala.util.Random(404)
    // a valid 4x3 RGB PNG built with real deflate + CRC, then mutants
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = ctype.getBytes("US-ASCII")
      crc.update(tb); crc.update(body)
      be32(body.length) ++ tb ++ body ++ be32(crc.getValue.toInt)
    }
    val raw = new Array[Byte]((4 * 3 + 1) * 3) // filter byte 0 per row
    (0 until raw.length).foreach(i => raw(i) = (i * 29).toByte)
    (0 until 3).foreach(y => raw(y * 13) = 0)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val valid = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++
      chunk("IHDR", be32(4) ++ be32(3) ++
        Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", buf.take(n)) ++ chunk("IEND", Array.empty[Byte])
    assert(Multimodal.MediaCodec.pngStats(valid).isDefined)
    (0 until 4000).foreach { _ =>
      val m = valid.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      // every call must return an Option, never throw, read out of
      // bounds, or attempt an allocation from a mutated size field
      Multimodal.MediaCodec.pngStats(m)
      Multimodal.MediaCodec.pngStats(m.take(rnd.nextInt(m.length + 1)))
    }
  }
  test("sorted_intersect_count == size(array_intersect) on sorted sets") {
    val rnd = new scala.util.Random(303)
    // word pools with heavy overlap so intersections are non-trivial;
    // include empties, singletons, unicode and near-identical strings
    val pool = (0 until 40).map(i => s"w$i") ++
      Seq("", "a", "aa", "ab", "emoji\u00e9", "Z")
    def arr(): Seq[String] = {
      val n = rnd.nextInt(12)
      Seq.fill(n)(pool(rnd.nextInt(pool.length)))
    }
    import spark.implicits._
    val df = (0 until 600).map(_ => (arr(), arr())).toDF("a", "b")
      .repartition(3) // force the codegen path, not LocalRelation eval
      .select(
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.array_distinct(col("a"))).as("sa"),
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.array_distinct(col("b"))).as("sb"))
    val got = df.select(
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.SortedIntersectCount(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sa")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sb"))))
          .as("merge"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect(col("sa"), col("sb")))
          .cast("long").as("builtin"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(!r.isNullAt(0), s"row $i: kernel returned null on clean input")
      assert(r.getLong(0) === r.getLong(1), s"row $i: $r")
    }
  }

  test("sorted_intersect_count: null element → null even in unvisited tails") {
    import spark.implicits._
    // array_sort puts nulls LAST — the r10 ADVICE case is a null sitting
    // after the other array is exhausted, where the merge walk never
    // looks. Cover all placements: walked, tail-after-exhaustion (both
    // sides), null in empty-other, and both codegen + eval parity via
    // repartition.
    val cases: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", null), Seq("a")),            // null reached by the walk? b exhausts at "a" — tail
      (Seq("a"), Seq("a", null)),            // symmetric tail
      (Seq("a", "b", "c", null), Seq("a")),  // deep tail
      (Seq(null), Seq()),                    // null vs empty
      (Seq(), Seq(null)),
      (Seq(null), Seq(null)),                // null met by the walk
      (Seq("a", null), Seq("b"))             // walk passes "a", hits null on left
    )
    val df = cases.toDF("sa", "sb").repartition(2)
    val got = df.select(
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.SortedIntersectCount(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sa")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sb"))))
          .as("c"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0), s"case $i must be NULL (null element present)")
    }
  }

  test("md5_hash60 == the conv(substr(md5)) tower on arbitrary strings") {
    val rnd = new scala.util.Random(505)
    val chars = "abc01:✓é ∑-_"
    val rows = (0 until 1000).map { _ =>
      Tuple1((0 until rnd.nextInt(40))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString)
    }.toDF("s")
    val out = rows.select(
      TextDedup.md5Hash60(col("s")).as("k"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("t"))
      .collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === r.getLong(1), s"row $i: $r")
    }
  }

  test("common_prefix_chars == the 64-term substring tower (incl. multibyte)") {
    val rnd = new scala.util.Random(404)
    // alphabet mixes 1- and 3-byte chars so shared byte prefixes can
    // split a multibyte char; near-identical pairs dominate so long
    // prefixes are actually exercised
    val chars = "ab✓é∑ "
    def str(n: Int): String =
      (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    val pairs = (0 until 800).map { i =>
      val a = str(rnd.nextInt(80))
      val b =
        if (i % 3 == 0) a // identical
        else if (i % 3 == 1) a.take(rnd.nextInt(a.length + 1)) + str(rnd.nextInt(10))
        else str(rnd.nextInt(80))
      (a, b)
    }.toDF("a", "b")
    def tower(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val cap = least(length(a), length(b))
      greatest((1 to 64).map { i =>
        when(lit(i) <= cap && substring(a, 1, i) === substring(b, 1, i),
          lit(i.toLong)).otherwise(lit(0L))
      }: _*)
    }
    val rows = pairs.select(
      graft.functions.TextFunctions.commonPrefixChars(col("a"), col("b"), 64)
        .as("k"),
      tower(col("a"), col("b")).as("t")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === r.getLong(1), s"row $i: $r")
    }
  }
}
