package graft.operators

import graft.SparkSpec

class TextChunkerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"), // 10 tokens
    (2L, "x y"),                 // shorter than one chunk
    (3L, "")                     // empty
  ).toDF("doc_id", "text")

  test("chunking with overlap covers every token, windows overlap correctly") {
    val got = TextChunker.chunk(docs, "doc_id", "text", chunkTokens = 4,
        overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val doc1 = got.filter(_._1 == 1L).map(x => (x._3, x._4)).toSeq
    // stride 3: [a b c d] [d e f g] [g h i j]
    assert(doc1 === Seq(("a b c d", 4L), ("d e f g", 4L), ("g h i j", 4L)))
    val doc2 = got.filter(_._1 == 2L).map(x => (x._3, x._4)).toSeq
    assert(doc2 === Seq(("x y", 2L)))
    val doc3 = got.filter(_._1 == 3L).map(x => (x._3, x._4)).toSeq
    assert(doc3 === Seq(("", 0L)))
  }

  test("packing assigns items to windows by running sum, never splitting") {
    import org.apache.spark.sql.functions._
    val items = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 60L), (5L, 10L))
      .toDF("item", "toks")
    val got = TextChunker.pack(items, Seq(col("item")), "toks", 200)
      .orderBy("item").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("pack_id")).toSeq
    // cum_before: 0,100,200,300,360 -> packs 0,0,1,1,1
    assert(got === Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("no overlap: chunks partition the token stream") {
    val got = TextChunker.chunk(docs.filter($"doc_id" === 1L), "doc_id",
        "text", chunkTokens = 4)
      .orderBy("chunk_id").collect().map(_.getString(2)).toSeq
    assert(got === Seq("a b c d", "e f g h", "i j"))
  }
}
