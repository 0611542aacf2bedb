package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextDedup

/** Edge-case semantics for the text tower: empty and whitespace-only
  * documents must flow through every operator without error.
  */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, ""), (2L, "   "), (3L, "one"), (4L, "")).toDF("doc_id", "text")

  test("token stats on empty/whitespace text are zero, not null/error") {
    val r = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(0L, 0L, 1L, 0L))
    assert(r.map(_.getDouble(2)).toSeq === Seq(0.0, 0.0, 0.75, 0.0))
  }

  test("BPE pre-tokenizer count segments contractions/digits/punct") {
    val cases = Seq(
      (1L, "it's a test-case, with 123 numbers  and   spaces!"),
      (2L, "hello world"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = cases.select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    // "it"+"'s"+" a"+" test"+"-"+"case"+","+" with"+" 123"+" numbers"+
    // " "+" and"+"  "+" spaces"+"!" = 15 (verified equal in DuckDB RE2)
    assert(got === Seq(15L, 2L, 0L, 0L))
  }

  test("exact dedup collides empty with whitespace-only (normalized)") {
    val got = TextDedup.exact(docs, "text", Seq(col("doc_id").asc))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // "" and "   " normalize to different strings ("" vs " ") — both
    // distinct from "one"; the two "" docs collide
    assert(got === Array(1L, 2L, 3L))
  }

  test("minHash and simHash pipelines tolerate empty documents") {
    val mh = TextDedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.9)
    // the two empty docs are true near-dups of each other
    val pairs = mh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    val sh = TextDedup.simHashPairs(docs, "doc_id", "text", maxDist = 0)
    // empty docs have no token rows -> absent from simhash pairs; no error
    sh.collect()
  }

  test("langId returns 'und' for empty text") {
    val got = docs.select(TextFunctions.langId(col("text")).as("l"))
      .collect().map(_.getString(0))
    assert(got.count(_ == "und") >= 3)
  }
}
