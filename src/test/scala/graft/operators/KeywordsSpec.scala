package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana shared shared shared"),
    (2L, "banana cherry shared shared shared shared"),
    (3L, "durian shared shared shared shared shared")).toDF("id", "body")

  test("doc-unique tokens outrank corpus-wide tokens") {
    // 'shared' appears in every doc (df=N) → idf weight (N-df+1)/df is
    // minimal; each doc's top keyword must be its distinctive token.
    val top1 = Retrieval.tfidfKeywords(docs, "id", "body", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token"))
      .toMap
    assert(top1 === Map(1L -> "apple", 2L -> "cherry", 3L -> "durian"))
  }

  test("scores are the exact rational tf-idf and ranks are dense per doc") {
    val rows = Retrieval.tfidfKeywords(docs, "id", "body", k = 10)
      .where(col("doc_id") === 1L)
      .orderBy(col("rank")).collect()
    // doc1: apple tf=2 df=1 → 2*(3-1+1)/1 = 6.0; banana tf=1 df=2 → (3-2+1)/2 = 1.0
    //       shared tf=3 df=3 → 3*(3-3+1)/3 = 1.0 ; tie broken by token text
    assert(rows.map(_.getAs[String]("token")).toSeq
      === Seq("apple", "banana", "shared"))
    assert(rows.map(_.getAs[Double]("score")).toSeq === Seq(6.0, 1.0, 1.0))
    assert(rows.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
  }

  test("k truncates per document, not globally") {
    val out = Retrieval.tfidfKeywords(docs, "id", "body", k = 2)
    assert(out.count() === 6)
    assert(out.groupBy("doc_id").count().collect()
      .forall(_.getAs[Long]("count") === 2L))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Retrieval.tfidfKeywords(docs, "id", "body", k = 0)
    }
  }
}
