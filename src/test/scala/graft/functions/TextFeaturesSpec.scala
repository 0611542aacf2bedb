package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark engine shuffle partition codegen spark engine"),
    (2L, "spark engine shuffle partition codegen spark engines"), // near-dup
    (3L, "completely unrelated words about gardening and tulips"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("embeddings are L2-normalized, deterministic, zero for empty docs") {
    val e1 = TextFeatures.hashEmbed(docs, "doc_id", "text", dim = 16)
    val rows = e1.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x * x.toDouble).sum)
    assert(math.abs(norm(rows(1L)) - 1.0) < 1e-5)
    assert(norm(rows(4L)) === 0.0)
    val again = TextFeatures.hashEmbed(docs, "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows === again)
  }

  test("near-dup documents embed closer than unrelated ones (ANN e2e)") {
    val emb = TextFeatures.hashEmbed(docs.filter($"doc_id" =!= 4L),
      "doc_id", "text", dim = 32)
    val top = Similarity.bruteForceTopK(emb,
        emb.filter(col("doc_id") === 1L), "doc_id", "embedding", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(top === Seq(2L, 3L)) // the near-dup ranks first
  }
}
