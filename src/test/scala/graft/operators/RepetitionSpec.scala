package graft.operators

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {

  private def statsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Repetition.stats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("hand-computed counts on a fully repetitive document") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> 5 total,
    // 2 distinct, top count 3; 5-grams = [a b a b a, b a b a b] -> both
    // distinct -> dup mass 0.
    val r = statsOf(Seq(1L -> "a b a b a b"))(1L)
    assert(r.getAs[Long]("total_2grams") === 5L)
    assert(r.getAs[Long]("distinct_2grams") === 2L)
    assert(r.getAs[Long]("top_2gram_count") === 3L)
    assert(r.getAs[Double]("top_2gram_frac") === 0.6)
    assert(r.getAs[Long]("total_5grams") === 2L)
    assert(r.getAs[Long]("dup_5gram_tokens") === 0L)
    assert(!r.getAs[Boolean]("keep")) // 0.6 > 0.20
  }

  test("duplicated 5-gram mass counts every occurrence of repeated grams") {
    // Two copies of the same 6-token sentence: 11 5-grams, the pair
    // straddling the seam are unique-ish but the 2x2 repeats dominate.
    val text = "one two three four five six one two three four five six"
    val r = statsOf(Seq(1L -> text))(1L)
    assert(r.getAs[Long]("total_5grams") === 8L)
    // grams at offsets 1..3 repeat at offsets 7..9? 12 tokens -> 8 grams;
    // gram(i)=t[i..i+4]; gram1=one..five == gram7=one..five -> dup pairs:
    // (1,7),(2,8)  [gram2=two..six == gram8=two..six]; others unique.
    assert(r.getAs[Long]("dup_5gram_tokens") === 4L)
    assert(r.getAs[Double]("dup_5gram_frac") === 0.5)
    assert(!r.getAs[Boolean]("keep")) // 0.5 > 0.30
  }

  test("varied prose passes; degenerate and boilerplate-heavy docs fail") {
    val m = statsOf(Seq(
      1L -> "the quick brown fox jumps over the lazy dog near a quiet river bank today",
      2L -> "buy now buy now buy now buy now buy now buy now buy now buy now",
      3L -> "x")) // single token: one degenerate gram at each size
    assert(m(1L).getAs[Boolean]("keep"))
    assert(!m(2L).getAs[Boolean]("keep"))
    // single-token doc: top fraction 1.0 at both sizes -> filtered
    assert(m(3L).getAs[Long]("total_2grams") === 1L)
    assert(!m(3L).getAs[Boolean]("keep"))
  }

  test("stats are partition-independent") {
    import spark.implicits._
    val docs = (0L until 64L)
      .map(i => (i, (0 to (i % 7).toInt).map(j => s"w${(i + j) % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Repetition.stats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Repetition.stats(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
