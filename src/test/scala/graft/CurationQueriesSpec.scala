package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Targeted behavior specs for the round-9 curation queries, on
  * controlled fixtures (the value-level gate is the DuckDB oracle;
  * these pin the properties the oracle cannot isolate):
  *   - q133's majority vote TIE-BREAK chain (votes DESC → best rank →
  *     label) on a constructed tie;
  *   - q132's streaming dedup determinism: two full replays of the
  *     same feed produce the identical key set, equal to the batch
  *     DISTINCT.
  */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_curfix").toString

  test("q133 vote tie-break: votes desc, then best rank, then label") {
    val dir = fixtureDir()
    // query vec_id 0 (0 % 20 == 0); corpus ids 1..7 (none % 20 == 0).
    // q = [1,0,0,0]; neighbor i = [w,0,0,0] ranks by w descending:
    //   rank1 w=5 label 7, rank2 w=4 label 3, rank3 w=3 label 7,
    //   rank4 w=2 label 3, rank5 w=1 label 9 -> votes: 7->2 (best 1),
    //   3->2 (best 2), 9->1. Votes TIE between 7 and 3; best_rank
    //   decides -> pred 7. ids 6,7 sit below the top-5 cutoff.
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(5f, 0f, 0f, 0f), 7),
      (2L, Array(4f, 0f, 0f, 0f), 3),
      (3L, Array(3f, 0f, 0f, 0f), 7),
      (4L, Array(2f, 0f, 0f, 0f), 3),
      (5L, Array(1f, 0f, 0f, 0f), 9),
      (6L, Array(0.5f, 0f, 0f, 0f), 1),
      (7L, Array(0.25f, 0f, 0f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Queries.registry.toMap.apply("q133_knn_label")
      ._1(spark, dir).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L)
    assert(out(0).getLong(1) === 7L, s"tie-break picked ${out(0)}")
    assert(out(0).getLong(2) === 2L)
  }

  test("q132 streaming dedup: replays are deterministic and equal batch DISTINCT") {
    val dir = fixtureDir()
    val rnd = new scala.util.Random(17)
    val types = Array("click", "view", "buy")
    val rows = (0 until 200).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L),
        rnd.nextInt(30).toLong, types(rnd.nextInt(3)),
        rnd.nextDouble(), s"p$i")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val fn = Queries.registry.toMap.apply("q132_stream_dedup")._1
    def run(): Seq[(Long, String)] =
      fn(spark, dir).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val a = run()
    val b = run()
    assert(a === b, "two replays diverged")
    val expected = rows.map(r => (r._3, r._4)).distinct.sorted
    assert(a.sorted === expected)
    // exactly-once: no key appears twice across micro-batches
    assert(a.distinct.length === a.length)
  }
}
