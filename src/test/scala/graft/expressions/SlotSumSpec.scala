package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[SlotSum]] — the per-pair dense-scoring kernel (Σ values(slot)
  * over a slot-index array, NULL ⇔ no addressed slot present). The
  * production BM25 dense path reduces document-at-a-time through
  * [[Bm25DaatAgg]] (same arithmetic, no per-pair rows); slot_sum is
  * the pair-level form for callers that need individual scores, and
  * this spec keeps its eval and codegen paths honest against a
  * Column-algebra reference.
  */
class SlotSumSpec extends SparkSpec {
  import spark.implicits._

  private val bridge = org.apache.spark.sql.graft.ColumnBridge
  private def slotSum(v: org.apache.spark.sql.Column,
      s: org.apache.spark.sql.Column) =
    bridge.column(SlotSum(bridge.expression(v), bridge.expression(s)))

  test("sums addressed slots, skips nulls, NULL iff nothing present") {
    val df = Seq(
      (1L, Seq[java.lang.Long](10L, null, 30L), Seq(0, 2)),      // 40
      (2L, Seq[java.lang.Long](10L, null, 30L), Seq(1)),         // null
      (3L, Seq[java.lang.Long](10L, null, 30L), Seq(1, 2)),      // 30
      (4L, Seq[java.lang.Long](-5L, 7L, 0L), Seq(0, 1, 2)),      // 2
      (5L, Seq[java.lang.Long](10L), Seq(4)),                    // OOR -> null
      (6L, Seq[java.lang.Long](10L), Seq[Int]())                 // empty -> null
    ).toDF("id", "vals", "slots")
    val got = df.select(col("id"), slotSum(col("vals"), col("slots")).as("s"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(got.toSeq == Seq(Some(40L), None, Some(30L), Some(2L), None, None))
  }

  test("codegen and interpreted evaluation agree on fuzzed rows") {
    val rows = (1 to 2000).map { i =>
      val n = 1 + i % 7
      val vals = (0 until n).map(j =>
        if ((i * 31 + j) % 5 == 0) null
        else java.lang.Long.valueOf(((i * 17 + j * 13) % 101) - 50L))
      val slots = (0 until (i % 4)).map(j => (i * 7 + j * 3) % (n + 2))
      (i.toLong, vals, slots)
    }
    val df = rows.toDF("id", "vals", "slots")
    val viaExpr = df.select(col("id"),
      slotSum(col("vals"), col("slots")).as("s"))
    // reference: per-row driver-side recompute
    val expect = rows.map { case (id, vals, slots) =>
      val hit = slots.filter(s => s >= 0 && s < vals.length && vals(s) != null)
      id -> (if (hit.isEmpty) None else Some(hit.map(s => vals(s).longValue).sum))
    }.toMap
    viaExpr.collect().foreach { r =>
      val got = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(got == expect(r.getLong(0)), s"row ${r.getLong(0)}")
    }
  }
}
