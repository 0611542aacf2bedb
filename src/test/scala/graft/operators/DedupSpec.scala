package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst keeps exactly the first row per key under the given order") {
    val df = Seq(
      ("a", 1L, "old"), ("a", 2L, "new"), ("b", 5L, "only"),
      ("a", 1L, "old-dup"), ("c", 3L, "x"), ("c", 2L, "y"))
      .toDF("k", "v", "tag")
    val got = Dedup.keepFirst(df, Seq("k"), Seq(col("v").asc, col("tag").asc))
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      === Seq(("a", 1L, "old"), ("b", 5L, "only"), ("c", 2L, "y")))
  }

  test("upsert: incoming wins per key by version; EXCLUDED wins version ties") {
    val existing = Seq(("k1", 10L, "e1"), ("k2", 10L, "e2"), ("k3", 10L, "e3"))
      .toDF("k", "ver", "payload")
    val incoming = Seq(("k1", 20L, "i1"), ("k2", 10L, "i2"))
      .toDF("k", "ver", "payload")
    val got = Dedup.upsert(existing, incoming, Seq("k"), "ver")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    // k1: newer incoming wins; k2: tie -> incoming (EXCLUDED) wins;
    // k3: untouched existing survives.
    assert(got === Seq(("k1", "i1"), ("k2", "i2"), ("k3", "e3")))
  }

  test("upsertWithDeletes: newest tombstone removes the key; stale ones don't") {
    val existing = Seq(("k1", 10L, "e1"), ("k2", 10L, "e2"), ("k3", 10L, "e3"))
      .toDF("k", "ver", "payload")
    val incoming = Seq(
      ("k1", 20L, "del", true),   // newer tombstone -> k1 gone
      ("k2", 5L, "late-del", true), // OLDER than existing -> ignored
      ("k3", 20L, "i3", false))   // plain update
      .toDF("k", "ver", "payload", "deleted")
    val got = Dedup.upsertWithDeletes(existing, incoming, Seq("k"), "ver",
        "deleted")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got === Seq(("k2", "e2"), ("k3", "i3")))
    // result schema carries neither the tombstone nor internal columns
    assert(Dedup.upsertWithDeletes(existing, incoming, Seq("k"), "ver",
      "deleted").columns.toSeq === Seq("k", "ver", "payload"))
  }

  test("upsert preserves schema and row count = distinct keys") {
    val existing = Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "ver", "x")
    val incoming = Seq(("b", 2L, 3.0), ("c", 1L, 4.0)).toDF("k", "ver", "x")
    val got = Dedup.upsert(existing, incoming, Seq("k"), "ver")
    assert(got.columns.toSeq === Seq("k", "ver", "x"))
    assert(got.count() === 3)
  }
}
