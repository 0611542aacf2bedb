package graft

import org.scalatest.funsuite.AnyFunSuite

class StrategyLogSpec extends AnyFunSuite {

  test("bounded: past maxEntries new decisions drop and the drop surfaces on drain") {
    StrategyLog.drain() // isolate from other suites
    (1 to StrategyLog.maxEntries + 5).foreach(i =>
      StrategyLog.record("op", "s", s"d$i"))
    val drained = StrategyLog.drain()
    assert(drained.length === StrategyLog.maxEntries + 1)
    val last = drained.last
    assert(last.op === "strategy-log" && last.strategy === "dropped")
    assert(last.detail.startsWith("5 decisions dropped"))
    // counter reset: the next window is clean
    StrategyLog.record("op", "s", "after")
    assert(StrategyLog.drain().map(_.detail) === Seq("after"))
  }

  test("render is the single artifact format and dedups repeats") {
    val ds = Seq(
      StrategyLog.Decision("bm25TopK", "sparse", "nDocs=5"),
      StrategyLog.Decision("bm25TopK", "sparse", "nDocs=5"),
      StrategyLog.Decision("percentiles.exact", "window", "n=10"))
    assert(StrategyLog.render(ds) === Seq(
      "bm25TopK=sparse [nDocs=5]",
      "percentiles.exact=window [n=10]"))
  }
}
