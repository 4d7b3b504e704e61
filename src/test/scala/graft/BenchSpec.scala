package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench error accounting: a query that throws must surface as failed
  * and contribute NOTHING to the totals — not show up as a ~0 s
  * "success" (which is exactly how a round-8 bench total lied). */
class BenchSpec extends AnyFunSuite {

  test("a throwing query is marked failed and excluded from totals") {
    val bad = Bench.timeQuery("boom",
      () => throw new IllegalStateException("deliberately broken"),
      runs = 3, extraRuns = 2)
    assert(bad.err.contains("deliberately broken"))
    assert(bad.times.length == 3) // no rerun escalation on failures

    val good = Bench.timeQuery("fine", () => Thread.sleep(5),
      runs = 3, extraRuns = 2)
    assert(good.err.isEmpty)

    val (total, minTotal) = Bench.totals(Seq(bad, good))
    assert(total == good.p50 && minTotal == good.times.min,
      "failed query leaked into the totals")
  }

  test("median is the average of middles on even run counts") {
    var i = 0
    val delays = Vector(1L, 1L, 30L, 60L) // forces spread>2 → reruns...
    // use explicit timings instead: drive timeQuery with deterministic work
    val qt = Bench.timeQuery("even", () => { Thread.sleep(delays(i.min(3))); i += 1 },
      runs = 4, extraRuns = 0)
    val s = qt.times.sorted
    assert(math.abs(qt.p50 - (s(1) + s(2)) / 2) < 1e-12)
  }
}
