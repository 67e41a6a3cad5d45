package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decision table for the bench regression gate ([[Bench.gateLabel]]) —
  * the logic changed twice in round 9 (cpu-aware exoneration, then
  * external-load corroboration) and convicts/acquits driver runs, so it
  * gets a spec of its own. Cases mirror the real incidents: round-7's
  * loaded-box wall swing (must exonerate), an accidental-sleep style
  * flat-cpu breach on a quiet box (must convict — the r9 fix), and a
  * grown-cpu breach under load (must convict — load can't excuse more
  * computation). */
class BenchGateSpec extends AnyFunSuite {
  private val cpus = 32.0
  // suite baseline total 100 s; a "meaningful" query owns >= 2 s of it

  test("below the 3x-with-2s-floor threshold is no breach at all") {
    assert(Bench.gateLabel(5.0, 100.0, Some(10.0), 14.9, 50.0, 30.0, cpus).isEmpty)
    // 2 s absolute floor: a 0.2 s query at 1.9 s (9.5x!) stays silent
    assert(Bench.gateLabel(0.2, 100.0, Some(0.4), 1.9, 4.0, 0.0, cpus).isEmpty)
  }

  test("flat-cpu breach on a QUIET box is a regression (accidental sleep shape)") {
    // wall 4x, cpu flat, nobody else on the machine -> convict
    assert(Bench.gateLabel(5.0, 100.0, Some(10.0), 20.0, 11.0, 0.5, cpus)
      === Some("REGRESSION"))
  }

  test("flat-cpu breach UNDER external load is exonerated (round-7 shape)") {
    val label = Bench.gateLabel(5.0, 100.0, Some(10.0), 20.0, 11.0, 12.0, cpus)
    assert(label.exists(_.startsWith("warn (exonerated")))
  }

  test("grown-cpu breach is a regression even under external load") {
    // cpu 3x its baseline: the query COMPUTED more — load can't excuse it
    assert(Bench.gateLabel(5.0, 100.0, Some(10.0), 20.0, 30.0, 12.0, cpus)
      === Some("REGRESSION"))
  }

  test("small-query breach can only warn, never fail") {
    // 1% of the suite: noise swings many-x; grown cpu, quiet box — still warn
    assert(Bench.gateLabel(1.0, 100.0, Some(2.0), 9.0, 8.0, 0.0, cpus)
      === Some("warn"))
  }

  test("no cpu baseline row means no waited evidence -> meaningful breach convicts") {
    assert(Bench.gateLabel(5.0, 100.0, None, 20.0, 11.0, 12.0, cpus)
      === Some("REGRESSION"))
  }

  test("loadavg-less platform keeps the legacy waited-only exoneration") {
    val label = Bench.gateLabel(5.0, 100.0, Some(10.0), 20.0, 11.0, -999.0, cpus)
    assert(label.exists(_.startsWith("warn (exonerated")))
  }

  test("failed-query cpu sentinel (-1) never counts as waited") {
    assert(Bench.gateLabel(5.0, 100.0, Some(10.0), 20.0, -1.0, 12.0, cpus)
      === Some("REGRESSION"))
  }
}
