package graft

import graft.operators.Similarity

/** Walk-budget drift alarm + size-aware serving default: the
  * beamForSegment rule is now the DEFAULT beam on the segment paths
  * (AutoBeam), and the rebuild-the-graph threshold is a flag a
  * dashboard commits, not scaladoc prose. */
class WalkBudgetSpec extends SparkSpec {

  test("walk-budget alarm fires past 2x the canary and not before") {
    // the measured r18 shapes: 218-member sf0.01 segment → beam 20
    // (no alarm), 808-member sf0.1 segment → beam 68 > 2×20 (alarm)
    assert(Similarity.walkBudgetAlarm(218L) == ((20, false)))
    val (b808, fire808) = Similarity.walkBudgetAlarm(808L)
    assert(b808 == 68 && fire808)
    // growth just past the threshold boundary: 2×canary is the edge —
    // beam 41 (n = 481) fires, beam 40 (n = 480) does not
    assert(Similarity.walkBudgetAlarm(480L) == ((40, false)))
    assert(Similarity.walkBudgetAlarm(481L) == ((41, true)))
  }

  test("segment serving defaults to the size-aware beam (AutoBeam)") {
    // at sf0.001 the en segment has 193 members → beamForSegment = the
    // 20-floor, so the auto default must serve IDENTICALLY to the
    // pinned canary walk the registry oracle replays
    val auto = Similarity.simGraphSearchSegment(spark, Sf).collect().toSeq
    val pinned = Similarity.simGraphSearchSegment(spark, Sf, beam = 20)
      .collect().toSeq
    assert(auto == pinned,
      "AutoBeam resolution diverged from the explicit floor walk")
    assert(auto.nonEmpty)
    CacheRegistry.releaseAll()
  }
}
