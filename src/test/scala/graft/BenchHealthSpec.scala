package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the scaling-bench pair health rule (Bench.Pair) — the
  * load-bearing logic behind the one BASELINE gate (scaling efficiency on a
  * HEALTHY pair). Each hostile scenario below is a measured failure mode from
  * the r3–r5 full-bench runs (see Bench.scala's Pair scaladoc and
  * BASELINE.md's methodology notes); the rule must classify all of them
  * unhealthy while keeping the recorded quiet pairs healthy.
  */
class BenchHealthSpec extends AnyFunSuite {
  import Bench.{ArmResult, Pair}

  private val docs = 800000L
  // Quiet-floor CPU seconds for 800k docs at the committed floor knobs:
  // floor 0.70 ms/doc → 560 s/arm; slow-box limit = floor × factor.
  private val floorCpu = Bench.cpuFloorMsPerDoc * docs / 1000.0
  private val slowLim = Bench.cpuFloorMsPerDoc * Bench.cpuFloorFactor

  /** A quiet 2→8 pair shaped like the recorded healthy runs (eff ≈ 0.89,
    * util ≈ 0.95, cpu8/cpu2 ≈ 1.07, canaries flat, cpu/doc at floor).
    */
  private def quietPair(
      t2: Double = 280.0, t8: Double = 78.7,
      cpu2: Double = floorCpu, cpu8: Double = floorCpu * 1.07,
      c: Double = 0.75, bw: Double = 4.3): Pair =
    Pair(
      small = ArmResult(t2, cpu2, c, c, bw, bw),
      large = ArmResult(t8, cpu8, c, c, bw, bw),
      smallCores = 2, largeCores = 8, docs = docs)

  private def healthyDefault(p: Pair): Boolean =
    p.healthy(bestCanary = 0.75,
      minCpuSmall = p.small.cpuSec, minCpuLarge = p.large.cpuSec)

  test("eff is wall-time ratio over the core scale") {
    val p = quietPair(t2 = 280.0, t8 = 78.7)
    assert(math.abs(p.eff - 280.0 / (4.0 * 78.7)) < 1e-12)
  }

  test("quiet pair at the recorded shape is healthy") {
    val p = quietPair()
    assert(!p.contended && p.effPossible && p.cpuRatioOk && !p.slowBox)
    assert(healthyDefault(p))
  }

  test("contended: large arm slower than small arm is never healthy") {
    val p = quietPair(t2 = 100.0, t8 = 120.0, cpu8 = floorCpu * 1.2)
    assert(p.contended && !healthyDefault(p))
  }

  test("superlinear efficiency means the small arm was stolen from") {
    // All-hostile-day shape: eff 1.10 with cpu8/cpu2 = 0.87 "passing" the
    // one-sided ratio check — only effPossible catches it.
    val p = quietPair(t2 = 352.0, t8 = 80.0,
      cpu2 = floorCpu * 1.49, cpu8 = floorCpu * 1.3)
    assert(p.eff > 1.0 && p.cpuRatioOk)
    assert(!p.effPossible && !healthyDefault(p))
  }

  test("within-pair cpu ratio flags wide-arm lock-holder preemption") {
    // Stolen pairs measured cpu8/cpu2 = 1.5–2.4; quiet 0.99–1.21.
    val p = quietPair(t8 = 120.0, cpu8 = floorCpu * 1.6)
    assert(!p.cpuRatioOk && !healthyDefault(p))
  }

  test("slow canary in either arm rejects the pair") {
    val base = quietPair()
    val p = base.copy(large = base.large.copy(canary1 = 0.75 * 1.6))
    assert(!p.healthy(bestCanary = 0.75,
      minCpuSmall = p.small.cpuSec, minCpuLarge = p.large.cpuSec))
  }

  test("run-relative cpu floor rejects an arm 1.5x over the run minimum") {
    val p = quietPair(cpu2 = floorCpu * 1.4, cpu8 = floorCpu * 1.45)
    // Run minimum comes from a quieter pair in the same run.
    assert(!p.slowBox) // still under the absolute limit
    assert(!p.healthy(bestCanary = 0.75,
      minCpuSmall = floorCpu * 0.93, minCpuLarge = floorCpu))
  }

  test("low large-arm utilization rejects the pair") {
    // util8 = cpu8/(t8*8) < 0.85 while everything else looks quiet.
    val p = quietPair(t8 = 100.0, cpu8 = floorCpu * 1.18)
    assert(p.utilLarge < 0.85 && !healthyDefault(p))
  }

  test("slow-box: uniform contention inflating BOTH arms' cpu/doc fails " +
      "even when every within-run check passes") {
    // 13:04 full-run shape: cpu2 1436 s / cpu8 1901 s at 800k docs
    // (1.80 / 2.38 ms/doc vs quiet floor 0.70) — util, canaries and the
    // within-pair ratio all pass; only the absolute floor catches it.
    assume(Bench.cpuFloorMsPerDoc > 0)
    val p = quietPair(t2 = 740.0, t8 = 260.0,
      cpu2 = 1436.0, cpu8 = 1901.0)
    assert(!p.contended && p.effPossible && p.cpuRatioOk &&
      p.utilLarge >= 0.85)
    assert(p.small.cpuSec * 1000.0 / docs > slowLim)
    assert(p.slowBox && !healthyDefault(p))
  }

  test("slow-box check does not apply below 200k docs") {
    assume(Bench.cpuFloorMsPerDoc > 0)
    // Fixed JVM+codegen cost dominates per-doc CPU at small corpora: the
    // same absolute inflation must not reject a 50k-doc pair.
    val small = 50000L
    val p = Pair(
      small = ArmResult(40.0, 0.002 * small, 0.75, 0.75, 4.3, 4.3),
      large = ArmResult(11.5, 0.002 * small * 1.1, 0.75, 0.75, 4.3, 4.3),
      smallCores = 2, largeCores = 8, docs = small)
    assert(p.small.cpuSec * 1000.0 / small > slowLim)
    assert(!p.slowBox)
  }
}
