package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Bench's regression-flag and noise-auto-exoneration
  * machinery (VERDICT r15 #8): the recheck branch landed in r15 with an
  * empty recheck on a quiet window (noise 1.049, nothing flagged) — it
  * had never executed on real data, so the first contended window would
  * have been its first run. These tests drive both verdicts, the
  * trigger guards, and the failed-rerun edge with synthetic
  * prev/current maps — no SparkSession needed, the functions are pure
  * given the rerun closure.
  */
class BenchSpec extends AnyFunSuite {

  // ---- flagRegressions -------------------------------------------

  test("flagRegressions: only >1.5x AND >1s absolute") {
    val prev = Map("a" -> 2.0, "b" -> 2.0, "c" -> 0.4, "d" -> 2.0, "e" -> -1.0)
    val results = Seq(
      "a" -> 3.2, // 1.6x, >1s -> flagged
      "b" -> 2.9, // 1.45x -> under the ratio bound
      "c" -> 0.9, // 2.25x but sub-second -> jitter, not flagged
      "d" -> 0.8, // faster -> not flagged
      "e" -> 9.0, // prev failed (-1) -> no valid baseline
      "f" -> 9.0) // no prev entry at all
    assert(Bench.flagRegressions(results, prev) == Seq("a"))
  }

  test("flagRegressions: boundary 1.5x exactly is not a flag") {
    assert(Bench.flagRegressions(Seq("a" -> 3.0), Map("a" -> 2.0)).isEmpty)
  }

  // ---- recheckRegressions: trigger guards ------------------------

  test("recheck: quiet window (noise <= 1.1) never reruns") {
    var calls = 0
    val out = Bench.recheckRegressions(Seq("a"), Map("a" -> 3.2),
      Map("a" -> 2.0), noiseIndex = 1.1, reps = 3,
      rerun = _ => { calls += 1; 2.0 })
    assert(out.isEmpty && calls == 0)
  }

  test("recheck: no flags -> no reruns even on a contended window") {
    var calls = 0
    val out = Bench.recheckRegressions(Nil, Map.empty, Map.empty,
      noiseIndex = 2.0, reps = 3, rerun = _ => { calls += 1; 2.0 })
    assert(out.isEmpty && calls == 0)
  }

  // ---- recheckRegressions: both verdicts -------------------------

  test("recheck: rerun drops under 1.5x -> noise_suspect=true") {
    var calls = 0
    val out = Bench.recheckRegressions(Seq("a"), Map("a" -> 4.0),
      Map("a" -> 2.0), noiseIndex = 1.3, reps = 3,
      rerun = n => { assert(n == "a"); calls += 1; 2.2 })
    assert(calls == 3) // reps interleaved rounds over the flagged set
    val Seq((name, r1, r2, suspect)) = out
    assert(name == "a")
    assert(math.abs(r1 - 2.0) < 1e-9) // first-pass ratio 4.0/2.0
    assert(math.abs(r2 - 1.1) < 1e-9) // best-of-all 2.2/2.0
    assert(suspect, "ratio back under 1.5x must read as host noise")
  }

  test("recheck: flag survives the rerun -> noise_suspect=false") {
    val out = Bench.recheckRegressions(Seq("a"), Map("a" -> 4.0),
      Map("a" -> 2.0), noiseIndex = 1.3, reps = 2, rerun = _ => 3.9)
    val Seq((_, _, r2, suspect)) = out
    assert(math.abs(r2 - 1.95) < 1e-9)
    assert(!suspect, "a ratio still over 1.5x is a real-regression signal")
  }

  test("recheck: best-of-all-rounds includes the first pass") {
    // reruns come back SLOWER than the flagged first pass: the verdict
    // must use min(first, reruns), not the rerun window alone
    val out = Bench.recheckRegressions(Seq("a"), Map("a" -> 3.1),
      Map("a" -> 2.0), noiseIndex = 1.3, reps = 2, rerun = _ => 5.0)
    val Seq((_, r1, r2, _)) = out
    assert(math.abs(r1 - 1.55) < 1e-9 && math.abs(r2 - 1.55) < 1e-9)
  }

  test("recheck: failed rerun reps (-1) are dropped, never treated as 0 s") {
    val out = Bench.recheckRegressions(Seq("a"), Map("a" -> 4.0),
      Map("a" -> 2.0), noiseIndex = 1.3, reps = 2, rerun = _ => -1.0)
    val Seq((_, _, r2, suspect)) = out
    assert(math.abs(r2 - 2.0) < 1e-9, "best must fall back to the first pass")
    assert(!suspect)
  }

  test("recheck: multiple flags rerun interleaved, verdicts independent") {
    val reruns = collection.mutable.ArrayBuffer.empty[String]
    val out = Bench.recheckRegressions(Seq("a", "b"),
      Map("a" -> 4.0, "b" -> 6.0), Map("a" -> 2.0, "b" -> 2.0),
      noiseIndex = 1.5, reps = 2,
      rerun = n => { reruns += n; if (n == "a") 2.0 else 5.8 })
    // interleaved rounds: all flagged once, then again — not a,a,b,b
    assert(reruns.toSeq == Seq("a", "b", "a", "b"))
    assert(out.map(r => (r._1, r._4)) == Seq("a" -> true, "b" -> false))
  }
}
