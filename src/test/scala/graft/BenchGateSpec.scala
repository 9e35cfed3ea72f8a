package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure pieces (round 13's
  * self-adjudication, VERDICT r12 #1): load normalization, flagging,
  * and the confirm-only-if-isolated-rerun-also-slow verdict — pinned
  * here so the adjudication contract cannot silently drift out from
  * under four rounds of false-flag history.
  */
class BenchGateSpec extends AnyFunSuite {

  test("loadFactor: median of ratios vs pin, clamped to >= 1") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    // ratios 1.5, 1.0, 0.5 -> median 1.0
    assert(Bench.loadFactor(
      Seq("a" -> 1.5, "b" -> 2.0, "c" -> 2.0), prev) == 1.0)
    // all faster than pin: clamp to 1, never normalize DOWN
    assert(Bench.loadFactor(
      Seq("a" -> 0.5, "b" -> 1.0, "c" -> 2.0), prev) == 1.0)
    // uniformly 3x-loaded machine -> load 3
    assert(Bench.loadFactor(
      Seq("a" -> 3.0, "b" -> 6.0, "c" -> 12.0), prev) == 3.0)
    // no pins at all -> neutral
    assert(Bench.loadFactor(Seq("x" -> 9.9), Map.empty) == 1.0)
  }

  test("flaggedEntries: > 2x AFTER dividing out load; unpinned never flag") {
    val prev = Map("a" -> 1.0, "b" -> 2.0)
    val t = Seq("a" -> 5.0, "b" -> 2.1, "new" -> 99.0)
    val flags = Bench.flaggedEntries(t, prev, load = 1.0)
    assert(flags.map(_._1) == Seq("a")) // 5x flags, 1.05x doesn't, unpinned can't
    assert(flags.head._2 == 1.0 && flags.head._3 == 5.0)
    // the same 5x entry under load 2.5 normalizes to 2x -> not flagged
    assert(Bench.flaggedEntries(t, prev, load = 2.5).isEmpty)
  }

  test("parseFlagBase: envelope read from flagbase; legacy pins fall back to queries (r18 median-pin split)") {
    val withBoth =
      """{"metric":"total","queries":{"a":1.0,"b":2.0},""" +
        """"flagbase":{"a":1.8,"b":3.5}}"""
    assert(Bench.parsePrevQueries(withBoth) == Map("a" -> 1.0, "b" -> 2.0))
    assert(Bench.parseFlagBase(withBoth) == Map("a" -> 1.8, "b" -> 3.5))
    // a pre-split pin has only queries: the gate keeps working against it
    val legacy = """{"metric":"total","queries":{"a":1.0,"b":2.0}}"""
    assert(Bench.parseFlagBase(legacy) == Map("a" -> 1.0, "b" -> 2.0))
  }

  test("confirmRegression: isolated rerun must itself exceed 2x pin") {
    assert(!Bench.confirmRegression(Some(1.9), pin = 1.0)) // exonerated
    assert(!Bench.confirmRegression(Some(2.0), pin = 1.0)) // boundary: not > 2x
    assert(Bench.confirmRegression(Some(2.01), pin = 1.0)) // confirmed
    // a rerun that threw cannot exonerate the flag
    assert(Bench.confirmRegression(None, pin = 1.0))
  }

  test("confirmTwoPass: BOTH isolated reruns must exceed 2x pin (r14 q40 false-confirm class)") {
    // the r14 shape: first rerun inside the contention burst confirms,
    // the end-of-run second pass lands at pin -> exonerated
    assert(!Bench.confirmTwoPass(Some(5.0), Some(1.1), pin = 1.0))
    // a real regression is slow in both passes -> confirmed
    assert(Bench.confirmTwoPass(Some(5.0), Some(4.8), pin = 1.0))
    // first pass already exonerates regardless of the second
    assert(!Bench.confirmTwoPass(Some(1.5), None, pin = 1.0))
    // neither pass producing a time cannot exonerate (fail closed)
    assert(Bench.confirmTwoPass(None, None, pin = 1.0))
    // second pass throwing cannot exonerate a slow first pass
    assert(Bench.confirmTwoPass(Some(5.0), None, pin = 1.0))
  }
}
