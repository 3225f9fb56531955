package graft

import graft.tools.BenchGuard
import org.scalatest.funsuite.AnyFunSuite

/** Parser semantics for the bench regression gate: the budget file, a
  * full Bench output line, and the driver-artifact fallback (log
  * captures keep only the final ~2k chars, which can truncate the line
  * BEFORE the "queries" key — BENCH_r04.json is exactly that shape).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("parseFlat reads name:number pairs and skips _comment keys") {
    val parsed = BenchGuard.parseFlat(
      """{"_comment": "ceilings, 2.5s floor", "q01_pricing_summary": 5.4,
        | "c14_recover_with": 2.5}""".stripMargin)
    assert(parsed == Map(
      "q01_pricing_summary" -> 5.4, "c14_recover_with" -> 2.5))
  }

  test("extractQueries pulls the queries object out of a full bench line") {
    val line = """{"metric":"total","unit":"sec","sf":"/d/sf0.1",""" +
      """"cpus":32,"max_heap_gb":17.18,"java":"17.0.20",""" +
      """"queries":{"q01_pricing_summary":2.687,"s17_stream_checkpoint_recovery":1.703},""" +
      """"errors":{},"value":147.406}"""
    // env fields (cpus, max_heap_gb) must NOT leak in as query timings
    assert(BenchGuard.extractQueries(line) == Map(
      "q01_pricing_summary" -> 2.687,
      "s17_stream_checkpoint_recovery" -> 1.703))
  }

  test("artifact clipped AFTER the queries key still gets a partial check") {
    // a killed run can clip the line before the object ever closes; the
    // strict path would substring to a missing '}' — must fall back, not
    // crash
    val clipped =
      """{"metric":"total","queries":{"q01_pricing_summary":2.687,"q02_join_ag"""
    assert(BenchGuard.extractQueries(clipped) ==
      Map("q01_pricing_summary" -> 2.687))
  }

  test("a pair clipped mid-number is dropped, not read as a smaller timing") {
    // "n43_pagerank":10.42 clipped to ...":1 parses as a VALID smaller
    // number — accepting it could silently pass an over-budget query;
    // only a pair whose number is followed by some character is trusted
    val clipped =
      """{"metric":"total","queries":{"q01_pricing_summary":2.687,"n43_pagerank":1"""
    assert(BenchGuard.extractQueries(clipped) ==
      Map("q01_pricing_summary" -> 2.687))
  }

  test("truncated driver artifact falls back to query-shaped pairs") {
    // the r4 shape: tail begins mid-map, escaped quotes, no "queries" key
    val truncated = """{"n": 4, "rc": 0, "cpus": 32, "tail":
      "\":0.742,\"q05_anti_join\":0.425,\"q06_outer_join\":1.107},\"errors\":{},\"value\":166.178}\n"}"""
    val parsed = BenchGuard.extractQueries(truncated)
    assert(parsed == Map(
      "q05_anti_join" -> 0.425, "q06_outer_join" -> 1.107))
  }
}
