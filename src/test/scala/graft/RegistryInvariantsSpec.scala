package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide structural invariants, enforced at suite speed so a
  * drift fails in `sbt test` instead of minutes later in BenchGuard or
  * a driver artifact:
  *
  *   - every query carries a DuckDB oracle unless it is on the PINNED
  *     rows-only list (n04's xxhash64 SimHash bits, q30's
  *     approx_count_distinct, n128's GK quantile sketches, and n142's
  *     eigensolve-derived whitening have no cross-engine-exact SQL
  *     form — all documented in COVERAGE.md; the replacement
  *     guarantees are TextAnalysisSketchSpec's rank-band pin and
  *     WhiteningSpec's identity-covariance pin). Set equality, so a
  *     pin that GAINS an oracle is flagged as stale exactly like a
  *     new query that silently ships without one.
  *   - every registered query has a committed bench ceiling, and every
  *     ceiling names a registered query (same parser the gate uses).
  *   - names follow the family_snake convention the driver artifacts
  *     key on.
  */
class RegistryInvariantsSpec extends AnyFunSuite {

  test("every query has an oracle unless pinned rows-only") {
    val rowsOnly = Set("n04_dedup_simhash", "q30_approx_distinct",
      "n128_length_percentiles_sketch", "n142_zca_whitening")
    val missing = queries.Registry.all
      .filter(_.oracle.isEmpty).map(_.name).toSet
    assert(missing == rowsOnly,
      s"oracle drift: new rows-only=${missing -- rowsOnly}, " +
        s"stale pins=${rowsOnly -- missing}")
  }

  test("bench budget covers the registry exactly") {
    val budget = graft.tools.BenchGuard.parseFlat(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_budget.json")))).keySet
    val registered = queries.Registry.all.map(_.name).toSet
    assert(registered -- budget == Set.empty,
      s"queries without a ceiling: ${registered -- budget}")
    assert(budget -- registered == Set.empty,
      s"stale ceilings for unregistered queries: ${budget -- registered}")
  }

  test("query names follow the family_snake convention") {
    val pat = "^[cnqsw]\\d+_[a-z0-9_]+$".r
    val bad = queries.Registry.all.map(_.name)
      .filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }

  test("scan baseline covers the registry exactly, >=3 entries pinned inherent") {
    // the ScanGuard discipline at suite speed: every registered query
    // carries a committed worst-scan-count baseline (a new query cannot
    // ship without being profiled), no stale entries linger, and every
    // >=3-scan baseline is argued onto ScanGuard.inherent (PLANS.md) —
    // set equality both ways, like the BNLJ whitelist. The measured
    // re-profile itself runs in the ScanGuard main (minutes, not suite).
    val baseline = graft.tools.BenchGuard.parseFlat(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(graft.tools.ScanGuard.baselineFile))))
      .map { case (k, v) => k -> v.toInt }
    val registered = queries.Registry.all.map(_.name).toSet
    assert(registered -- baseline.keySet == Set.empty,
      s"queries without a scan baseline: ${registered -- baseline.keySet}")
    assert(baseline.keySet -- registered == Set.empty,
      s"stale scan baselines: ${baseline.keySet -- registered}")
    val overThree = baseline.filter(_._2 >= 3).keySet
    assert(overThree == graft.tools.ScanGuard.inherent,
      s"unwhitelisted >=3-scan: ${overThree -- graft.tools.ScanGuard.inherent}; " +
        s"stale inherent pins: ${graft.tools.ScanGuard.inherent -- overThree}")
  }

  test("scale baseline covers the probe registry exactly") {
    // the ScaleProbe --gate discipline at suite speed: every registered
    // probe carries a committed 8x/1x growth-ratio ceiling (a new probe
    // cannot ship without one) and no stale ceilings linger — the
    // measured re-probe itself runs in the ScaleProbe main (minutes).
    val baseline = graft.tools.BenchGuard.parseFlat(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(graft.tools.ScaleProbe.baselineFile))))
    val probes = graft.tools.ScaleProbe.probeNames.toSet
    assert(probes -- baseline.keySet == Set.empty,
      s"probes without a ratio ceiling: ${probes -- baseline.keySet}")
    assert(baseline.keySet -- probes == Set.empty,
      s"stale ratio ceilings: ${baseline.keySet -- probes}")
    assert(baseline.values.forall(_ >= 1.0),
      "a growth-ratio ceiling under 1.0 can never pass")
  }

  test("sweep order covers the registry exactly, with distinct slots") {
    // the pinned-sweep-order discipline: every registered query holds a
    // committed slot (a new query cannot ship without being appended),
    // no stale entries linger, and slots are distinct so the order is
    // total. Bench.sweepOrder sorts by these slots; set equality both
    // ways keeps registry growth from ever reshuffling existing
    // queries' accumulated-debt positions (the r12 ceiling-churn mode).
    val order = graft.tools.BenchGuard.parseFlat(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("sweep_order.json"))))
    val registered = queries.Registry.all.map(_.name).toSet
    assert(registered -- order.keySet == Set.empty,
      s"queries without a sweep slot: ${registered -- order.keySet}")
    assert(order.keySet -- registered == Set.empty,
      s"stale sweep slots: ${order.keySet -- registered}")
    assert(order.values.toSeq.distinct.size == order.size,
      "duplicate sweep slots — the order must be total")
  }

  test("BenchGuard's replay name filter accepts every registered query") {
    // The r11 replay parser's `^[cnqsw]\d\d_` silently dropped every
    // three-digit query (n100–n114) from artifact replays — a breach
    // there passed unflagged. Pinning the gate's OWN regex against the
    // registry means a name shape the gate can't see fails here, at
    // suite speed, instead of opening a new blind spot.
    val bad = queries.Registry.all.map(_.name)
      .filterNot(n => graft.tools.BenchGuard.queryName.findFirstIn(n).isDefined)
    assert(bad.isEmpty, s"names invisible to BenchGuard replay: $bad")
  }
}
