package graft.tools

import graft.GraftSession
import java.nio.file.{Files, Paths}

/** Scan-amplification regression gate — BenchGuard's shape applied to
  * ScanAudit's measurement. `scan_baseline.json` commits, for every
  * registered query, the worst per-table parquet-scan-node count of its
  * FINAL adaptive plan (ReusedExchange skipped, each cache's fill scan
  * counted once); this main re-measures every query at sf0.001 and
  * FAILS (exit 1) when any query scans a table MORE times than its
  * baseline, errors, or drifts out of sync with the baseline file.
  *
  * Why a gate: the r11 ScanAudit run found three genuine at-scale
  * defects (n110/n113/n20/n86/n94 diamonds re-scanning the corpus
  * 3–5×) that NO oracle can see — a correct-but-rescanning plan hashes
  * identically. But the audit was a manual tool, so the next diamond
  * could regress silently, exactly like bench regressions could before
  * BenchGuard. The baseline makes a new diamond a red build.
  *
  * Inherent ≥3-scan queries are pinned on [[inherent]] with set
  * equality (the PlanQualitySpec BNLJ-whitelist discipline): a new
  * query cannot ship with a ≥3 baseline without being argued onto the
  * list (each entry's reasoning lives in docs/PLANS.md), and an entry
  * whose plan improves below 3 is flagged as stale instead of
  * lingering.
  *
  * Run:
  *   sbt "runMain graft.tools.ScanGuard"           # gate (sf0.001)
  *   sbt "runMain graft.tools.ScanGuard --write"   # regenerate baseline
  */
object ScanGuard {
  val baselineFile = "scan_baseline.json"

  /** Queries whose ≥3-scan profiles are inherent to their semantics,
    * not unmaterialized diamonds — triaged per-query in docs/PLANS.md
    * ("ScanGuard inherent whitelist"). Set equality against the
    * committed baseline is enforced here and in RegistryInvariantsSpec.
    */
  val inherent: Set[String] = Set(
    // ANN family: the repeats split into tiny PushedFilters query-side
    // scans (vec_id < Q — selective at any scale) plus one 64-float
    // embeddings pass per index method/table being built or compared
    "n06_ann_lsh",
    "n12_ivf_ann",
    "n46_pq_ann",
    "n52_ann_lsh_multitable",
    "n54_ivf_lloyd",
    "n101_ann_recall_eval",
    // nProbe sweep: ground-truth brute pass + the ONE shared
    // assignment/scoring of ivfProbeSweep — constant in the number of
    // settings (the per-call loop read 11; the shared form reads 8)
    "n120_ivf_nprobe_sweep",
    // bitext mining: two embedding spaces × forward/backward top-k
    "n102_bitext_margin",
    // contrastive mining: pruned anchor scan + count-only scan + the
    // cosine pass + the rank-table pass (two fundamental orders of the
    // same embeddings; caching 64-float rows buys nothing at scale)
    "n76_contrastive_triplets",
    // boilerplate removal: gram-position fill + a count-only per-source
    // scan + the rebuild pass that needs the original token arrays —
    // caching the corpus TEXT to merge the two text passes is exactly
    // the materialization that doesn't scale
    "n55_boilerplate_removal",
    // BT reward model: pair mining + token bucketing + trajectory
    // hydration — composition-bounded; GD rounds read the persisted
    // pair-token frame, so scans do NOT grow with iterations
    "n81_bt_reward_model",
    // skew-handling joins: detect-then-salt reads the table to find
    // hot keys before the salted join proper
    "q36_salted_join",
    // bucketed staging: the bucketed copy is WRITTEN then read — the
    // write's scan plus the two join sides
    "w05_asof_join_bucketed",
    // bucketed nearest as-of: two scans per input (the per-bucket
    // summary pass and the event pass) with the summary itself
    // persisted — merging the passes means caching the corpus-sized
    // inputs, which is the materialization that doesn't scale
    "w09_asof_nearest_bucketed",
    // same bucketedMarks machinery as w09 — the identical inherent
    // 2-scans-per-input profile over the forward direction
    "w10_asof_forward_bucketed",
    // same machinery again, marks carrying the value (interpolate)
    "w12_asof_interpolate_bucketed",
    // temperature mixture / snapshot merge: per-branch realization over
    // a D-row broadcast plan, branch count fixed by the mixture
    "n61_temperature_mixture",
    "n69_snapshot_merge",
    // three-stage curation composes gate + dedup + pack, each needing
    // its own corpus pass by contract
    "n58_curation_pipeline_v2")

  def main(args: Array[String]): Unit = {
    val write = args.contains("--write")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val registry = graft.queries.Registry.all.map(_.name).sorted

    val spark = GraftSession.build("graft-scan-guard")
    spark.sparkContext.setLogLevel("WARN")
    val profiles = try registry.map(ScanAudit.profile(spark, sfDir, _))
      finally spark.stop()

    if (write) {
      val body = profiles.map(p => s"""  "${p.name}": ${p.worst}""")
        .mkString(
          "{\n  \"_comment\": \"per-query worst per-table scan-node count " +
            "of the FINAL adaptive plan at sf0.001 (ScanAudit.profile: " +
            "ReusedExchange skipped, cache fill counted once per cached " +
            "relation). Regenerate with ScanGuard --write; entries >= 3 " +
            "must be on ScanGuard.inherent with PLANS.md reasoning.\",\n",
          ",\n", "\n}\n")
      Files.write(Paths.get(baselineFile), body.getBytes("UTF-8"))
      println(s"ScanGuard: wrote ${profiles.size} baselines to $baselineFile")
      profiles.filter(_.err.isDefined).foreach(p =>
        println(s"ScanGuard: WARNING ${p.name} errored: ${p.err.get}"))
      return
    }

    val baseline = BenchGuard.parseFlat(Files.readString(Paths.get(baselineFile)))
      .map { case (k, v) => k -> v.toInt }
    require(baseline.nonEmpty, s"$baselineFile parsed empty")

    val problems = Seq.newBuilder[String]
    (registry.toSet -- baseline.keySet).toSeq.sorted.foreach(n =>
      problems += s"registered query $n has no scan baseline — run ScanGuard --write")
    (baseline.keySet -- registry.toSet).toSeq.sorted.foreach(n =>
      problems += s"stale baseline $n — query no longer registered")
    val overThree = baseline.filter(_._2 >= 3).keySet
    (overThree -- inherent).toSeq.sorted.foreach(n =>
      problems += s"$n baseline >= 3 scans but not on the inherent whitelist")
    (inherent -- overThree).toSeq.sorted.foreach(n =>
      problems += s"stale inherent entry $n — its baseline is < 3 now")

    profiles.foreach { p =>
      p.err.foreach(e => problems += s"${p.name} ERRORED: $e")
      baseline.get(p.name).foreach { b =>
        if (p.err.isEmpty && p.worst > b)
          problems += s"${p.name} SCAN REGRESSION: worst ${p.worst} > " +
            s"baseline $b (new diamond? scans[${p.detail}])"
        else if (p.err.isEmpty && p.worst < b)
          println(s"ScanGuard: note ${p.name} improved to ${p.worst} " +
            s"(baseline $b) — ratchet opportunity")
      }
    }

    val out = problems.result()
    if (out.isEmpty)
      println(s"ScanGuard PASS: ${profiles.size} queries within scan baseline")
    else {
      out.foreach(p => println(s"ScanGuard FAIL: $p"))
      println(s"ScanGuard: ${out.size} problem(s)")
      sys.exit(1)
    }
  }
}
