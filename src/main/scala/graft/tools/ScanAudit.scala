package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution scan-amplification audit: executes each named query
  * at the given SF through ITS OWN QueryExecution (executeCollect, so
  * AQE finalizes in place) and walks the FINAL physical tree counting
  * parquet scan NODES per table — skipping ReusedExchange subtrees
  * (shared, executed once) and counting each cached relation's FILL
  * scan exactly once (the first InMemoryTableScan of a given cache
  * walks the cached plan; later consumers don't re-scan). A table
  * scanned 3+ times in one query is an unmaterialized diamond — the
  * n110 defect class, invisible to every oracle compare.
  * Run: sbt "runMain graft.tools.ScanAudit <sfDir> [query ...]"
  * The enforced-gate form is [[ScanGuard]], which diffs these counts
  * against the committed scan_baseline.json.
  */
object ScanAudit {
  private def walk(
      p: SparkPlan,
      scans: scala.collection.mutable.Map[String, Int],
      caches: scala.collection.mutable.Set[String]): Unit = p match {
    case _: ReusedExchangeExec => ()
    case f: FileSourceScanExec =>
      val table = f.relation.location.rootPaths.headOption
        .map(_.getName).getOrElse("?")
      scans.updateWith(table) { c => Some(c.getOrElse(0) + 1) }
    case im: InMemoryTableScanExec =>
      // the cache FILL scans its input exactly once regardless of
      // consumer count — count it once per distinct cached relation.
      // The r11 version stopped here without walking the cached plan,
      // so a table read once through a cache plus twice directly
      // reported 2 and evaded the >=3 diamond flag (r12 ADVICE).
      val name = im.relation.cacheBuilder.cachedName
      if (!caches.contains(name)) {
        caches += name
        walk(im.relation.cachedPlan, scans, caches)
      }
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan, scans, caches)
    case s: QueryStageExec => walk(s.plan, scans, caches)
    case other =>
      other.children.foreach(walk(_, scans, caches))
      other.subqueries.foreach(walk(_, scans, caches))
  }

  /** One query's measured scan profile: per-table FINAL-plan scan-node
    * counts, the distinct caches it filled, or the error that stopped
    * it.
    */
  final case class Profile(
      name: String,
      scans: Map[String, Int],
      caches: Int,
      err: Option[String] = None) {
    def worst: Int = scans.values.maxOption.getOrElse(0)
    def detail: String = scans.toSeq.sortBy(-_._2)
      .map { case (t, c) => s"$t=$c" }.mkString(",")
  }

  /** Execute one registered query and profile its final adaptive plan.
    * Drops all cached blocks afterwards so profiles are independent.
    */
  def profile(spark: SparkSession, sfDir: String, name: String): Profile =
    try {
      val df = graft.queries.Registry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan.executeCollect()
      val scans = scala.collection.mutable.Map.empty[String, Int]
      val caches = scala.collection.mutable.Set.empty[String]
      walk(qe.executedPlan, scans, caches)
      GraftSession.dropAllBlocks(spark)
      Profile(name, scans.toMap, caches.size)
    } catch {
      case e: Throwable =>
        try GraftSession.dropAllBlocks(spark) catch { case _: Throwable => () }
        Profile(name, Map.empty, 0, Some(s"${e.getClass.getSimpleName}: ${
          String.valueOf(e.getMessage).take(60)}"))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.queries.Registry.all.map(_.name)
    val spark = GraftSession.build("graft-scan-audit")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val p = profile(spark, sfDir, name)
      p.err match {
        case Some(e) => println(s"SCANAUDIT $name ERROR $e")
        case None =>
          val flag = if (p.worst >= 3) "  <== DIAMOND?" else ""
          println(s"SCANAUDIT $name scans[${p.detail}] caches=${p.caches}$flag")
      }
    }
    spark.stop()
  }
}
