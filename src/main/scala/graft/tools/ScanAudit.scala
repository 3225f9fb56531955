package graft.tools

import graft.GraftSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution scan-amplification audit: executes each named query
  * at the given SF through ITS OWN QueryExecution (executeCollect, so
  * AQE finalizes in place) and walks the FINAL physical tree counting
  * parquet scan NODES per table — skipping ReusedExchange subtrees
  * (shared, executed once) and stopping at InMemoryTableScan (cache
  * fill scans once regardless of consumer count). A table scanned 3+
  * times in one query is an unmaterialized diamond — the n110 defect
  * class, invisible to every oracle compare.
  * Run: sbt "runMain graft.tools.ScanAudit <sfDir> [query ...]"
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
      caches += im.relation.cacheBuilder.cachedName
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan, scans, caches)
    case s: QueryStageExec => walk(s.plan, scans, caches)
    case other =>
      other.children.foreach(walk(_, scans, caches))
      other.subqueries.foreach(walk(_, scans, caches))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.queries.Registry.all.map(_.name)
    val spark = GraftSession.build("graft-scan-audit")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      try {
        val df = graft.queries.Registry.queries(name)(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan.executeCollect()
        val scans = scala.collection.mutable.Map.empty[String, Int]
        val caches = scala.collection.mutable.Set.empty[String]
        walk(qe.executedPlan, scans, caches)
        val worst = scans.values.maxOption.getOrElse(0)
        val detail = scans.toSeq.sortBy(-_._2)
          .map { case (t, c) => s"$t=$c" }.mkString(",")
        val flag = if (worst >= 3) "  <== DIAMOND?" else ""
        println(s"SCANAUDIT $name scans[$detail] caches=${caches.size}$flag")
        GraftSession.dropAllBlocks(spark)
      } catch {
        case e: Throwable =>
          println(s"SCANAUDIT $name ERROR ${e.getClass.getSimpleName}: ${
            String.valueOf(e.getMessage).take(60)}")
          try GraftSession.dropAllBlocks(spark) catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
