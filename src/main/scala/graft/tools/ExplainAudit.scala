package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Prints the formatted physical plan for the named queries (or a
  * default audit set) so scan pruning (`ReadSchema`), predicate pushdown
  * (`PushedFilters`), join strategy (Broadcast vs SortMerge) and
  * whole-stage-codegen coverage can be eyeballed per query.
  * Run: sbt "runMain graft.tools.ExplainAudit [sfDir] [query ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q02_join_agg", "q03_multi_join",
        "c02_filter", "w01_tumbling_window", "n03_dedup_minhash_lsh",
        "n27_dup_ngram_coverage", "n31_semdedup", "q36_salted_join")
    val spark = GraftSession.build("graft-explain")
    names.foreach { name =>
      println(s"\n=== $name ===")
      Registry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
