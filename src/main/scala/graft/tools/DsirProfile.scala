package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** n59/n75/s19 residual decomposition: after the r17 scoring collapse
  * the training-side gram aggregation is the remaining cost. Suspect:
  * [[graft.operators.Sampling]]'s gramOccurrences references
  * `split(text, ' ')` from several sub-expressions of one projection
  * (concat arg, two size() guards, element_at inside the bigram
  * lambda), and Spark does not CSE across a generator boundary — the
  * split may re-run per lambda element (~110× per row). This times the
  * importance aggregation as shipped vs a variant that materializes
  * the token array in a prior projection, and the driver-collect +
  * threshold passes, 3 reps each in one JVM (read rep 2+).
  * Run: sbt "runMain graft.tools.DsirProfile [sfDir]"
  */
object DsirProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.build("graft-dsir-profile")
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables(s, dir).documents
    def timed(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      GraftSession.dropAllBlocks(s)
      val t0 = System.nanoTime()
      f
      println(f"DSIRPROFILE $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    timed("imp_shipped") {
      graft.operators.Sampling
        .dsirImportance(docs, col("lang") === "en").collect()
      ()
    }
    timed("imp_prebound") {
      val ts = split(col("text"), " ")
      val bound = docs.select(col("doc_id"),
        (col("lang") === "en").as("is_tgt"), ts.as("ts"))
      val occ = bound.select(col("doc_id"), col("is_tgt"),
        explode(concat(col("ts"),
          when(size(col("ts")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(col("ts")) - 2),
              i => concat_ws(" ", element_at(col("ts"), i + 1),
                element_at(col("ts"), i + 2))))))
          .as("g"))
      val gramStats = occ.groupBy("g").agg(
        count(lit(1)).as("raw_g"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_g"))
      val totals = gramStats.agg(
        sum(col("raw_g")).as("n_raw"), sum(col("tgt_g")).as("n_tgt"),
        count(lit(1)).as("v"))
      gramStats.crossJoin(broadcast(totals))
        .withColumn("num",
          lit(1000000L) * (col("tgt_g") + 1L) * (col("n_raw") + col("v")))
        .withColumn("den", (col("raw_g") + 1L) * (col("n_tgt") + col("v")))
        .select(col("g"), expr("num div den").as("imp_ppm"))
        .collect()
      ()
    }
    timed("score_rank") {
      val imp = graft.operators.Sampling.collectImportance(
        graft.operators.Sampling.dsirImportance(docs, col("lang") === "en"))
      graft.operators.GlobalOrder.withGlobalIndexCols(
        graft.operators.Sampling.dsirScoreModel(docs, imp),
        Seq(desc("score_ppm"), asc("doc_id"))).collect()
      ()
    }
    s.stop()
  }
}
