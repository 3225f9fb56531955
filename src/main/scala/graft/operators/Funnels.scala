package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Classic event-stream product analytics over the events table — the
  * ordered funnel and the cohort-retention matrix. These are the
  * batch report faces of the streaming funnel joins (s06/s10 chain
  * view → click → purchase continuously; these cards price the SAME
  * journey corpus-wide), kept exact: step times are MIN selections
  * under strict ordering, every count is an exact integer, and rates
  * divide after the counts.
  */
object Funnels {

  /** Strict-order funnel: per user, t₁ = earliest `steps(0)` event,
    * tᵢ = earliest `steps(i)` event STRICTLY after tᵢ₋₁ (re-ordering a
    * journey does not count — the property the naive "has all the
    * types" query gets wrong). Output one row per step: users reaching
    * it, conversion from the previous step (null at the top), and
    * conversion from the top.
    *
    * Scale shape: ONE events scan → ONE user-keyed aggregation that
    * collects each step type's timestamps per user (arrays bounded by
    * that user's per-type event count — the w03 sessionization state
    * bound); the chained strictly-after MIN selections are per-row
    * array arithmetic; the step table comes out of a single one-row
    * aggregate through an explode, so nothing in the plan executes
    * twice. No joins at all.
    */
  def orderedFunnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got $steps")
    val tsCols = steps.zipWithIndex.map { case (step, i) =>
      collect_list(when(col("event_type") === step, col("ts")))
        .as(s"ts_$i")
    }
    val perUser = events
      .groupBy("user_id")
      .agg(tsCols.head, tsCols.tail: _*)
    // t_0 = min(ts_0); t_i = min(ts_i strictly after t_{i-1})
    val withTimes = steps.indices.foldLeft(perUser) { (df, i) =>
      val t =
        if (i == 0) array_min(col("ts_0"))
        else array_min(filter(col(s"ts_$i"), x => x > col(s"t${i - 1}")))
      df.withColumn(s"t$i", t)
    }
    val aggs = steps.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"n${i + 1}"))
    val wide = withTimes.agg(aggs.head, aggs.tail: _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"n${i + 1}").as("n_users"),
        (if (i == 0) lit(null).cast("double")
         else col(s"n${i + 1}").cast("double") / col(s"n$i").cast("double"))
          .as("conv_from_prev"),
        (col(s"n${i + 1}").cast("double") / col("n1").cast("double"))
          .as("conv_from_first"))
    }
    wide.select(explode(array(stepRows: _*)).as("r")).select(col("r.*"))
  }

  /** Cohort-retention matrix: users cohort by their FIRST-seen day;
    * each (cohort_day, day_offset) cell counts the cohort's users
    * active that day. The n_cohort column repeats the cohort's size
    * (its offset-0 cell by construction) so the rate reads in place.
    *
    * Scale shape: events scan ONCE into a persisted distinct
    * (user, day) activity frame (the jaccardPairs diamond rule —
    * first-seen, the join-back, and cohort sizes all reuse it);
    * first-seen is a user-keyed MIN agg; the matrix agg is
    * cohorts × offsets cells; sizes broadcast. Nothing is event².
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      to_date(col("ts")).as("day")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cohorts = days.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_cohort"))
    days.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention_rate"))
  }
}
