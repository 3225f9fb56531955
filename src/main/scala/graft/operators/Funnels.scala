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
    * Scale shape: ONE events scan (step types filtered and mapped to
    * integer indices scan-stage, so only `(user_id, step_i, ts)` ever
    * shuffles) → repartition by user + `sortWithinPartitions(user, ts)`
    * → ONE streaming per-user pass in O(steps) memory. The earlier
    * form aggregated per-user `collect_list` timestamp arrays — state
    * bounded only by a user's per-type event count, which is exactly
    * the bound that fails adversarially on the events table's natural
    * skew key (one bot user with 10⁷ views = a 10⁷-element aggregation
    * buffer in a single task; the r15 verdict's named scale-killer).
    * The ts-ordered greedy frontier is equivalent to the chained
    * strictly-after MIN selections: tᵢ₋₁ is fixed at the first step-
    * (i−1) event that qualifies, every step-i event with ts > tᵢ₋₁
    * sorts after it, and the FIRST one scanned is the minimum —
    * same-ts ties never qualify under strict `>` regardless of their
    * order within the sort. The step table comes out of a single
    * one-row aggregate through an explode; no joins at all. Step
    * conversions guard their divisions with explicit null-on-zero
    * (Spark's non-ANSI Divide nulls where DuckDB's IEEE doubles NaN;
    * the oracle carries the same CASE WHEN).
    */
  def orderedFunnel(events: DataFrame, steps: Seq[String]): DataFrame =
    funnelFromSlim(slimSteps(events, steps), steps)

  /** The funnel's scan-stage half: filter to the step types, map each
    * to its integer index, project `(user_id, step_i, ts)`. Stateless
    * per-row work — streaming-legal as-is (the s42 passthrough class),
    * and the only part of the funnel that MUST see rows one at a time;
    * the strictly-after chaining is order-sensitive, so it cannot hold
    * exact bounded streaming state under late/out-of-order arrivals (a
    * late earlier first-step event re-admits candidates a frontier
    * would have discarded). The streaming face (s45) therefore runs
    * THIS half on the stream and [[funnelFromSlim]] batch-side over
    * the collapsed sink — the s37/s39 shared-half convention.
    */
  def slimSteps(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got $steps")
    val stepIdxCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (step, i)) =>
        when(col("event_type") === step, lit(i)).otherwise(acc)
    }
    events
      .select(col("user_id").cast("long").as("user_id"),
        stepIdxCol.as("step_i"), col("ts"))
      // null ts never qualifies (the collect_list form skipped nulls);
      // a null user_id groups as one pseudo-user, as groupBy did
      .filter(col("step_i") >= 0 && col("ts").isNotNull)
  }

  /** The funnel's report half over a [[slimSteps]]-shaped frame. */
  def funnelFromSlim(slim: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need >= 2 funnel steps, got $steps")
    val spark = slim.sparkSession
    import spark.implicits._
    val nSteps = steps.size
    val depths = slim
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .as[(Option[Long], Int, java.sql.Timestamp)]
      .mapPartitions(it => Funnels.frontierDepths(it, nSteps))
      .toDF("depth")
    // depth-0 rows stay: they contribute 0 to every step sum, and on a
    // corpus where NO user completes step 0 they keep the ungrouped agg
    // non-empty so n_users reads 0, matching the oracle's per-user
    // CASE sums. The coalesce covers the fully-empty frame (no
    // step-typed events at all) the same way — the oracle mirrors it
    // (r16 ADVICE: the old depth >= 1 filter NULLed both cases).
    val aggs = steps.indices.map(i =>
      coalesce(sum(when(col("depth") >= i + 1, 1L).otherwise(0L)), lit(0L))
        .as(s"n${i + 1}"))
    val wide = depths.agg(aggs.head, aggs.tail: _*)
    def safeDiv(num: Column, den: Column): Column =
      when(den === 0 || den.isNull, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"n${i + 1}").as("n_users"),
        (if (i == 0) lit(null).cast("double")
         else safeDiv(col(s"n${i + 1}"), col(s"n$i")))
          .as("conv_from_prev"),
        safeDiv(col(s"n${i + 1}"), col("n1")).as("conv_from_first"))
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
    *
    * Cache lifetime: the activity frame stays persisted for the life
    * of the returned (lazy) plan; long-lived callers must run
    * `GraftSession.dropAllBlocks` between queries, as Bench/Verify do.
    */
  def cohortRetention(events: DataFrame): DataFrame =
    cohortRetentionFromDays(
      events.select(col("user_id"), to_date(col("ts")).as("day")).distinct())

  /** The retention matrix's report half over a distinct
    * (user_id, day) activity frame — SHARED by the n153 batch card and
    * the s47 streaming face (the s37/s39 shared-report-half rule: one
    * definition of cohorts, offsets, and rates, so the two can never
    * drift apart). The input frame must already be distinct per
    * (user, day); it is persisted here because first-seen, the
    * join-back, and cohort sizes all reuse it (the jaccardPairs
    * diamond rule).
    */
  def cohortRetentionFromDays(daysIn: DataFrame): DataFrame = {
    val days = daysIn.persist(StorageLevel.MEMORY_AND_DISK)
    val cohorts = days.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_cohort"))
    val report = days.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention_rate"))
    graft.DiamondCaches.register(days, report)
  }

  /** The funnel's per-partition greedy frontier pass, exposed as a
    * pure iterator→iterator function so adversarial layouts are
    * property-testable (FunnelFrontierCheck: user boundaries at
    * partition edges, same-ts ties at every step, single-event users,
    * empty partitions). CONTRACT: rows arrive contiguous per user and
    * ts-ascending within each user — [[funnelFromSlim]] guarantees
    * this with repartition(user) + sortWithinPartitions(user, ts).
    * Emits the funnel depth reached by each user, one Int per user
    * group, holding O(nSteps) state: one frontier Timestamp per step.
    * Step i advances the frontier iff it is the NEXT expected step and
    * its ts is STRICTLY after the previous step's frontier time
    * (re-ordered journeys and ties do not convert).
    */
  private[graft] def frontierDepths(
      it: Iterator[(Option[Long], Int, java.sql.Timestamp)],
      nSteps: Int): Iterator[Int] =
    new Iterator[Int] {
      private var pending = -1
      private var hasUser = false
      private var curUser: Option[Long] = None
      private var depth = 0
      private val t = Array.ofDim[java.sql.Timestamp](nSteps)
      private def advance(): Unit = {
        while (pending < 0 && it.hasNext) {
          val (u, i, ts) = it.next()
          if (!hasUser) { hasUser = true; curUser = u }
          else if (u != curUser) { pending = depth; curUser = u; depth = 0 }
          if (i == depth && depth < nSteps &&
              (depth == 0 || ts.compareTo(t(depth - 1)) > 0)) {
            t(depth) = ts
            depth += 1
          }
        }
        if (pending < 0 && hasUser) { pending = depth; hasUser = false }
      }
      def hasNext: Boolean = { advance(); pending >= 0 }
      def next(): Int = {
        advance(); val d = pending; pending = -1; d
      }
    }
}
