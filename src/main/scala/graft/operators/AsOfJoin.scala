package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the latest right row
  * with `right.ts <= left.ts` on the same key.
  *
  * Two implementations with identical results:
  *
  *   - [[perKey]]: one shuffle, a window per key ordered by time — the
  *     natural form when keys are plentiful and none is hot.
  *   - [[bucketed]]: the 100 TB form. Parallelism is keys × time-buckets
  *     instead of keys: rows partition by (key, ⌊ts/bucket⌋); each
  *     bucket resolves matches locally, and the only cross-bucket state
  *     is one "last right event per (key, bucket)" row, which is tiny,
  *     windowed per key (cheap — `buckets` rows per key, not events),
  *     and broadcast back. A hot key with a billion events spreads over
  *     its buckets instead of serializing through one task.
  */
object AsOfJoin {

  /** left: (key, ts, left_id); right: (key, ts, right_id).
    * Output: (left_id, key, right_id nullable).
    */
  def perKey(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("key"), col("ts"), col("left_id"),
      lit(null).cast("long").as("right_id"), lit(1).as("side"))
    val r = right.select(col("key"), col("ts"),
      lit(null).cast("long").as("left_id"), col("right_id"), lit(0).as("side"))
    // tie rule: among right rows sharing (key, ts), the max right_id wins —
    // ascending right_id puts it last, so last(ignoreNulls) picks it. This
    // matches bucketed()'s stage-1 pick (desc(right_id), rn = 1).
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("side"), col("right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.union(l)
      .withColumn("matched", last(col("right_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("left_id"), col("key"), col("matched").as("right_id"))
  }

  /** FORWARD as-of with a horizon — the LABEL join: for each left row,
    * the EARLIEST right row with `left.ts <= right.ts <= left.ts +
    * horizonSeconds` on the same key (ties at the minimal ts go to the
    * LOWEST right_id; no match within the horizon → NULL). This is how
    * a training pipeline attaches outcomes to events ("the next
    * purchase within 12 h of this view") — [[perKey]] run backward in
    * time: one union, one per-key window scanned in DESCENDING ts
    * order carrying the nearest future right row, then the horizon
    * applied as a stateless filter on the carried timestamp. Same
    * one-shuffle, key-parallel shape as [[perKey]]; a genuinely hot
    * key takes [[bucketedForward]], the keys × time-buckets form.
    *
    * left: (key, ts, left_id); right: (key, ts, right_id).
    * Output: (left_id, key, right_id nullable).
    */
  def forwardPerKey(
      left: DataFrame, right: DataFrame, horizonSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0, s"horizon must be >= 0, got $horizonSeconds")
    val nullMark =
      lit(null).cast("struct<rts:timestamp,right_id:bigint>")
    val l = left.select(col("key"), col("ts"), col("left_id"),
      nullMark.as("rmark"), lit(1).as("side"))
    val r = right.select(col("key"), col("ts"),
      lit(null).cast("long").as("left_id"),
      struct(col("ts").as("rts"), col("right_id")).as("rmark"),
      lit(0).as("side"))
    // reverse-time scan: rights at EQUAL ts come before the left row
    // (side 0 < 1 — "at-or-after" inclusive), and among rights sharing
    // (key, ts) the DESCENDING right_id order puts the minimum last, so
    // last(ignoreNulls) carries the earliest-then-lowest-id future row
    val w = Window.partitionBy(col("key"))
      .orderBy(desc("ts"), col("side"), desc("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.union(l)
      .withColumn("m", last(col("rmark"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("left_id"), col("key"),
        when(unix_micros(col("m.rts")) <=
            unix_micros(col("ts")) + horizonSeconds * 1000000L,
          col("m.right_id")).as("right_id"))
  }

  /** NEAREST as-of with a symmetric horizon — the sensor-fusion /
    * feature-alignment join (pandas `merge_asof(direction="nearest")`):
    * for each left row, the right row minimizing |right.ts − left.ts|
    * within ±`horizonSeconds` on the same key. Distance ties between
    * the two directions go BACKWARD (at-or-before — the causal side;
    * a right row at exactly left.ts is a 0-distance backward match),
    * and within a direction the family's established tie rules hold
    * ([[perKey]]: max right_id at equal ts; [[forwardPerKey]]: min).
    * `direction` names which side won (NULL = no match in the band) —
    * the column an alignment audit reads to see whether a feed is
    * systematically lagging its labels.
    *
    * Plan shape: ONE union, ONE shuffle on the key, TWO in-partition
    * window sorts (ascending carry of the latest past right, the
    * [[perKey]] scan; descending carry of the earliest future right,
    * the [[forwardPerKey]] scan) and a stateless per-row choice —
    * never a join against the right side. A hot key still pays two
    * whole-key in-partition sorts here; [[bucketedNearest]] is the
    * keys × time-buckets form that spreads those sorts over buckets.
    *
    * left: (key, ts, left_id); right: (key, ts, right_id).
    * Output: (left_id, key, right_id nullable, direction nullable).
    */
  def nearestPerKey(
      left: DataFrame, right: DataFrame, horizonSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0, s"horizon must be >= 0, got $horizonSeconds")
    val horizonUs = horizonSeconds * 1000000L
    val nullMark =
      lit(null).cast("struct<rts:timestamp,right_id:bigint>")
    val l = left.select(col("key"), col("ts"), col("left_id"),
      nullMark.as("rmark"), lit(1).as("side"))
    val r = right.select(col("key"), col("ts"),
      lit(null).cast("long").as("left_id"),
      struct(col("ts").as("rts"), col("right_id")).as("rmark"),
      lit(0).as("side"))
    val u = r.union(l)
    // backward scan (the perKey order): rights at equal ts precede the
    // left row, ascending right_id puts the max last under last()
    val wb = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("side"), col("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward scan (the forwardPerKey order): reverse time, descending
    // right_id puts the min last
    val wf = Window.partitionBy(col("key"))
      .orderBy(desc("ts"), col("side"), desc("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("bm", last(col("rmark"), ignoreNulls = true).over(wb))
      .withColumn("fm", last(col("rmark"), ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
      .withColumn("bdist",
        unix_micros(col("ts")) - unix_micros(col("bm.rts")))
      .withColumn("fdist",
        unix_micros(col("fm.rts")) - unix_micros(col("ts")))
      .withColumn("bok", col("bm").isNotNull && col("bdist") <= horizonUs)
      .withColumn("fok", col("fm").isNotNull && col("fdist") <= horizonUs)
      .withColumn("direction",
        when(col("bok") && (!col("fok") || col("bdist") <= col("fdist")),
          lit("backward"))
          .when(col("fok"), lit("forward")))
      .select(col("left_id"), col("key"),
        when(col("direction") === "backward", col("bm.right_id"))
          .when(col("direction") === "forward", col("fm.right_id"))
          .as("right_id"),
        col("direction"))
  }

  def bucketed(left: DataFrame, right: DataFrame, bucketSeconds: Long): DataFrame = {
    val bucket = (ts: org.apache.spark.sql.Column) =>
      floor(ts.cast("double") / bucketSeconds).cast("long")

    // stage 1: last right row per (key, bucket) — one small row per pair
    val rB = right.withColumn("bucket", bucket(col("ts")))
    val wLast = Window.partitionBy(col("key"), col("bucket"))
      .orderBy(desc("ts"), desc("right_id"))
    val lastPerBucket = rB
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("key"), col("bucket"), col("right_id").as("bucket_last"))

    // stage 2: carry = latest right id entering each bucket, per key —
    // windowed over the tiny per-(key,bucket) summary, not the events.
    // Left rows need the carry of their OWN bucket, including buckets
    // with no right rows, so carry is computed for every touched bucket.
    val lB = left.withColumn("bucket", bucket(col("ts")))
    val leftBuckets = lB.select("key", "bucket").distinct()
    val rightBuckets = lastPerBucket.select("key", "bucket")
    val allBuckets = leftBuckets.union(rightBuckets).distinct()
    val wFill = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketCarry = allBuckets
      .join(lastPerBucket, Seq("key", "bucket"), "left")
      // latest right id at the END of each bucket; shift by one bucket to
      // get the value entering the bucket
      .withColumn("eob", last(col("bucket_last"), ignoreNulls = true).over(wFill))
      .withColumn("carry_in", lag(col("eob"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("bucket"))))
      .select(col("key"), col("bucket"), col("carry_in"))

    // stage 3: resolve within each (key, bucket) partition — the window
    // only spans one bucket, so a hot key parallelizes across buckets
    val l = lB.select(col("key"), col("bucket"), col("ts"), col("left_id"),
      lit(null).cast("long").as("right_id"), lit(1).as("side"))
    val r = rB.select(col("key"), col("bucket"), col("ts"),
      lit(null).cast("long").as("left_id"), col("right_id"), lit(0).as("side"))
    // same tie rule as perKey: max right_id wins at equal (key, ts)
    val wLocal = Window.partitionBy(col("key"), col("bucket"))
      .orderBy(col("ts"), col("side"), col("right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.union(l)
      .withColumn("local_match", last(col("right_id"), ignoreNulls = true).over(wLocal))
      .filter(col("side") === 1)
      .join(bucketCarry, Seq("key", "bucket"), "left")
      .select(col("left_id"), col("key"),
        coalesce(col("local_match"), col("carry_in")).as("right_id"))
  }

  /** Linear time-interpolation join — the continuous completion of the
    * as-of family (pandas `interpolate` after `merge_asof` both ways):
    * for each left row, carry the latest right VALUE at-or-before and
    * the earliest at-or-after, and emit
    * `v = v_b + (v_f − v_b)·(t − t_b)/(t_f − t_b)` — with the
    * boundary modes a sensor-fusion pipeline needs spelled out:
    * `exact` (a right row at exactly t — value_interp takes the
    * BACKWARD mark's value; with multiple right rows at exactly t the
    * two marks are different rows under the tie rules, bm = max
    * right_id and fm = min right_id, so v_before may differ from
    * v_after — the mode guard keeps the 0/0 ratio out either way),
    * `hold` (only a past right: last-value-carried-forward),
    * `backfill` (only a future right), NULL mode when the key has no
    * rights at all. Within-ts ties follow the family rules
    * ([[perKey]] max right_id backward, [[forwardPerKey]] min
    * forward).
    *
    * Plan shape: [[nearestPerKey]]'s exactly — ONE union, ONE key
    * shuffle, TWO in-partition window carries over the same exchange,
    * then stateless per-row IEEE arithmetic (micros deltas cast to
    * double only at the final ratio, so the algebra replays
    * bit-identically in the oracle).
    *
    * left: (key, ts, left_id); right: (key, ts, right_id, value).
    * Output: (left_id, key, v_before, v_after, mode, value_interp).
    */
  def interpolatePerKey(left: DataFrame, right: DataFrame): DataFrame = {
    val nullMark = lit(null)
      .cast("struct<rts:timestamp,right_id:bigint,v:double>")
    val l = left.select(col("key"), col("ts"), col("left_id"),
      nullMark.as("rmark"), lit(1).as("side"))
    val r = right.select(col("key"), col("ts"),
      lit(null).cast("long").as("left_id"),
      struct(col("ts").as("rts"), col("right_id"),
        col("value").cast("double").as("v")).as("rmark"),
      lit(0).as("side"))
    val wb = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("side"), col("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("key"))
      .orderBy(desc("ts"), col("side"), desc("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = r.union(l)
      .withColumn("bm", last(col("rmark"), ignoreNulls = true).over(wb))
      .withColumn("fm", last(col("rmark"), ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
    interpolateFromMarks(marked)
  }

  /** The interpolation algebra over a (left_id, key, ts, bm, fm)
    * marked frame — ONE definition shared by [[interpolatePerKey]] and
    * [[bucketedInterpolate]], so the two paths cannot drift.
    */
  private def interpolateFromMarks(marked: DataFrame): DataFrame = {
    val tsu = unix_micros(col("ts"))
    val tbu = unix_micros(col("bm.rts"))
    val tfu = unix_micros(col("fm.rts"))
    val mode = when(col("bm").isNotNull && col("fm").isNotNull,
        when(tfu > tbu, lit("interp")).otherwise(lit("exact")))
      .when(col("bm").isNotNull, lit("hold"))
      .when(col("fm").isNotNull, lit("backfill"))
    val interp = col("bm.v") + (col("fm.v") - col("bm.v")) *
      ((tsu - tbu).cast("double") / (tfu - tbu).cast("double"))
    marked.select(col("left_id"), col("key"),
      col("bm.v").as("v_before"), col("fm.v").as("v_after"),
      mode.as("mode"),
      when(mode === "interp", interp)
        .when(mode === "exact" || mode === "hold", col("bm.v"))
        .when(mode === "backfill", col("fm.v"))
        .as("value_interp"))
  }

  /** [[interpolatePerKey]]'s hot-key scale path: identical results
    * (the marks now carry the value through [[bucketedMarks]]; the
    * algebra is the SAME [[interpolateFromMarks]]), keys × time-buckets
    * parallelism instead of two whole-key sorts — completing the
    * bucketed matrix across ALL four family members (backward /
    * forward / nearest / interpolate).
    */
  def bucketedInterpolate(left: DataFrame, right: DataFrame,
      bucketSeconds: Long): DataFrame =
    interpolateFromMarks(
      bucketedMarks(left, right, bucketSeconds, withValue = true))

  /** Both directional marks per left row, bucketed — the shared carry
    * machinery behind [[bucketedForward]] and [[bucketedNearest]]
    * (the forward/nearest analog of [[bucketed]]'s three stages,
    * closing the r13 gap where only BACKWARD had a hot-key path).
    *
    * Parallelism is keys × time-buckets: events partition by
    * (key, ⌊ts/bucket⌋); each bucket resolves its local backward and
    * forward candidates with two in-partition window scans (the
    * [[perKey]] ascending order and the [[forwardPerKey]] descending
    * order over the SAME exchange), and the only cross-bucket state is
    * one (last_mark, first_mark) summary row per (key, bucket) —
    * windowed per key over bucket summaries (buckets per key, not
    * events) in both directions on one tiny frame, then joined back.
    * A hot key with a billion events pays per-bucket sorts instead of
    * two whole-key sorts.
    *
    * Tie rules are the family's, preserved bucket-locally and in the
    * carries: backward = latest ts then MAX right_id (max(struct)),
    * forward = earliest ts then MIN right_id (min(struct)).
    *
    * Returns one row per left row: (left_id, key, ts, bm, fm) where
    * bm/fm are nullable struct<rts, right_id[, v]> marks with no
    * horizon applied — callers own the band filter. `withValue` adds
    * the right's `value` column as a trailing `v` field for
    * [[bucketedInterpolate]] — trailing, so the lexicographic
    * min/max tie order is untouched (right_id is unique per row; the
    * comparison never reaches v).
    */
  private def bucketedMarks(left: DataFrame, right: DataFrame,
      bucketSeconds: Long, withValue: Boolean = false): DataFrame = {
    require(bucketSeconds > 0, s"bucket must be > 0, got $bucketSeconds")
    val bucket = (ts: org.apache.spark.sql.Column) =>
      floor(ts.cast("double") / bucketSeconds).cast("long")
    val mark =
      if (withValue)
        struct(col("ts").as("rts"), col("right_id"),
          col("value").cast("double").as("v"))
      else struct(col("ts").as("rts"), col("right_id"))
    val nullMark = lit(null).cast(
      if (withValue) "struct<rts:timestamp,right_id:bigint,v:double>"
      else "struct<rts:timestamp,right_id:bigint>")

    // stage 1: one summary row per (key, bucket) — lexicographic
    // struct min/max encode the family tie rules exactly
    val rB = right.withColumn("bucket", bucket(col("ts")))
    // persisted: summary feeds BOTH the carry windows and the
    // allBuckets union — unpersisted it recomputes, re-scanning the
    // right input (ScanAudit read 5 scans; the summary is
    // buckets-per-key-sized, so the persist is model-sized, never
    // corpus-sized). The remaining 2-scans-per-input (one structure
    // pass, one event pass) are inherent: caching the corpus-sized
    // inputs to merge them is exactly what doesn't scale.
    val summary = rB.groupBy(col("key"), col("bucket"))
      .agg(max(mark).as("last_mark"), min(mark).as("first_mark"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 2: carries for every TOUCHED bucket (lefts included — a
    // left in a right-free bucket still needs both carries), both
    // directions windowed on the one summary-sized frame. Absent
    // buckets hold no rights, so lag over present buckets is exact.
    val lB = left.withColumn("bucket", bucket(col("ts")))
    val allBuckets = lB.select("key", "bucket")
      .union(summary.select("key", "bucket")).distinct()
    val asc = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc0 = Window.partitionBy(col("key")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = allBuckets
      .join(summary, Seq("key", "bucket"), "left")
      // latest right mark at end-of-bucket, shifted one bucket forward
      .withColumn("eob", last(col("last_mark"), ignoreNulls = true).over(asc))
      .withColumn("carry_b", lag(col("eob"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("bucket"))))
      // earliest right mark at-or-after bucket start, shifted one back
      .withColumn("fob", last(col("first_mark"), ignoreNulls = true).over(desc0))
      .withColumn("carry_f", lag(col("fob"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("bucket").desc)))
      .select(col("key"), col("bucket"), col("carry_b"), col("carry_f"))

    // stage 3: local resolution within each (key, bucket) partition —
    // two window scans over ONE exchange, then the tiny carry join
    val l = lB.select(col("key"), col("bucket"), col("ts"), col("left_id"),
      nullMark.as("rmark"), lit(1).as("side"))
    val r = rB.select(col("key"), col("bucket"), col("ts"),
      lit(null).cast("long").as("left_id"), mark.as("rmark"),
      lit(0).as("side"))
    val wb = Window.partitionBy(col("key"), col("bucket"))
      .orderBy(col("ts"), col("side"), col("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("key"), col("bucket"))
      .orderBy(desc("ts"), col("side"), desc("rmark.right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marks = r.union(l)
      .withColumn("local_b", last(col("rmark"), ignoreNulls = true).over(wb))
      .withColumn("local_f", last(col("rmark"), ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
      .join(carries, Seq("key", "bucket"), "left")
      .select(col("left_id"), col("key"), col("ts"),
        coalesce(col("local_b"), col("carry_b")).as("bm"),
        coalesce(col("local_f"), col("carry_f")).as("fm"))
    graft.DiamondCaches.register(summary, marks)
  }

  /** [[forwardPerKey]]'s hot-key scale path: identical results
    * (AsOfJoinSpec pins equality on edge fixtures and random rounds),
    * keys × time-buckets parallelism via [[bucketedMarks]].
    */
  def bucketedForward(left: DataFrame, right: DataFrame,
      horizonSeconds: Long, bucketSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0, s"horizon must be >= 0, got $horizonSeconds")
    bucketedMarks(left, right, bucketSeconds)
      .select(col("left_id"), col("key"),
        when(unix_micros(col("fm.rts")) <=
            unix_micros(col("ts")) + horizonSeconds * 1000000L,
          col("fm.right_id")).as("right_id"))
  }

  /** [[nearestPerKey]]'s hot-key scale path: identical results and the
    * identical stateless choice (distance ties backward, within-side
    * family tie rules), over [[bucketedMarks]] instead of two
    * whole-key window sorts.
    */
  def bucketedNearest(left: DataFrame, right: DataFrame,
      horizonSeconds: Long, bucketSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0, s"horizon must be >= 0, got $horizonSeconds")
    val horizonUs = horizonSeconds * 1000000L
    bucketedMarks(left, right, bucketSeconds)
      .withColumn("bdist",
        unix_micros(col("ts")) - unix_micros(col("bm.rts")))
      .withColumn("fdist",
        unix_micros(col("fm.rts")) - unix_micros(col("ts")))
      .withColumn("bok", col("bm").isNotNull && col("bdist") <= horizonUs)
      .withColumn("fok", col("fm").isNotNull && col("fdist") <= horizonUs)
      .withColumn("direction",
        when(col("bok") && (!col("fok") || col("bdist") <= col("fdist")),
          lit("backward"))
          .when(col("fok"), lit("forward")))
      .select(col("left_id"), col("key"),
        when(col("direction") === "backward", col("bm.right_id"))
          .when(col("direction") === "forward", col("fm.right_id"))
          .as("right_id"),
        col("direction"))
  }
}
