package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY §2.3 `windowByEventTime` / ADR-0006) in
  * its batch form: the same `window()` / `session_window()` expressions
  * Structured Streaming uses, minus the watermark (the streaming variant
  * with watermark-driven emission lives in graft.streaming and is
  * verified by ScalaTest, since its closure rule isn't SQL-expressible).
  * Window starts are emitted as epoch seconds so the oracle compare is
  * timezone- and precision-proof.
  */
object TimeWindows extends QueryGroup {
  import Sql._

  /** Tumbling event-time windows (reference `windowByEventTime`,
    * Node.scala:315-356: assign to [⌊ts/size⌋·size, +size)).
    */
  private val tumbling = Q(
    "w01_tumbling_window",
    "1-hour tumbling event-time windows per event_type",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          unix_timestamp(col("w.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },
    Some(s"""SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""))

  /** Sliding windows: 10-minute window, 5-minute slide — every event
    * lands in exactly 2 windows; the oracle replicates the assignment by
    * cross-joining the two candidate starts.
    */
  private val sliding = Q(
    "w02_sliding_window",
    "10-min windows sliding every 5 min",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("w_start"), col("n"),
          col("sum_value"))
        .orderBy("w_start")
    },
    Some(s"""SELECT w_start, COUNT(*) AS n, ${oSum("value")} AS sum_value
             FROM (SELECT CAST(floor(epoch(ts) / 300) * 300 - off AS BIGINT) AS w_start,
                          value
                   FROM events CROSS JOIN (SELECT unnest([0, 300]) AS off))
             GROUP BY w_start ORDER BY w_start"""))

  /** Session windows: per-user sessions with a 1-hour inactivity gap.
    * Spark `session_window` opens a new session when the gap since the
    * previous event is >= the gap duration; the oracle reproduces that
    * with lag + running sum of session-break flags.
    */
  private val session = Q(
    "w03_session_window",
    "per-user session windows, 1-hour gap",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },
    Some(s"""WITH flagged AS (
               SELECT user_id, ts, event_id, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
               FROM events),
             sessions AS (
               SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM flagged)
             SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n, ${oSum("value")} AS sum_value
             FROM sessions GROUP BY user_id, sid
             ORDER BY user_id, session_start"""))

  /** As-of join — for each click, the most recent view at-or-before it by
    * the same user. Spark lacks a built-in; rather than a per-key
    * cartesian (quadratic at 100 TB), this is the scalable union trick:
    * tag both sides, sort once per user partition, and carry the latest
    * view id forward with `last(ignoreNulls)` — one shuffle, linear work,
    * same shape streaming uses for stream-stream point-in-time joins.
    */
  private val asofJoin = Q(
    "w04_asof_join",
    "point-in-time (as-of) join: click → latest view at-or-before, per user",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"),
          lit(null).cast("long").as("click_id"),
          lit(0).as("side"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          lit(null).cast("long").as("view_id"),
          col("event_id").as("click_id"),
          lit(1).as("side"))
      // views sort before clicks at equal ts => "at-or-before" inclusive;
      // view_id breaks (user, ts) ties deterministically (max view wins)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("view_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.union(clicks)
        .withColumn("matched_view", last(col("view_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("click_id"), col("user_id"), col("matched_view").as("view_id"))
        .orderBy("click_id")
    },
    Some("""SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
            ORDER BY click_id"""))

  /** Same as-of semantics through the bucketed scale path
    * (graft.operators.AsOfJoin.bucketed: keys × time-buckets
    * parallelism) — identical oracle to w04 by construction.
    */
  private val asofBucketed = Q(
    "w05_asof_join_bucketed",
    "as-of join via the bucketed scale path (hot keys spread over buckets)",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"))
      graft.operators.AsOfJoin.bucketed(left, right, 3600L)
        .select(col("left_id").as("click_id"), col("key").as("user_id"),
          col("right_id").as("view_id"))
        .orderBy("click_id")
    },
    Some("""SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
            ORDER BY click_id"""))

  /** In-band punctuated watermarks (reference `WatermarkPipe` +
    * `EventTimeWindowPipe`, Node.scala:289-340) as a driver-checked
    * query — the protocol SURVEY §7.4.2 previously mapped to query-level
    * `withWatermark` as a documented divergence, now run natively by
    * [[graft.streaming.PunctuatedWatermarks]]: each user's event stream
    * (ordered by ts, event_id; timestamps in epoch MICROS — the
    * operator's time unit is caller-defined) is punctuated every 50
    * records and windowed into hours under the reference's exact
    * emission rules. Because each keyed stream is ordered by ts, the
    * oracle replays the protocol relationally: punctuation k carries
    * the ts of record rank min(50k, total); a window is emitted iff a
    * punctuation passed its end, stamped with the FIRST such
    * punctuation's watermark; open windows never flush. No late drops
    * or regressions are possible on an ordered stream — those paths are
    * pinned by PunctuatedWatermarkSpec's golden fixtures instead.
    */
  private val punctuated = Q(
    "w06_punctuated_windows",
    "in-band punctuated watermarks: per-user hourly windows, reference rules",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables(s, dir).events
        .select(col("user_id").as("key"), col("value"),
          unix_micros(col("ts")).as("ts"), col("event_id"))
      val timed = graft.streaming.PunctuatedWatermarks
        .punctuateByKey(ev, 50, "event_id")
      graft.streaming.PunctuatedWatermarks
        .windowsPerKey(timed, 3600L * 1000000L)
        .toDF()
        .select(col("key").as("user_id"),
          col("startMs").as("w_start_us"),
          size(col("values")).cast("long").as("n"),
          aggregate(col("values"), lit(0.0).cast(DecimalType(28, 6)),
            (a, x) => (a + x.cast(DecimalType(28, 6)))
              .cast(DecimalType(28, 6)))
            .cast("double").as("sum_value"),
          col("wmMs").as("wm_us"))
        .orderBy("user_id", "w_start_us")
    },
    Some(s"""WITH r AS (
               SELECT user_id, value, epoch_us(ts) AS tsu,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS total
               FROM events),
             punct AS (
               SELECT user_id, tsu AS wm FROM r
               WHERE rn % 50 = 0 OR rn = total),
             win AS (
               SELECT user_id,
                 CAST(floor(tsu / 3600000000) * 3600000000 AS BIGINT)
                   AS w_start_us,
                 COUNT(*) AS n, ${oSum("value")} AS sum_value
               FROM r GROUP BY 1, 2),
             stamped AS (
               SELECT w.user_id, w.w_start_us, w.n, w.sum_value,
                 (SELECT MIN(p.wm) FROM punct p
                  WHERE p.user_id = w.user_id
                    AND p.wm >= w.w_start_us + 3600000000) AS wm_us
               FROM win w)
             SELECT user_id, w_start_us, n, sum_value, wm_us
             FROM stamped WHERE wm_us IS NOT NULL
             ORDER BY user_id, w_start_us"""))

  /** FORWARD as-of with a horizon — the label join a training pipeline
    * runs to attach outcomes to events: each view gets the NEXT
    * purchase by the same user within 12 h (earliest ts, then lowest
    * event_id; none in the horizon → NULL). The operator is w04's
    * union+window trick scanned in reverse time order
    * ([[graft.operators.AsOfJoin.forwardPerKey]]); the oracle is a
    * correlated scalar subquery with the same total tie order.
    */
  private val asofForward = Q(
    "w07_asof_forward_label",
    "forward as-of label join: view -> next purchase within 12h, per user",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"))
      graft.operators.AsOfJoin.forwardPerKey(left, right, 12L * 3600L)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("right_id").as("purchase_id"))
        .orderBy("view_id")
    },
    Some("""SELECT v.event_id AS view_id, v.user_id,
              (SELECT p.event_id FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND p.ts >= v.ts
                 AND p.ts <= v.ts + INTERVAL 12 HOUR
               ORDER BY p.ts, p.event_id LIMIT 1) AS purchase_id
            FROM events v WHERE v.event_type = 'view'
            ORDER BY view_id"""))

  /** NEAREST as-of within ±2 h: the alignment join completing the
    * family (w04 backward, w07 forward) — per view, the purchase
    * closest in time either direction, distance ties to the causal
    * (backward) side; the direction column rides the oracle so the
    * tie logic itself is hash-checked.
    */
  private val asofNearest = Q(
    "w08_asof_nearest",
    "nearest as-of join: view -> closest purchase within +-2h, ties backward, direction under the oracle",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"))
      graft.operators.AsOfJoin.nearestPerKey(left, right, 2L * 3600L)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("right_id").as("purchase_id"), col("direction"))
        .orderBy("view_id")
    },
    Some("""SELECT v.event_id AS view_id, v.user_id,
              (SELECT p.event_id FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 7200000000
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
                 (p.ts > v.ts) ASC,
                 CASE WHEN p.ts <= v.ts THEN -p.event_id
                      ELSE p.event_id END ASC
               LIMIT 1) AS purchase_id,
              (SELECT CASE WHEN p.ts <= v.ts THEN 'backward'
                           ELSE 'forward' END
               FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 7200000000
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
                 (p.ts > v.ts) ASC,
                 CASE WHEN p.ts <= v.ts THEN -p.event_id
                      ELSE p.event_id END ASC
               LIMIT 1) AS direction
            FROM events v WHERE v.event_type = 'view'
            ORDER BY view_id"""))

  /** The nearest as-of HOT-KEY scale path under the SAME oracle as
    * w08: [[graft.operators.AsOfJoin.bucketedNearest]] partitions by
    * (key, hour-bucket) instead of two whole-key sorts, and must
    * produce byte-identical results — including the direction column's
    * full tie order — against the correlated-subquery oracle. w05 is
    * the backward family's same receipt; this closes the r13 gap
    * where forward/nearest merely CLAIMED the bucketed path applies.
    */
  private val asofNearestBucketed = Q(
    "w09_asof_nearest_bucketed",
    "bucketed nearest as-of (keys x time-buckets scale path), same oracle as w08",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"))
      graft.operators.AsOfJoin
        .bucketedNearest(left, right, 2L * 3600L, 3600L)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("right_id").as("purchase_id"), col("direction"))
        .orderBy("view_id")
    },
    Some("""SELECT v.event_id AS view_id, v.user_id,
              (SELECT p.event_id FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 7200000000
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
                 (p.ts > v.ts) ASC,
                 CASE WHEN p.ts <= v.ts THEN -p.event_id
                      ELSE p.event_id END ASC
               LIMIT 1) AS purchase_id,
              (SELECT CASE WHEN p.ts <= v.ts THEN 'backward'
                           ELSE 'forward' END
               FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 7200000000
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
                 (p.ts > v.ts) ASC,
                 CASE WHEN p.ts <= v.ts THEN -p.event_id
                      ELSE p.event_id END ASC
               LIMIT 1) AS direction
            FROM events v WHERE v.event_type = 'view'
            ORDER BY view_id"""))

  /** The forward as-of HOT-KEY scale path under the SAME oracle as
    * w07 — completing the direction × path matrix (backward w04/w05,
    * forward w07/here, nearest w08/w09): [[graft.operators.AsOfJoin
    * .bucketedForward]] resolves per (key, hour-bucket) with one
    * reverse carry frame, and must produce byte-identical labels
    * against the correlated-subquery oracle.
    */
  private val asofForwardBucketed = Q(
    "w10_asof_forward_bucketed",
    "bucketed forward as-of (keys x time-buckets scale path), same oracle as w07",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"))
      graft.operators.AsOfJoin
        .bucketedForward(left, right, 12L * 3600L, 3600L)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("right_id").as("purchase_id"))
        .orderBy("view_id")
    },
    Some("""SELECT v.event_id AS view_id, v.user_id,
              (SELECT p.event_id FROM events p
               WHERE p.event_type = 'purchase'
                 AND p.user_id = v.user_id
                 AND p.ts >= v.ts
                 AND p.ts <= v.ts + INTERVAL 12 HOUR
               ORDER BY p.ts, p.event_id LIMIT 1) AS purchase_id
            FROM events v WHERE v.event_type = 'view'
            ORDER BY view_id"""))

  /** Linear interpolation join: per view, the purchase VALUE
    * interpolated at the view's timestamp from the latest
    * at-or-before and earliest at-or-after purchases — with the
    * `exact`/`hold`/`backfill` boundary modes under the oracle (four
    * correlated subqueries replay the two carries; the interpolation
    * algebra is micros-exact integers divided once at the end).
    */
  private val asofInterpolate = Q(
    "w11_asof_interpolate",
    "time-interpolation join: purchase value linearly interpolated at each view's timestamp, boundary modes exact/hold/backfill",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"), col("value"))
      graft.operators.AsOfJoin.interpolatePerKey(left, right)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("v_before"), col("v_after"), col("mode"),
          col("value_interp"))
        .orderBy("view_id")
    },
    Some("""WITH v AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view'),
            b AS (
              SELECT v.event_id,
                (SELECT p.value FROM events p
                 WHERE p.event_type = 'purchase'
                   AND p.user_id = v.user_id AND p.ts <= v.ts
                 ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS vb,
                (SELECT epoch_us(p.ts) FROM events p
                 WHERE p.event_type = 'purchase'
                   AND p.user_id = v.user_id AND p.ts <= v.ts
                 ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS tb,
                (SELECT p.value FROM events p
                 WHERE p.event_type = 'purchase'
                   AND p.user_id = v.user_id AND p.ts >= v.ts
                 ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS vf,
                (SELECT epoch_us(p.ts) FROM events p
                 WHERE p.event_type = 'purchase'
                   AND p.user_id = v.user_id AND p.ts >= v.ts
                 ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS tf
              FROM v)
            SELECT v.event_id AS view_id, v.user_id,
              vb AS v_before, vf AS v_after,
              CASE
                WHEN tb IS NOT NULL AND tf IS NOT NULL AND tf > tb
                  THEN 'interp'
                WHEN tb IS NOT NULL AND tf IS NOT NULL THEN 'exact'
                WHEN tb IS NOT NULL THEN 'hold'
                WHEN tf IS NOT NULL THEN 'backfill'
              END AS mode,
              CASE
                WHEN tb IS NOT NULL AND tf IS NOT NULL AND tf > tb
                  THEN vb + (vf - vb) *
                    (CAST(epoch_us(v.ts) - tb AS DOUBLE)
                     / CAST(tf - tb AS DOUBLE))
                WHEN tb IS NOT NULL THEN vb
                WHEN tf IS NOT NULL THEN vf
              END AS value_interp
            FROM v JOIN b USING (event_id)
            ORDER BY view_id"""))

  /** w11's hot-key scale path under the SAME oracle: the marks carry
    * the value through the shared bucketed machinery, the algebra is
    * the same shared definition — byte-identical output required,
    * modes included. Completes the bucketed matrix across all four
    * as-of members (w05/w10/w09/here).
    */
  private val asofInterpolateBucketed = Q(
    "w12_asof_interpolate_bucketed",
    "bucketed time-interpolation join (keys x time-buckets scale path), same oracle as w11",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val left = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("left_id"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("right_id"), col("value"))
      graft.operators.AsOfJoin.bucketedInterpolate(left, right, 3600L)
        .select(col("left_id").as("view_id"), col("key").as("user_id"),
          col("v_before"), col("v_after"), col("mode"),
          col("value_interp"))
        .orderBy("view_id")
    },
    asofInterpolate.oracle)

  /** OHLC downsampling — the canonical time-series bar aggregation
    * (every metrics/market engine ships it): per (hour, event_type),
    * the first and last value by event time plus high/low/volume.
    * Open/close are SELECTIONS — min/max over (ts, event_id, value)
    * structs, field-lexicographic, so the per-bucket argmin/argmax is
    * order-free and exact (event_id breaks ts ties); high/low are
    * plain min/max; volume is the decimal-exact sum. One hash agg
    * with map-side partials — bars, not events, cross the shuffle.
    */
  /** The w13 oracle, shared verbatim with the s46 streaming OHLC face
    * (the s37/s39 shared-report-half rule).
    */
  private[queries] lazy val ohlcOracleSql: String =
    s"""WITH b AS (
              SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
                  AS w_start,
                event_type, ts, event_id, value
              FROM events),
            r AS (
              SELECT w_start, event_type, value,
                row_number() OVER (PARTITION BY w_start, event_type
                  ORDER BY ts, event_id) AS ra,
                row_number() OVER (PARTITION BY w_start, event_type
                  ORDER BY ts DESC, event_id DESC) AS rd
              FROM b)
            SELECT w_start, event_type,
              MIN(CASE WHEN ra = 1 THEN value END) AS open,
              MAX(value) AS high, MIN(value) AS low,
              MIN(CASE WHEN rd = 1 THEN value END) AS close,
              CAST(COUNT(*) AS BIGINT) AS n,
              ${oSum("value")} AS volume
            FROM r GROUP BY w_start, event_type
            ORDER BY w_start, event_type"""

  private val ohlc = Q(
    "w13_ohlc_bars",
    "hourly OHLC bars per event_type: open/high/low/close by event time + count and exact volume",
    (s, dir) => Tables(s, dir).events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n"), dsum(col("value")).as("volume"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col("event_type"), col("o.value").as("open"), col("high"),
        col("low"), col("c.value").as("close"), col("n"), col("volume"))
      .orderBy("w_start", "event_type"),
    Some(ohlcOracleSql))

  val all: Seq[Q] = Seq(tumbling, sliding, session, asofJoin, asofBucketed,
    punctuated, asofForward, asofNearest, asofNearestBucketed,
    asofForwardBucketed, asofInterpolate, asofInterpolateBucketed, ohlc)
}
