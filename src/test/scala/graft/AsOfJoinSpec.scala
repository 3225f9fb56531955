package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed (scale-path) as-of join must agree exactly with the
  * per-key window form, including across-bucket carries, empty buckets,
  * equal timestamps, and lefts before any right.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long)], idCol: String) =
    rows.toDF("key", "ts_s", idCol)
      .select(col("key"), timestamp_seconds(col("ts_s")).as("ts"), col(idCol))

  test("bucketed == perKey on a handcrafted edge-case set") {
    // key 1: left before any right; right exactly at left ts; carry over
    // an empty bucket gap. key 2: all matches from carry only.
    val left = df(Seq(
      (1L, 5L, 100L),   // before any right -> null
      (1L, 10L, 101L),  // right at ts=10 counts (at-or-before)
      (1L, 95L, 102L),  // long gap: carry across empty buckets
      (2L, 50L, 200L),  // carry from bucket 0
      (3L, 7L, 300L)),  // key with no rights at all -> null
      "left_id")
    val right = df(Seq(
      (1L, 10L, 11L), (1L, 12L, 12L),
      (2L, 3L, 21L)),
      "right_id")
    val expected = Set(
      (100L, 1L, None), (101L, 1L, Some(11L)), (102L, 1L, Some(12L)),
      (200L, 2L, Some(21L)), (300L, 3L, None))
    def toSet(out: org.apache.spark.sql.DataFrame) =
      out.select("left_id", "key", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(toSet(AsOfJoin.perKey(left, right)) == expected)
    for (bucket <- Seq(1L, 7L, 30L, 1000L))
      assert(toSet(AsOfJoin.bucketed(left, right, bucket)) == expected,
        s"bucket=$bucket")
  }

  test("tied (key, ts) right rows resolve deterministically to max right_id") {
    // three right rows at the exact click ts, plus an earlier decoy; both
    // implementations must pick 33 (max right_id at the tie), not an
    // arbitrary one — and must agree with each other.
    val left = df(Seq((1L, 10L, 100L), (1L, 11L, 101L)), "left_id")
    val right = df(Seq(
      (1L, 10L, 31L), (1L, 10L, 33L), (1L, 10L, 32L), (1L, 5L, 9L)),
      "right_id")
    val expected = Set((100L, 1L, Some(33L)), (101L, 1L, Some(33L)))
    def toSet(out: org.apache.spark.sql.DataFrame) =
      out.select("left_id", "key", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(toSet(AsOfJoin.perKey(left, right)) == expected)
    for (bucket <- Seq(1L, 7L, 1000L))
      assert(toSet(AsOfJoin.bucketed(left, right, bucket)) == expected,
        s"bucket=$bucket")
  }

  test("randomized agreement with a sequential model, ties included") {
    // tiny ts domain (0..19) over 200 events per run forces many
    // duplicate (key, ts) pairs on both sides; fixed seed keeps it
    // deterministic. Model: max right_id among rights at the max
    // right ts <= left ts for the key.
    val rng = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val lefts = Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 100L + i))
      val rights = Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 500L + i))
      val model: Map[Long, Option[Long]] = lefts.map { case (k, ts, lid) =>
        val cand = rights.filter(r => r._1 == k && r._2 <= ts)
        lid -> (if (cand.isEmpty) None else {
          val maxTs = cand.map(_._2).max
          Some(cand.filter(_._2 == maxTs).map(_._3).max)
        })
      }.toMap
      val l = df(lefts, "left_id")
      val r = df(rights, "right_id")
      def toMapOut(out: org.apache.spark.sql.DataFrame) =
        out.select("left_id", "key", "right_id")
          .collect().map(row => row.getLong(0) ->
            (if (row.isNullAt(2)) None else Some(row.getLong(2)))).toMap
      assert(toMapOut(AsOfJoin.perKey(l, r)) == model, s"perKey round $round")
      for (bucket <- Seq(1L, 3L, 100L))
        assert(toMapOut(AsOfJoin.bucketed(l, r, bucket)) == model,
          s"bucketed($bucket) round $round")
    }
  }

  test("bucketed == perKey on the events table (clicks as-of views)") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val left = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
    val right = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("right_id"))
    val a = AsOfJoin.perKey(left, right)
      .collect().map(_.toSeq).toSet
    val b = AsOfJoin.bucketed(left, right, 3600L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("forwardPerKey: horizon, inclusive at-ts, min-id ties, no-match null") {
    // key 1: left at 5 -> earliest right at-or-after is ts=10 (within
    // horizon 10); left at 10 matches the SAME-ts right (inclusive),
    // two rights tie at ts=10 -> MIN right_id; left at 95 -> nearest
    // right is 200, beyond the horizon -> null.
    // key 2: no rights at all -> null.
    val left = df(Seq(
      (1L, 5L, 100L), (1L, 10L, 101L), (1L, 95L, 102L),
      (2L, 50L, 200L)),
      "left_id")
    val right = df(Seq(
      (1L, 10L, 12L), (1L, 10L, 11L), (1L, 200L, 13L)),
      "right_id")
    val got = AsOfJoin.forwardPerKey(left, right, horizonSeconds = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val expected = Set(
      (100L, 1L, Some(11L)), (101L, 1L, Some(11L)), (102L, 1L, None),
      (200L, 2L, None))
    assert(got == expected, s"got $got")
  }

  test("bucketedForward == forwardPerKey on edge fixtures and random rounds") {
    // the r13 gap: only BACKWARD had a hot-key bucketed path — forward
    // and nearest claimed symmetry without code. Equality must hold
    // across bucket sizes straddling the fixture's ts domain (per-event
    // buckets, mid-size, one giant bucket) and horizons including 0.
    def toSet(out: org.apache.spark.sql.DataFrame) =
      out.select("left_id", "key", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val left = df(Seq(
      (1L, 5L, 100L), (1L, 10L, 101L), (1L, 95L, 102L),
      (2L, 50L, 200L), (3L, 7L, 300L)),
      "left_id")
    val right = df(Seq(
      (1L, 10L, 12L), (1L, 10L, 11L), (1L, 200L, 13L), (3L, 3L, 31L)),
      "right_id")
    for (h <- Seq(0L, 10L, 500L); bucket <- Seq(1L, 7L, 30L, 1000L)) {
      val want = toSet(AsOfJoin.forwardPerKey(left, right, h))
      val got = toSet(AsOfJoin.bucketedForward(left, right, h, bucket))
      assert(got == want, s"horizon=$h bucket=$bucket")
    }
    val rng = new scala.util.Random(1014)
    for (round <- 1 to 2) {
      val l = df(Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 100L + i)),
        "left_id")
      val r = df(Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 500L + i)),
        "right_id")
      for (h <- Seq(0L, 5L); bucket <- Seq(1L, 3L, 100L))
        assert(toSet(AsOfJoin.bucketedForward(l, r, h, bucket)) ==
          toSet(AsOfJoin.forwardPerKey(l, r, h)),
          s"round=$round horizon=$h bucket=$bucket")
    }
  }

  test("bucketedNearest == nearestPerKey incl. direction, on fixtures, random rounds, and events") {
    def toSet(out: org.apache.spark.sql.DataFrame) =
      out.select("left_id", "key", "right_id", "direction")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet
    // the nearestPerKey fixture: distance ties, same-ts 0-distance
    // backward, band exclusion — now ALSO across bucket boundaries
    val left = df(Seq(
      (1L, 13L, 100L), (1L, 16L, 101L), (1L, 15L, 102L),
      (1L, 10L, 103L), (1L, 40L, 104L), (2L, 50L, 200L)),
      "left_id")
    val right = df(Seq(
      (1L, 10L, 11L), (1L, 10L, 12L), (1L, 20L, 13L)),
      "right_id")
    for (h <- Seq(0L, 10L, 100L); bucket <- Seq(1L, 4L, 13L, 1000L)) {
      val want = toSet(AsOfJoin.nearestPerKey(left, right, h))
      val got = toSet(AsOfJoin.bucketedNearest(left, right, h, bucket))
      assert(got == want, s"horizon=$h bucket=$bucket")
    }
    val rng = new scala.util.Random(2718)
    for (round <- 1 to 2) {
      val l = df(Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 100L + i)),
        "left_id")
      val r = df(Seq.tabulate(100)(i =>
        (rng.nextInt(5).toLong + 1, rng.nextInt(20).toLong, 500L + i)),
        "right_id")
      for (h <- Seq(0L, 5L); bucket <- Seq(1L, 3L, 100L))
        assert(toSet(AsOfJoin.bucketedNearest(l, r, h, bucket)) ==
          toSet(AsOfJoin.nearestPerKey(l, r, h)),
          s"round=$round horizon=$h bucket=$bucket")
    }
    // real data: views->purchases ±2h, the w08 shape
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val lv = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("key"), col("ts"),
        col("event_id").as("left_id"))
    val rp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts"),
        col("event_id").as("right_id"))
    val a = toSet(AsOfJoin.nearestPerKey(lv, rp, 7200L))
    val b = toSet(AsOfJoin.bucketedNearest(lv, rp, 7200L, 3600L))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("nearestPerKey: closer side wins, distance ties backward, band excludes") {
    // key 1 rights at ts 10 (ids 11,12) and 20 (id 13):
    //   left at 13 -> backward dist 3 vs forward dist 7 -> backward,
    //     two rights tie at ts=10 -> backward rule = MAX id (12)
    //   left at 16 -> backward dist 6 vs forward dist 4 -> forward (13)
    //   left at 15 -> dist 5 both sides -> tie goes BACKWARD (12)
    //   left at 10 -> same-ts right = 0-distance backward match (12)
    //   left at 40 -> nearest right dist 20, beyond horizon 10 -> null
    // key 2: no rights -> null
    val left = df(Seq(
      (1L, 13L, 100L), (1L, 16L, 101L), (1L, 15L, 102L),
      (1L, 10L, 103L), (1L, 40L, 104L), (2L, 50L, 200L)),
      "left_id")
    val right = df(Seq(
      (1L, 10L, 11L), (1L, 10L, 12L), (1L, 20L, 13L)),
      "right_id")
    val got = AsOfJoin.nearestPerKey(left, right, horizonSeconds = 10L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet
    val expected = Set(
      (100L, Some(12L), Some("backward")),
      (101L, Some(13L), Some("forward")),
      (102L, Some(12L), Some("backward")),
      (103L, Some(12L), Some("backward")),
      (104L, None, None),
      (200L, None, None))
    assert(got == expected, s"got $got")
  }

  test("interpolatePerKey: linear value, exact hit, hold, backfill, empty key") {
    // key 1 rights: (ts 10, v 1.0), (ts 20, v 3.0)
    //   left at 15 -> interp: 1 + 2*(5/10) = 2.0
    //   left at 12 -> interp: 1 + 2*(2/10) = 1.4
    //   left at 10 -> exact hit -> 1.0
    //   left at 25 -> hold -> 3.0
    //   left at  5 -> backfill -> 1.0
    // key 2: no rights -> null mode, null value
    val left = df(Seq(
      (1L, 15L, 100L), (1L, 12L, 101L), (1L, 10L, 102L),
      (1L, 25L, 103L), (1L, 5L, 104L), (2L, 50L, 200L)),
      "left_id")
    val right = df(Seq((1L, 10L, 11L), (1L, 20L, 12L)), "right_id")
      .withColumn("value",
        when(col("right_id") === 11L, 1.0).otherwise(3.0))
    val got = AsOfJoin.interpolatePerKey(left, right)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
    val expected = Set(
      (100L, Some("interp"), Some(2.0)),
      (101L, Some("interp"), Some(1.4)),
      (102L, Some("exact"), Some(1.0)),
      (103L, Some("hold"), Some(3.0)),
      (104L, Some("backfill"), Some(1.0)),
      (200L, None, None))
    assert(got == expected, s"got $got")
  }

  test("bucketedInterpolate == interpolatePerKey on fixtures and random rounds") {
    def valued(rows: Seq[(Long, Long, Long)]) =
      df(rows, "right_id").withColumn("value",
        (col("right_id") % 7 + 1).cast("double"))
    def run(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame, b: Long) = {
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(x => (x.getLong(0),
          if (x.isNullAt(2)) None else Some(x.getDouble(2)),
          if (x.isNullAt(3)) None else Some(x.getDouble(3)),
          if (x.isNullAt(4)) None else Some(x.getString(4)),
          if (x.isNullAt(5)) None else Some(x.getDouble(5)))).toSet
      assert(canon(AsOfJoin.bucketedInterpolate(l, r, b)) ==
        canon(AsOfJoin.interpolatePerKey(l, r)), s"bucket=$b")
    }
    // the interpolate fixture, across bucket widths incl. degenerate 1s
    val left = df(Seq(
      (1L, 15L, 100L), (1L, 12L, 101L), (1L, 10L, 102L),
      (1L, 25L, 103L), (1L, 5L, 104L), (2L, 50L, 200L)),
      "left_id")
    val right = valued(Seq((1L, 10L, 11L), (1L, 20L, 12L)))
    Seq(1L, 7L, 100L).foreach(b => run(left, right, b))
    // random rounds: clustered ts so carries cross buckets
    val rng = new scala.util.Random(5)
    (1 to 3).foreach { round =>
      val l = df((1 to 60).map(i =>
        (rng.nextInt(3).toLong + 1, rng.nextInt(40).toLong,
          1000L + i)), "left_id")
      val r = valued((1 to 40).map(i =>
        (rng.nextInt(3).toLong + 1, rng.nextInt(40).toLong,
          2000L + i)))
      run(l, r, 5L + round * 7L)
    }
  }

  test("interpolatePerKey: within-ts ties follow the family rules") {
    // two rights at ts=10 (ids 11 v=1, 12 v=9) and two at ts=20
    // (ids 13 v=5, 14 v=7): backward carry takes MAX id (12, v=9),
    // forward carry takes MIN id (13, v=5) -> interp at 15 = 9 + (5-9)/2
    val left = df(Seq((1L, 15L, 100L)), "left_id")
    val right = df(Seq(
      (1L, 10L, 11L), (1L, 10L, 12L), (1L, 20L, 13L), (1L, 20L, 14L)),
      "right_id")
      .withColumn("value",
        when(col("right_id") === 11L, 1.0)
          .when(col("right_id") === 12L, 9.0)
          .when(col("right_id") === 13L, 5.0)
          .otherwise(7.0))
    val r = AsOfJoin.interpolatePerKey(left, right).collect().head
    assert(r.getDouble(2) == 9.0, "backward tie -> max right_id's value")
    assert(r.getDouble(3) == 5.0, "forward tie -> min right_id's value")
    assert(r.getDouble(5) == 7.0, "9 + (5-9)*0.5")
  }
}
