package graft

import graft.operators.Mixture
import org.scalatest.funsuite.AnyFunSuite

/** DoReMi-style trained mixture weights: the trajectory is exact by
  * construction (decimal-routed sums, rational update), so the spec
  * pins it against a plain-Scala replay with NO tolerance, plus the
  * distributional laws (simplex, floor, upweight-the-worst) and the
  * per-mille realization arithmetic.
  */
class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two skewed domains plus one: srcB's tokens are rarest in the
  // uniform mixture, so it must gain weight
  private val fixture = Seq(
    (1L, "srcA", "a a b"),
    (2L, "srcA", "a b"),
    (3L, "srcB", "c c c b"),
    (4L, "srcC", "a c b a"))

  private def docsDf = fixture.toDF("doc_id", "source", "text")

  /** Plain-Scala replay of the documented arithmetic, op for op:
    * unigram models, linear-surrogate losses, clipped excess,
    * (1 + η·ε) multiplicative update, (1−c)·norm + c·uniform smoothing
    * — every sum through the same decimal-12 route the engine uses.
    */
  private def replay(
      docs: Seq[(Long, String, String)], iters: Int, lr: Double,
      smooth: Double): Seq[(Int, String, Double, Double, Double)] = {
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._2).map {
      case (s, ds) => s -> ds.flatMap(_._3.split(" "))
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val n = counts.map { case (s, m) => s -> m.values.sum }
    val p = counts.map { case (s, m) =>
      s -> m.map { case (t, c) => t -> c.toDouble / n(s).toDouble }
    }
    val ref = counts.map { case (s, m) =>
      s -> (1.0 - Mixture.exactSum12(
        m.map { case (t, c) => c.toDouble * p(s)(t) }) / n(s).toDouble)
    }
    val srcs = counts.keys.toSeq.sorted
    val dD = srcs.size.toDouble
    val vocab = counts.values.flatMap(_.keys).toSet
    var w = srcs.map(_ -> 1.0 / dD).toMap
    val out = Seq.newBuilder[(Int, String, Double, Double, Double)]
    (1 to iters).foreach { r =>
      val pm = vocab.map { t =>
        t -> Mixture.exactSum12(
          srcs.filter(s => p(s).contains(t)).map(s => w(s) * p(s)(t)))
      }.toMap
      val loss = srcs.map { s =>
        s -> (1.0 - Mixture.exactSum12(
          counts(s).map { case (t, c) => c.toDouble * pm(t) })
          / n(s).toDouble)
      }.toMap
      val excess = srcs.map(s => s -> math.max(0.0, loss(s) - ref(s))).toMap
      val u = srcs.map(s => s -> w(s) * (1.0 + lr * excess(s))).toMap
      val z = Mixture.exactSum12(srcs.map(u))
      w = srcs.map(s =>
        s -> ((1.0 - smooth) * (u(s) / z) + smooth * (1.0 / dD))).toMap
      srcs.foreach(s => out += ((r, s, loss(s), excess(s), w(s))))
    }
    out.result()
  }

  test("trajectory equals the plain-Scala replay bit for bit") {
    val got = Mixture.doremiTrajectory(docsDf, iters = 3)
      .orderBy("round", "source").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val want = replay(fixture, iters = 3, lr = 1.0, smooth = 0.01)
    assert(got.toSeq == want,
      s"trajectory diverged:\n got=${got.toSeq}\nwant=$want")
  }

  test("weights stay on the smoothed simplex and floor at smooth/D") {
    val (traj, fin) = Mixture.doremiTrain(docsDf, iters = 3, smooth = 0.01)
    assert(traj.size == 3 * 3)
    val perRound = traj.groupBy(_.round)
    perRound.values.foreach { rs =>
      val s = rs.map(_.weight).sum
      assert(math.abs(s - 1.0) < 1e-9, s"weights sum $s")
      rs.foreach(r => assert(r.weight >= 0.01 / 3 - 1e-15,
        s"${r.source} weight ${r.weight} under the uniform floor"))
    }
    assert(math.abs(fin.values.sum - 1.0) < 1e-9)
  }

  test("the domain the mixture fits worst gains the most weight") {
    val (traj, _) = Mixture.doremiTrain(docsDf, iters = 1)
    val r1 = traj.filter(_.round == 1)
    val worst = r1.maxBy(_.excess)
    // the max-excess domain must sit strictly above uniform after the
    // first update; a uniform-excess corpus would keep all at 1/D
    assert(worst.excess > 0.0)
    assert(worst.weight > 1.0 / 3,
      s"worst-fit ${worst.source} not upweighted: ${worst.weight}")
    assert(r1.maxBy(_.weight).source == worst.source)
  }

  test("uniform single-domain corpus keeps the trivial weight") {
    val one = Seq((1L, "only", "x y"), (2L, "only", "y x"))
      .toDF("doc_id", "source", "text")
    val (traj, fin) = Mixture.doremiTrain(one, iters = 2)
    assert(fin.keySet == Set("only"))
    // one domain: mixture == own model, excess 0, weight stays 1
    traj.foreach { r =>
      assert(r.excess == 0.0)
      assert(math.abs(r.weight - 1.0) < 1e-12)
    }
  }

  test("realizedRates + applyRates realize the exact per-mille copies") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 60) "big" else "small", "t")).toDF("doc_id", "source", "text")
    // weights 0.75/0.25, target 80 docs: big s_s=750000 →
    // (1000·80·750000) div (1000000·60) = 1000‰ exactly; small
    // s_s=250000 → (1000·80·250000) div (1000000·40) = 500‰
    val rates = Mixture.realizedRates(docs,
      Map("big" -> 0.75, "small" -> 0.25), targetTotal = 80L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates == Map("big" -> 1000L, "small" -> 500L))
    val out = Mixture.applyRates(docs,
      Mixture.realizedRates(docs,
        Map("big" -> 0.75, "small" -> 0.25), 80L)).collect()
    // big at 1000‰: one copy per doc; small at 500‰: copies =
    // (id%1000 < 500), and ids 60..99 all satisfy it → one copy each
    assert(out.count(_.getString(1) == "big") == 60)
    assert(out.count(_.getString(1) == "small") == 40)
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("domainAblation matches the exact integer replay") {
    val docs = Seq(
      (1L, "srcA", "en", "a a b"),
      (2L, "srcA", "de", "a b"),
      (3L, "srcB", "de", "c c b"))
      .toDF("doc_id", "source", "lang", "text")
    val out = Mixture
      .domainAblation(docs, org.apache.spark.sql.functions.col("lang") === "en")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // hand replay: tt = {a:2, b:1}, n_tgt=3; C = {a:3, b:3, c:2}, N=8;
    // A = 2·3 + 1·3 = 9; B_srcA = 2·3 + 1·2 = 8; B_srcB = 1·1 = 1
    val lossFull = 1.0 - (9.0 / 8.0) / 3.0
    val woA = 1.0 - (1.0 / 3.0) / 3.0
    val woB = 1.0 - (8.0 / 5.0) / 3.0
    assert(out.toSeq == Seq(
      ("srcA", 5L, lossFull, woA, woA - lossFull),
      ("srcB", 3L, lossFull, woB, woB - lossFull)))
    // the domain CONTAINING the target is net-positive; the unrelated
    // one dilutes the pool
    assert(woA - lossFull > 0 && woB - lossFull < 0)
  }

  test("training is deterministic across runs") {
    val a = Mixture.doremiTrajectory(docsDf).collect().toSeq
    val b = Mixture.doremiTrajectory(docsDf).collect().toSeq
    assert(a == b)
  }
  test("tokenWaterfill: level, bonus, and exact budget spend on a known case") {
    // supplies: srcS=2, srcM=10, srcL=60 (total 72); budget 15:
    // segment: saturate srcS (2), level C=(15-2) DIV 2=6, spend=2+12=14,
    // remainder 1 -> first uncapped source ascending (srcM) gets +1
    val docs = Seq(
      (1L, "srcS", "t t"),
      (2L, "srcM", ("t " * 10).trim),
      (3L, "srcL", ("t " * 60).trim)).toDF("doc_id", "source", "text")
    val got = Mixture.tokenWaterfill(docs, 15L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList.sortBy(_._1)
    assert(got == List(
      ("srcL", 60L, 6L, 6L, 54L),
      ("srcM", 10L, 6L, 7L, 3L),
      ("srcS", 2L, 6L, 2L, 0L)))
    assert(got.map(_._4).sum == 15L, "alloc must spend the budget exactly")
  }

  test("tokenWaterfill: budget >= total supply degenerates to alloc = supply, null level") {
    val docs = Seq(
      (1L, "srcA", "t t t"),
      (2L, "srcB", "t t")).toDF("doc_id", "source", "text")
    val got = Mixture.tokenWaterfill(docs, 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.isNullAt(2),
        r.getLong(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got == List(("srcA", 3L, true, 3L, 0L), ("srcB", 2L, true, 2L, 0L)))
  }

  test("tokenWaterfill: spend equals budget on the real corpus and level is maximal") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Mixture.tokenWaterfill(docs, 15000L).collect()
    val spent = rows.map(_.getLong(3)).sum
    assert(spent == 15000L, s"waterfill spent $spent of 15000")
    val level = rows.map(_.getLong(2)).head
    // maximality: raising the cap by 1 for every uncapped source must
    // overshoot the budget (otherwise C was not the water level)
    val over = rows.map(r => math.min(r.getLong(1), level + 1)).sum
    assert(over > 15000L, "level + 1 must overshoot the budget")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(1)),
      "no source may allocate beyond its supply")
  }
}
