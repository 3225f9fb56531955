package graft

import java.sql.Timestamp

import graft.operators.Funnels
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the funnel's per-partition greedy frontier pass
  * ([[Funnels.frontierDepths]]) — the pending/hasUser state machine is
  * subtle enough that the end-to-end oracle alone leaves future edits
  * unpinned (r16 verdict task 5). Layout generators hit exactly the
  * adversarial shapes named there: user boundaries everywhere
  * (including back-to-back single-event users), same-ts ties at every
  * step, users with None ids, empty partitions, and arbitrary splits
  * of the user sequence across partitions.
  */
object FunnelFrontierCheck extends Properties("graft.funnel.frontier") {

  private val NSteps = 3

  /** Reference model: group consecutive rows by user, then fold the
    * documented frontier rule directly — step i advances iff it is the
    * next expected index and strictly after the previous frontier ts.
    */
  private def refDepths(
      rows: Seq[(Option[Long], Int, Timestamp)], nSteps: Int): Seq[Int] = {
    if (rows.isEmpty) return Seq.empty
    val groups = scala.collection.mutable.Buffer(
      scala.collection.mutable.Buffer.empty[(Int, Timestamp)])
    var cur = rows.head._1
    rows.foreach { case (u, i, ts) =>
      if (u != cur) {
        groups += scala.collection.mutable.Buffer.empty[(Int, Timestamp)]
        cur = u
      }
      groups.last += ((i, ts))
    }
    groups.toSeq.map { evs =>
      var depth = 0
      val t = Array.ofDim[Timestamp](nSteps)
      evs.foreach { case (i, ts) =>
        if (i == depth && depth < nSteps &&
            (depth == 0 || ts.compareTo(t(depth - 1)) > 0)) {
          t(depth) = ts
          depth += 1
        }
      }
      depth
    }
  }

  /** One user's contiguous ts-ascending slice: step indices arbitrary
    * in [0, NSteps), timestamps non-decreasing with heavy tie bias
    * (gap ∈ {0, 0, 1} ms — ties at every step are the adversarial
    * case), 1–8 events (1 = the single-event user).
    */
  private val userSliceGen: Gen[Seq[(Int, Timestamp)]] = for {
    n <- Gen.chooseNum(1, 8)
    steps <- Gen.listOfN(n, Gen.chooseNum(0, NSteps - 1))
    gaps <- Gen.listOfN(n, Gen.oneOf(0L, 0L, 1L))
  } yield {
    val times = gaps.scanLeft(1000L)(_ + _).tail
    steps.zip(times.map(new Timestamp(_)))
  }

  /** A partition: consecutive DISTINCT users (an id run like the
    * post-sort layout), each with its slice; user 0 is Option-None
    * with 30% probability (the null-user pseudo-group).
    */
  private val partitionGen: Gen[Seq[(Option[Long], Int, Timestamp)]] = for {
    nUsers <- Gen.chooseNum(0, 6)
    slices <- Gen.listOfN(nUsers, userSliceGen)
    firstNone <- Gen.prob(0.3)
  } yield slices.zipWithIndex.flatMap { case (evs, u) =>
    val id: Option[Long] = if (u == 0 && firstNone) None else Some(u.toLong)
    evs.map { case (i, ts) => (id, i, ts) }
  }

  property("frontierDepths == reference model on adversarial layouts") =
    forAll(partitionGen) { rows =>
      Funnels.frontierDepths(rows.iterator, NSteps).toSeq ==
        refDepths(rows, NSteps)
    }

  property("one emitted depth per user group, all in [0, nSteps]") =
    forAll(partitionGen) { rows =>
      val out = Funnels.frontierDepths(rows.iterator, NSteps).toSeq
      val nGroups =
        if (rows.isEmpty) 0
        else 1 + rows.map(_._1).sliding(2).count {
          case Seq(a, b) => a != b
          case _ => false
        }
      out.size == nGroups && out.forall(d => d >= 0 && d <= NSteps)
    }

  property("partition split at any user boundary leaves depths unchanged") =
    forAll(partitionGen, Gen.chooseNum(0, 6)) { (rows, cutAt) =>
      // cutting BETWEEN users models two partitions (repartition by
      // user guarantees no user spans a cut); concatenated outputs
      // must equal the single-partition pass — including when either
      // side is the empty partition
      val boundaries = rows.map(_._1).distinct
      val cutUser = boundaries.drop(cutAt % (boundaries.size max 1))
        .headOption
      val (a, b) = cutUser match {
        case Some(u) => rows.span(_._1 != u)
        case None => (rows, Seq.empty)
      }
      (Funnels.frontierDepths(a.iterator, NSteps).toSeq ++
        Funnels.frontierDepths(b.iterator, NSteps).toSeq) ==
        Funnels.frontierDepths(rows.iterator, NSteps).toSeq
    }

  property("empty partition emits nothing") =
    Funnels.frontierDepths(
      Iterator.empty[(Option[Long], Int, Timestamp)], NSteps).isEmpty
}
