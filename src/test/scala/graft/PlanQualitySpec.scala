package graft

import graft.operators.GlobalOrder
import graft.queries.Registry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regressions: properties every registered query's
  * physical plan must keep as the registry grows.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no unintended cartesian product in any registered query plan") {
    // crossJoin(broadcast(...)) plans as BroadcastNestedLoopJoin — the
    // intended shape for tiny query sets; a bare CartesianProduct means
    // a join lost its keys.
    Registry.all.filterNot(_.name.startsWith("s0")).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n${plan.take(1200)}")
    }
  }

  test("GlobalOrder.withGlobalIndex matches single-partition row_number") {
    val t = Tables(spark, dir)
    val viaGlobal = GlobalOrder.withGlobalIndex(
      t.orders.select("o_orderkey", "o_totalprice"), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("_global_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaWindow = t.orders
      .withColumn("rn", row_number().over(Window.orderBy(col("o_orderkey"))))
      .select(col("o_orderkey"), col("rn").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaGlobal == viaWindow)
  }
}
