package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded driver-collect guard (r17 verdict item 2): model
  * collects go through `DriverModel.collectBounded`, which caps the
  * transfer with `limit(max + 1)` and fails LOUD past the cap instead
  * of OOMing the driver silently.
  */
class DriverModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sub-cap tables collect unchanged") {
    val df = spark.range(0, 10).toDF("id")
    val rows = graft.operators.DriverModel
      .collectBounded(df, "spec site", maxRows = 10)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 10L))
  }

  test("over-cap tables fail loud, naming the site and the cap") {
    val df = spark.range(0, 100).toDF("id")
    val e = intercept[IllegalArgumentException] {
      graft.operators.DriverModel.collectBounded(df, "spec site", maxRows = 42)
    }
    assert(e.getMessage.contains("spec site"))
    assert(e.getMessage.contains("42"))
    assert(e.getMessage.contains("driver"))
  }

  test("the guard itself never transfers more than max + 1 rows") {
    // a wide corpus-scale table behind the guard: the limit bounds the
    // collect, so this returns promptly instead of materializing 10^8
    // rows on the driver before the require can see them
    val wide = spark.range(0, 100000000L).toDF("id")
      .withColumn("payload", concat(lit("x"), col("id")))
    val e = intercept[IllegalArgumentException] {
      graft.operators.DriverModel.collectBounded(wide, "wide site",
        maxRows = 100)
    }
    assert(e.getMessage.contains("wide site"))
  }
}
