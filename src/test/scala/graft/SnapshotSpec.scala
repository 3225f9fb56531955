package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge semantics: delete drops, delete-of-absent is a no-op,
  * upsert replaces in place, upsert-of-absent inserts, untouched rows
  * pass through as kept.
  */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyChangeset: the four change outcomes plus pass-through") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("id", "payload")
    val changes = Seq(
      (2L, "delete", null.asInstanceOf[String]), // existing → dropped
      (9L, "delete", null.asInstanceOf[String]), // absent → no-op
      (3L, "upsert", "three-v2"),                // existing → updated
      (7L, "upsert", "seven")                    // absent → inserted
    ).toDF("id", "op", "payload")
    val out = Snapshot.applyChangeset(base, changes, idCol = "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out == Map(
      1L -> ("one", "kept"),
      3L -> ("three-v2", "updated"),
      7L -> ("seven", "inserted")))
  }

  test("applyChangeset refuses a changeset missing payload columns") {
    val base = Seq((1L, "one")).toDF("id", "payload")
    val bad = Seq((1L, "delete")).toDF("id", "op")
    val e = intercept[IllegalArgumentException](
      Snapshot.applyChangeset(base, bad, idCol = "id"))
    assert(e.getMessage.contains("payload"))
  }

  test("applyChangeset fails loudly on an op outside {upsert, delete}") {
    val base = Seq((1L, "one")).toDF("id", "payload")
    val typo = Seq((1L, "remove", "x")).toDF("id", "op", "payload")
    val e1 = intercept[Exception](
      Snapshot.applyChangeset(base, typo, idCol = "id").collect())
    assert(e1.getMessage.contains("upsert|delete"), e1.getMessage)
    val nullOp = Seq((9L, null.asInstanceOf[String], "x"))
      .toDF("id", "op", "payload")
    val e2 = intercept[Exception](
      Snapshot.applyChangeset(base, nullOp, idCol = "id").collect())
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("merging the n51-style changeset then diffing yields no 'changed' surprises") {
    // apply → diff closure: every provenance the merge emits must map
    // to the diff's classification of (base, merged)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "payload")
    val changes = Seq((1L, "delete", null.asInstanceOf[String]),
      (3L, "upsert", "c2"), (5L, "upsert", "e"))
      .toDF("id", "op", "payload")
    val merged = Snapshot.applyChangeset(base, changes, idCol = "id")
    val diff = base.as("o")
      .join(merged.as("n"), col("o.id") === col("n.id"), "full_outer")
      .select(
        when(col("o.id").isNull, "added")
          .when(col("n.id").isNull, "removed")
          .when(col("o.payload") === col("n.payload"), "same")
          .otherwise("changed").as("status"))
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff == Map(
      "removed" -> 1L, "added" -> 1L, "changed" -> 1L, "same" -> 2L))
  }
}
