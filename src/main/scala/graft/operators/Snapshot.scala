package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance — the write side of the corpus
  * release cycle whose read side is the n51 diff audit: apply a CDC
  * changeset (upserts + deletes) to a base snapshot and emit the next
  * snapshot with per-row provenance. Reference capability analog: the
  * incremental queue-ingest pipeline (`Stream.scala:330-348`) — here
  * the "queue" is a changeset table and the result is a full
  * deterministic table version, the shape a training-data platform
  * publishes per release (Delta/Iceberg MERGE semantics, expressed as
  * one plain full-outer join so it needs no table format).
  *
  * Scale shape: ONE co-partitioned equi-join on the id — the minimum
  * any merge pays. The changeset is usually a small fraction of the
  * snapshot, so the planner broadcasts it; when both sides are huge,
  * bucket both by id (BucketingSpec's zero-shuffle join pattern) and
  * the merge never shuffles the base payload at all. Nothing is
  * driver-side; provenance is a per-row CASE over the join's null
  * pattern (the n51 classification, applied instead of just counted).
  */
object Snapshot {
  /** Apply `changes` to `base`. `changes` carries the same payload
    * columns as `base` plus `opCol` ∈ {"upsert", "delete"}: delete
    * drops the id (a delete for an absent id is a no-op), upsert
    * replaces the payload (an upsert for an absent id inserts). The op
    * domain is enforced data-side: any other value (or NULL) raises.
    * At most one change row per id (enforce upstream — last-writer-wins
    * compaction is a groupBy max(version) before calling).
    * Output: id, payload columns, provenance ∈ {kept, updated,
    * inserted}.
    */
  def applyChangeset(
      base: DataFrame,
      changes: DataFrame,
      idCol: String,
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol)
    require(payload.forall(changes.columns.contains),
      s"changes must carry the payload columns ${payload.mkString(",")}")
    // enforce the op domain DATA-side: any op outside {upsert, delete}
    // (a typo, or a NULL on a change row) fails the job loudly instead
    // of silently merging as an upsert / emitting a null-payload row
    val vchanges = changes.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"Snapshot.applyChangeset: $opCol must be upsert|delete, got "),
          coalesce(col(opCol).cast("string"), lit("NULL"))))))
    val joined = base.as("b")
      .join(vchanges.as("c"), col(s"b.$idCol") === col(s"c.$idCol"),
        "full_outer")
    val changed = col(s"c.$opCol").isNotNull
    val cols =
      coalesce(col(s"b.$idCol"), col(s"c.$idCol")).as(idCol) +:
        payload.map(p =>
          when(changed, col(s"c.$p")).otherwise(col(s"b.$p")).as(p)) :+
        when(!changed, lit("kept"))
          .when(col(s"b.$idCol").isNotNull, lit("updated"))
          .otherwise(lit("inserted")).as("provenance")
    joined
      .filter(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "delete")
      .select(cols: _*)
  }
}
