package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY "hard parts": salting for hot keys).
  *
  * Salted aggregation splits each hot key across `saltFactor` reducers
  * with a random-but-deterministic per-row salt, partially aggregates on
  * (key, salt), then finishes on key alone. Both shuffles move only
  * aggregated rows; the hot key's input spreads over `saltFactor` tasks.
  * AQE's skew handling covers joins; aggregation skew needs this shape.
  */
object Skew {

  /** Salted equi-join for a skewed fact side: each fact row gets a
    * deterministic salt in [0, saltFactor); the dimension side is
    * replicated once per salt value (explode of a literal range), and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `saltFactor` reducers instead of melting one. Semantically
    * identical to `fact JOIN dim ON key` for a dimension UNIQUE on the
    * key (each fact row meets exactly one replica of its dim row).
    *
    * This is the manual fallback for when AQE's skew-join splitting
    * can't help (e.g. the skewed side feeds from an already-skewed
    * upstream stage, or the join is forced sort-merge by a later
    * operator); prefer AQE where it applies. Replication cost is
    * |dim| × saltFactor rows — meant for dimension-sized right sides.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be > 0, got $saltFactor")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()),
        lit(saltFactor.toLong)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedJoin]] restricted to the keys that actually need it — the
    * production form. Replicating the whole dimension `saltFactor`×
    * pays for skew everywhere; here one aggregate over the fact finds
    * the keys above `hotThreshold` rows, only those fact/dim rows take
    * the salted path, and the (vast) cold remainder joins plainly. The
    * hot-key set is tiny by construction (at most |fact|/hotThreshold
    * keys) and broadcasts into semi/anti splits of both sides.
    *
    * At 100 TB the exact counting pass is one map-side-combined
    * aggregate over the join column only; a deployment that already
    * tracks key frequencies (or samples) can pass them in instead —
    * the split/join shape is the part that matters. Equivalent to the
    * plain join for a dimension unique on the key, hot or cold.
    */
  def saltedJoinHotKeys(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 16, hotThreshold: Long = 1000000L): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold must be > 0, got $hotThreshold")
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > hotThreshold)
      .select(col(key))
    val salted = saltedJoin(
      fact.join(broadcast(hot), Seq(key), "left_semi"),
      dim.join(broadcast(hot), Seq(key), "left_semi"),
      key, saltFactor)
    val plain = fact.join(broadcast(hot), Seq(key), "left_anti")
      .join(dim, Seq(key))
    salted.unionByName(plain)
  }

  /** Two-stage salted sum/count aggregation. `valueCol` is summed
    * exactly (decimal) so salting can't perturb the result vs a plain
    * groupBy — the invariant the oracle checks.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(keyCol), monotonically_increasing_id()),
        lit(saltFactor.toLong)))
    val partial = salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("_sum"))
    partial
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("sum_value"))
  }
}
