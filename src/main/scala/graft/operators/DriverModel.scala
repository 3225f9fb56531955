package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Bounded driver-side materialization for MODEL artifacts (importance
  * tables, codebooks, centroid sets, per-source weight maps): every
  * operator that collects a trained table into a literal/broadcast must
  * go through [[collectBounded]], which caps the transfer with a
  * `limit(max + 1)` BEFORE the collect — the driver never holds more
  * than `max + 1` rows even when the guard fires — and fails LOUD on
  * exceedance instead of letting a degenerate vocabulary OOM the driver
  * silently (r17 verdict item 2: `Sampling.collectImportance` pulled a
  * vocab-bounded table with no bound enforced anywhere).
  *
  * The caps are per-site contracts, not tuning: each site passes the
  * bound its own scaladoc already promises (vocab-sized, k-sized,
  * dim²-sized…), so the guard binds exactly when the promise breaks.
  * Guide §5: the driver should do almost no data work — a model
  * collect is legitimate only while the model is small; past the cap
  * the caller needs the table-valued formulation instead.
  *
  * NOTE `limit` inserts a GlobalLimit over the model subtree; every
  * guarded site collects an unordered set (the consumers `.toMap`,
  * sort driver-side, or index by key), so the limit cannot change
  * which VALUES a sub-cap table yields — only over-cap tables are
  * affected, and those now fail instead of transferring.
  */
private[graft] object DriverModel {

  /** Default cap: generous for every legitimate model in the engine
    * (the largest, DSIR's gram-importance table, is ~10⁵ at bench SFs
    * and production DSIR hashes grams into 10⁴ buckets) while far
    * under driver-OOM territory.
    */
  val DefaultMaxRows: Int = 4000000

  def collectBounded(
      df: DataFrame, site: String,
      maxRows: Int = DefaultMaxRows): Array[Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$site: driver-collected model table exceeds $maxRows rows — " +
        "refusing to materialize a corpus-scale table on the driver; " +
        "use the table-valued (DataFrame) formulation instead")
    rows
  }
}
