package graft

/** Operator library conventions.
  *
  * == Diamond-persist contract ==
  *
  * Several operators persist an intermediate that multiple downstream
  * stages of the SAME returned plan read (shingle tables, per-doc gram
  * counts, survivor pair lists, cleaned-corpus pivots): without the
  * persist the shared subtree recomputes once per consumer — measured
  * 2–6× on the ScaleProbe rows — and `ReuseExchange` cannot dedupe the
  * cases where the consumers hash on different keys. Those blocks stay
  * alive as long as the RETURNED DataFrame may still be re-executed, so
  * the operator cannot safely unpersist them itself; the CALLER owns
  * cleanup. Library callers invoking these operators repeatedly in one
  * session should drop finished intermediates via
  * `spark.catalog.clearCache()` (or [[graft.GraftSession.dropAllBlocks]],
  * which also reaps localCheckpoint blocks) once the operator's result
  * has been fully consumed — exactly what the bench harness does
  * between queries. Operators whose results are driver-materialized
  * before returning (e.g. [[graft.operators.Tokenizer.bpeTrainMerges]])
  * release their own blocks instead, because no returned plan can
  * re-read them.
  */
package object operators
