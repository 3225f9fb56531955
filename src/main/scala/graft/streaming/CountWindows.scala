package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tumbling count windows — reference `windowByCount` /
  * `grouped` (Node.scala:276-280, Stream.scala:230-256) in its scalable,
  * keyed form: a per-key buffer of up to `size` elements held in the
  * state store, emitted as a full batch when it fills (SURVEY §2.3: "a
  * buffer of n per key" via flatMapGroupsWithState).
  *
  * State is bounded by construction (≤ size elements per key); at
  * 100 TB, keys distribute across executors and the state store
  * (RocksDB-backed in production) holds only open buffers. The
  * reference's final partial window (emitted at end-of-stream) has no
  * streaming equivalent — an unbounded stream never ends — so partial
  * buffers surface only via [[flush]] in batch mode.
  */
object CountWindows {

  final case class Buffer[T](elems: Seq[T])

  def perKey[K, T](
      ds: Dataset[T],
      size: Int,
      keyFn: T => K)(implicit
      ek: Encoder[K],
      et: Encoder[T],
      eb: Encoder[Buffer[T]],
      eo: Encoder[(K, Seq[T])]): Dataset[(K, Seq[T])] = {
    require(size > 0, s"count window size must be > 0, got $size")
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Buffer[T], (K, Seq[T])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, values: Iterator[T], state: GroupState[Buffer[T]]) =>
          val buf = state.getOption.map(_.elems).getOrElse(Seq.empty)
          val all = buf ++ values
          val full = all.grouped(size).toSeq
          val (complete, partial) =
            full.partition(_.size == size)
          if (partial.isEmpty) state.remove()
          else state.update(Buffer(partial.head))
          complete.iterator.map(w => (key, w))
      }
  }

  /** Batch-mode equivalent including final partial windows per key —
    * the reference's end-of-stream behavior (final partial window
    * emitted, Stream.scala:230-256).
    */
  def perKeyBatch[K, T](
      ds: Dataset[T],
      size: Int,
      keyFn: T => K)(implicit
      ek: Encoder[K],
      eo: Encoder[(K, Seq[T])]): Dataset[(K, Seq[T])] = {
    require(size > 0, s"count window size must be > 0, got $size")
    ds.groupByKey(keyFn)
      .flatMapGroups((key: K, values: Iterator[T]) =>
        values.grouped(size).map(w => (key, w.toSeq)))
  }
}
