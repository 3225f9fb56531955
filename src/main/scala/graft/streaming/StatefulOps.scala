package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Custom keyed state beyond windows — the `mapGroupsWithState` face of
  * SURVEY §2.6's streaming row (CountWindows covers the
  * flatMapGroupsWithState face). State per key is one scalar — bounded
  * by construction.
  */
object StatefulOps {

  /** Running per-key maximum: every batch emits the max seen so far for
    * keys present in the batch.
    */
  def runningMax[K](ds: Dataset[(K, Double)])(implicit
      ek: Encoder[K], eo: Encoder[(K, Double)],
      et: Encoder[Double]): Dataset[(K, Double)] =
    ds.groupByKey(_._1)
      .mapGroupsWithState[Double, (K, Double)](
        GroupStateTimeout.NoTimeout()) {
        (key: K, values: Iterator[(K, Double)], state: GroupState[Double]) =>
          val batchMax = values.map(_._2).max
          val newMax = state.getOption.fold(batchMax)(math.max(_, batchMax))
          state.update(newMax)
          (key, newMax)
      }

  /** Running per-key (count, max) through `transformWithState`
    * (SPARK-40434, the Spark 4 successor to `mapGroupsWithState`):
    * explicit named `ValueState` on the handle, composable with more
    * state variables / timers / TTL, and backed by the RocksDB state
    * store (the provider the API requires — changelog-checkpointed,
    * state no longer bounded by executor heap). Count and max are
    * order-insensitive, so the last emission per key equals the
    * relational aggregate regardless of batch slicing (the s09
    * argument).
    */
  private class RunningStatsProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("stats",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, mx) =
        if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
      rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
      st.update((n, mx))
      Iterator.single((key, n, mx))
    }
  }

  /** (user, value) stream → (user, running n, running max) per batch. */
  def runningStats(
      ds: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaDouble))

  /** Inactivity sessionization built from the raw stateful primitives —
    * `ListState` buffering + EVENT-TIME TIMERS — instead of
    * `session_window` (which s07 uses): each user's events buffer in
    * list state; every batch re-arms one timer at `last event + gap`;
    * the timer fires once the watermark passes it, at which point the
    * buffered run is split on `gap` boundaries and every session emits
    * (all are closed: the split points by definition, the tail because
    * the watermark passed `last + gap`). Users still active at the
    * final watermark keep their buffer and emit nothing — exactly the
    * ADR-0006 "no end-of-stream flush" rule, and exactly what
    * `session_window` + append mode produces, which is why s14 shares
    * s07's oracle.
    *
    * State per user is one buffered (quiet) session run + one timer —
    * watermark-bounded, RocksDB-backed; the sum replays the engine's
    * decimal-exact policy (Sql.dsum) so emission equals the relational
    * aggregate bit-for-bit.
    */
  private class SessionTimerProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, (Long, Long, Double),
        (Long, Long, Long, Double)] {
    @transient private var buf: ListState[(Long, Double)] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Double)]("buf",
        Encoders.product[(Long, Double)], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Split a time-sorted run on `gap` boundaries. */
    private def splitRuns(events: Array[(Long, Double)])
        : Seq[Seq[(Long, Double)]] = {
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(events.head))
      events.tail.foreach { e =>
        if (e._1 - runs.last.last._1 >= gapMicros)
          runs += scala.collection.mutable.ArrayBuffer(e)
        else runs.last += e
      }
      runs.map(_.toSeq).toSeq
    }

    private def emit(key: Long, ss: Seq[(Long, Double)])
        : (Long, Long, Long, Double) = {
      // Sql.dsum replay: per-value round to DECIMAL(28,6) (exact,
      // order-insensitive), cast the exact sum back to double
      val sum = ss.iterator.map(e => BigDecimal(e._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (key, Math.floorDiv(ss.head._1, 1000000L), ss.size.toLong, sum)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
      // replicate session_window's drop rule: a row is late only when
      // the session it would extend is already closed, i.e. its session
      // END (ts + gap) has passed the watermark — windowed-aggregate
      // late filtering keys on the window-struct end, not the raw ts,
      // so a row less than `gap` late still merges. transformWithState
      // does not filter late rows for us; an un-dropped too-late row
      // would mint a session session_window never emits.
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      val onTime = rows.filter(_._2 + gapMicros > wmMicros)
      val merged = (buf.get().map(e => (e._1, e._2)) ++
        onTime.map(r => (r._2, r._3))).toArray.sortBy(_._1)
      if (merged.isEmpty) return Iterator.empty
      val runs = splitRuns(merged)
      // every non-tail run is already closed: the event that STARTS the
      // next run has ts >= last + gap, and that event's own ts is <= the
      // final watermark — so the split point proves closure. Emit now;
      // only the tail's closure needs the watermark, i.e. the timer.
      val tail = runs.last
      buf.clear()
      tail.foreach(e => buf.appendValue(e))
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      // session_window closes a session iff its end E (micros) ≤ the
      // ms-floored watermark: register at ceil(E/1000) so the ms timer
      // fires under exactly that rule (floor would fire one ms early
      // for sub-ms E — the boundary the shared s07 oracle pins)
      val expiry = tail.last._1 + gapMicros
      val expiryMs = Math.floorDiv(expiry + 999L, 1000L)
      getHandle.registerTimer(expiryMs)
      armed.update(expiryMs)
      runs.init.iterator.map(emit(key, _))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Double)] = {
      val events = buf.get().toArray.sortBy(_._1)
      buf.clear(); armed.clear()
      // the buffer is one gapless run by construction (every input batch
      // re-splits); the fired timer is the watermark's proof it closed
      if (events.isEmpty) Iterator.empty
      else splitRuns(events).iterator.map(emit(key, _))
    }
  }

  /** (user, event-time micros, value) stream → watermark-closed
    * inactivity sessions (user, session_start_sec, n, sum_value).
    */
  def timerSessions(ds: Dataset[(Long, Long, Double)],
      gapMicros: Long): Dataset[(Long, Long, Long, Double)] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new SessionTimerProcessor(gapMicros),
        TimeMode.EventTime(), OutputMode.Append())(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaDouble))

  /** Per-key token-budget ADMISSION — the quota face of keyed state
    * (running aggregation is s09, sessionization s07/s14, count windows
    * c06): each key admits documents while its cumulative token count
    * is under `budget`, and every document emits exactly once with its
    * EXCLUSIVE start offset and the verdict — the streaming form of
    * [[graft.operators.Sampling.capSourceTokens]]'s window.
    *
    * State per key is ONE long (tokens seen so far) — bounded by
    * construction, no watermark needed (the quota is over all time).
    * `flatMapGroupsWithState` rather than `mapGroupsWithState` because
    * a batch emits one row PER DOCUMENT, not per key. Within a batch
    * the group's rows sort by doc_id before offsets assign (the
    * micro-batch iterator order is not contractual); ACROSS batches
    * offsets follow arrival order, so the result equals the batch
    * window exactly iff the caller's arrival order is id order per key
    * (contiguous id-range staging — the s25 setup). The per-group sort
    * buffers one key's slice of ONE micro-batch (admission control sits
    * behind a bounded ingest trigger; this is the asyncBoundary
    * maxFilesPerTrigger shape, not a corpus-sized buffer).
    *
    * Input (source, doc_id, n_tokens); output (doc_id, source,
    * n_tokens, start_off, kept).
    */
  /** Running one-sided CUSUM (Page) path per key: emits every event's
    * statistic S_i = max(0, S_{i−1} + x_i − k) in integer micro-units.
    * ORDER-SENSITIVE, unlike [[runningMax]]/[[tokenQuota]]'s
    * order-insensitive aggregates: the caller must deliver batches in
    * event-time order (contiguous ts-range arrival slices — the s25
    * staging pattern), and within each batch the group sorts by
    * (ts, event_id) before folding. State is ONE long per key (the
    * carried statistic) regardless of stream length — the
    * bounded-state contract that makes this run forever.
    *
    * Input (key, tsMicros, event_id, xMicro); output the same row with
    * the statistic appended.
    */
  def cusumPath(
      ds: Dataset[(String, Long, Long, Long)],
      kMicro: Long): Dataset[(String, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[Long]) =>
          var s = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(r => (r._2, r._3))
            .map { case (key, ts, id, x) =>
              s = math.max(0L, s + x - kMicro)
              (key, ts, id, s)
            }
          state.update(s)
          out.iterator
      }
  }

  def tokenQuota(
      ds: Dataset[(String, Long, Int)],
      budget: Long): Dataset[(Long, String, Int, Long, Boolean)] = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, String, Int, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Int)],
            state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(_._2).map { case (src, id, nt) =>
            val row = (id, src, nt, off, off < budget)
            off += nt
            row
          }
          state.update(off)
          out.iterator
      }
  }
}
