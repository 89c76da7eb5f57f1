package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators over the generic event stream (the
  * `events` table shape) — the engine's non-OSM streaming surface:
  * watermarked windowed aggregation and custom per-key session state via
  * flatMapGroupsWithState.
  *
  * Scale notes: both operators shuffle on their grouping key once; state
  * (open windows / open sessions) lives in the state store, sized by
  * distinct active keys, and the watermark bounds it — late events beyond
  * 10 minutes are dropped, closed sessions are freed by the event-time
  * timeout.
  */
object EventsStream {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class SessionAcc(
      startMs: Long, lastMs: Long, nEvents: Long, totalValue: Double)

  final case class Session(
      user_id: Long,
      start_ms: Long,
      end_ms: Long,
      n_events: Long,
      total_value: Double)

  /** Tumbling 5-minute counts per event type, 10-minute watermark. */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Exactly-once-per-id event feed: duplicate deliveries of the same
    * event_id (at-least-once sources, replayed partitions) are suppressed as
    * long as they arrive within the watermark. State is one entry per id
    * seen in the last 10 minutes — bounded by throughput × watermark, freed
    * by watermark advance, unlike an unbounded dropDuplicates.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment + per-dimension windowed rollup: each
    * micro-batch broadcast-joins the (small) dimension — no stream-side
    * join state, no shuffle of the stream beyond the windowed aggregate's
    * own grouping — then aggregates value per (window, dimension
    * attribute). Caveat worth knowing: a PLAIN-parquet static side pins
    * its file listing at plan time, so overwriting the path mid-query
    * fails the scan rather than refreshing the dimension — a live
    * slowly-changing dimension needs a snapshot-isolated table format or
    * a foreachBatch that re-reads the frame per batch.
    */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame,
      dimKey: String = "user_id", attr: String = "segment"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim.select(col(dimKey), col(attr))), Seq(dimKey))
      .groupBy(window(col("ts"), "5 minutes"), col(attr))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col(attr),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join (click attribution): each click pairs with
    * the same user's views in the preceding `windowMinutes`. Both sides are
    * watermarked and the join condition bounds event time in BOTH
    * directions, so the state store retains only watermark + window worth
    * of rows per side — the unbounded-state trap of an unconstrained
    * stream-stream join is exactly what the interval predicate avoids. With
    * `joinType = "left_outer"`, clicks with no view emit a null-view row
    * once the watermark proves no match can still arrive.
    *
    * Scale note: the join shuffles both sides on user_id once; state size
    * is throughput × (watermark + window), independent of stream length.
    */
  def clickViewAttribution(events: DataFrame, windowMinutes: Int = 10,
      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") -
            expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(col("click_id"), col("c_user").as("user_id"), col("click_ts"),
        col("click_value"), col("view_id"), col("view_ts"))
  }

  /** Gap-based sessionization (default 30 min): a session closes when the
    * watermark passes its last event + gap; closed sessions are emitted in
    * Append mode and their state is freed. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.lastMs, s.nEvents, s.totalValue))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var acc = state.getOption
            for (e <- events) {
              val t = e.ts.getTime
              acc match {
                case Some(a) if t - a.lastMs <= gapMs =>
                  // min() the start too: a late event inside the watermark
                  // may precede the session's current first event
                  acc = Some(a.copy(startMs = math.min(a.startMs, t),
                    lastMs = math.max(a.lastMs, t),
                    nEvents = a.nEvents + 1, totalValue = a.totalValue + e.value))
                case Some(a) =>
                  closed += Session(userId, a.startMs, a.lastMs, a.nEvents, a.totalValue)
                  acc = Some(SessionAcc(t, t, 1, e.value))
                case None =>
                  acc = Some(SessionAcc(t, t, 1, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** The same gap sessionization on the transformWithState API (Spark 4's
    * arbitrary-state successor to flatMapGroupsWithState): typed ValueState
    * plus an explicit event-time timer per open session, re-armed on every
    * update. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * RocksDBStateStoreProvider) — which is also the 100 TB answer: state
    * lives off-heap with changelog checkpointing instead of in executor
    * memory. Output is identical to `sessionize` on the same input.
    */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60L * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class TypeUsers(event_type: String, n_users: Long)

  /** Running distinct-user count per event type on transformWithState's
    * composite state: a MapState holds the membership set (point lookups
    * and inserts — never materialized as one blob, which is what makes a
    * large per-key set viable on the RocksDB store) and a ValueState
    * carries the count so emitting never iterates the map. Update-mode
    * output: one refreshed (type, n_users) row per batch that changed it.
    */
  def distinctUsersPerType(events: Dataset[Event]): Dataset[TypeUsers] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new DistinctUsersProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  private class DistinctUsersProcessor
      extends StatefulProcessor[String, Event, TypeUsers] {
    @transient private var seen: MapState[Long, Boolean] = _
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[Long, Boolean]("seen",
        Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      count = getHandle.getValueState[Long]("count",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(eventType: String, rows: Iterator[Event],
        tv: TimerValues): Iterator[TypeUsers] = {
      var n = if (count.exists()) count.get() else 0L
      var changed = false
      rows.foreach { e =>
        if (!seen.containsKey(e.user_id)) {
          seen.updateValue(e.user_id, true)
          n += 1
          changed = true
        }
      }
      if (changed) {
        count.update(n)
        Iterator.single(TypeUsers(eventType, n))
      } else Iterator.empty
    }
  }

  final case class Recent(user_id: Long, recent_ids: Seq[Long])

  /** Rolling last-N event history per user on ListState — the online
    * feature-store shape ("user's last 3 actions") kept incrementally:
    * append the batch's events in (ts, id) order, trim to N, emit the
    * refreshed window in Update mode. ListState stores elements
    * individually (append is O(1) on RocksDB, no read-modify-write of one
    * blob) — with ValueState and MapState elsewhere in this file, all
    * three transformWithState state types are exercised.
    */
  def recentEventsPerUser(events: Dataset[Event], n: Int = 3): Dataset[Recent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }

  private class RecentProcessor(n: Int)
      extends StatefulProcessor[Long, Event, Recent] {
    @transient private var hist: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[Long]("hist",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Recent] = {
      val incoming = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_id)
      val cur = (if (hist.exists()) hist.get().toSeq else Seq.empty) ++ incoming
      val trimmed = cur.takeRight(n)
      hist.put(trimmed.toArray)
      Iterator.single(Recent(userId, trimmed))
    }
  }

  final case class Burst(user_id: Long, burst_n: Long)

  /** TTL'd per-user activity counter — the online-feature-store cache
    * shape: a ValueState configured with a processing-time TTL so idle
    * keys EVICT THEMSELVES instead of accumulating forever. While a user
    * keeps arriving within the TTL the running count grows; once the TTL
    * elapses with no update the slot expires on the store side and the
    * next event restarts the count at its batch size. This exercises the
    * remaining transformWithState state feature beside Value/Map/List
    * state and event-time timers: TTLConfig-driven eviction, which is
    * what bounds state by (keys active within TTL) rather than stream
    * lifetime when there is no watermark to do it.
    */
  def burstCountPerUser(events: Dataset[Event],
      ttl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[Burst] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new BurstProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  private class BurstProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Event, Burst] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Burst] = {
      val cur = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(cur)
      Iterator.single(Burst(userId, cur))
    }
  }

  /** Per-user session state machine for [[sessionizeTws]]. One ValueState
    * slot + one armed timer per open session; the timer fires when the
    * watermark passes last event + gap, emitting and freeing the session.
    */
  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var state: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAcc]("session",
        Encoders.product[SessionAcc], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Session] = {
      val events = rows.toSeq.sortBy(_.ts.getTime)
      val closed = Seq.newBuilder[Session]
      var acc = if (state.exists()) Some(state.get()) else None
      val prevTimer = acc.map(_.lastMs + gapMs)
      for (e <- events) {
        val t = e.ts.getTime
        acc match {
          case Some(a) if t - a.lastMs <= gapMs =>
            acc = Some(a.copy(startMs = math.min(a.startMs, t),
              lastMs = math.max(a.lastMs, t),
              nEvents = a.nEvents + 1, totalValue = a.totalValue + e.value))
          case Some(a) =>
            closed += Session(userId, a.startMs, a.lastMs, a.nEvents, a.totalValue)
            acc = Some(SessionAcc(t, t, 1, e.value))
          case None =>
            acc = Some(SessionAcc(t, t, 1, e.value))
        }
      }
      acc.foreach { a =>
        state.update(a)
        val next = a.lastMs + gapMs
        prevTimer.filter(_ != next).foreach(getHandle.deleteTimer)
        if (!prevTimer.contains(next)) getHandle.registerTimer(next)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      // a stale timer (session extended after it was armed) just no-ops:
      // the live timer for lastMs + gap is still pending
      if (state.exists()) {
        val a = state.get()
        if (a.lastMs + gapMs <= info.getExpiryTimeInMs) {
          state.clear()
          Iterator.single(Session(userId, a.startMs, a.lastMs, a.nEvents, a.totalValue))
        } else Iterator.empty
      } else Iterator.empty
    }
  }
}
