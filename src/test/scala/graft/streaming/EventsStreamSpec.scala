package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import graft.streaming.EventsStream.{Event, Session}

class EventsStreamSpec extends SparkSpecBase {

  // +1h base: an event at exactly epoch 0 sits on the initial watermark
  // boundary and is discarded as late (ts <= watermark)
  private val base = 3600L * 1000L
  private def ts(minute: Int) = new Timestamp(base + minute * 60L * 1000L)

  test("watermarked windowed counts per event type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.windowedTypeCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(1), 2, "view", 2.0),
      Event(3, ts(2), 1, "purchase", 10.0),
      Event(4, ts(7), 1, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    input.addData(Event(5, ts(60), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts")
      .selectExpr("cast(window_start as long) ws", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = base / 1000
    assert(rows.contains((b, "view", 2L, 3.0)), rows.toString)
    assert(rows.contains((b, "purchase", 1L, 10.0)))
    assert(rows.contains((b + 5 * 60L, "view", 1L, 3.0)))
  }

  test("stream-static enrichment joins the broadcast dimension per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimPath = java.nio.file.Files.createTempDirectory("seg-dim").toString
    Seq((1L, "gold"), (2L, "free")).toDF("user_id", "segment")
      .write.mode("overwrite").parquet(dimPath)
    val input = MemoryStream[Event]
    val q = EventsStream.enrichedSegmentCounts(
        input.toDF(), spark.read.parquet(dimPath))
      .writeStream.format("memory").queryName("seg_counts")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(1), 2, "view", 2.0),
      Event(3, ts(2), 1, "purchase", 10.0))
    q.processAllAvailable()
    input.addData(Event(4, ts(7), 2, "view", 5.0)) // second batch, window 2
    q.processAllAvailable()
    input.addData(Event(5, ts(60), 9, "view", 0.0)) // close the windows
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("seg_counts")
      .selectExpr("cast(window_start as long) ws", "segment", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = base / 1000
    // user 9 has no dimension row → dropped by the inner join
    assert(rows == Set(
      (b, "gold", 2L, 11.0),
      (b, "free", 1L, 2.0),
      (b + 5 * 60L, "free", 1L, 5.0)), rows.toString)
  }

  test("watermarked dedup suppresses replayed event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.dedupedEvents(input.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(1, ts(0), 1, "view", 1.0),   // in-batch duplicate delivery
      Event(2, ts(1), 2, "view", 2.0))
    q.processAllAvailable()
    input.addData(
      Event(1, ts(2), 1, "view", 1.0),   // cross-batch replay, inside watermark
      Event(3, ts(3), 1, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("deduped").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
  }

  test("stream-stream interval join pairs clicks with preceding views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.clickViewAttribution(input.toDF(), windowMinutes = 10)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(3), 1, "view", 2.0),
      Event(3, ts(5), 1, "click", 5.0),   // pairs with views 1 and 2
      Event(4, ts(20), 1, "click", 6.0),  // both views > 10 min old: no pair
      Event(5, ts(4), 2, "view", 3.0),
      Event(6, ts(6), 2, "click", 7.0))   // pairs with view 5
    q.processAllAvailable()
    q.stop()

    val pairs = spark.table("attrib")
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 1L), (3L, 2L), (6L, 5L)), pairs.toString)
  }

  test("left-outer interval join emits null-view clicks after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.clickViewAttribution(input.toDF(), windowMinutes = 10,
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(5), 1, "click", 5.0),   // matched
      Event(3, ts(6), 2, "click", 6.0))   // user 2 never views
    q.processAllAvailable()
    // push the watermark past click 3 + window so the join can PROVE no
    // view will arrive and emit the null-padded row. BOTH sides must
    // advance: the global watermark is the MIN over the two withWatermark
    // nodes, so a stalled click side would pin it at zero forever even as
    // views keep flowing (user 8 never views, so its clicks stay pending)
    input.addData(Event(9, ts(120), 9, "view", 0.0),
      Event(11, ts(121), 8, "click", 0.0))
    q.processAllAvailable()
    input.addData(Event(10, ts(240), 9, "view", 0.0),
      Event(12, ts(241), 8, "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib_outer")
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // click 11 also nulls out: the final watermark (230 min, advanced by the
    // trailing no-data micro-batch) passes it too; click 12 stays pending
    assert(rows == Set((2L, 1L), (3L, -1L), (11L, -1L)), rows.toString)
  }

  test("transformWithState sessionization matches the fMGWS operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    // transformWithState requires the RocksDB provider; restore the
    // default afterwards so the other streaming suites keep HDFS state
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventsStream.sessionizeTws(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sessions_tws")
        .outputMode(OutputMode.Append()).start()

      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(5), 1, "view", 2.0),
        Event(3, ts(45), 1, "view", 4.0))
      q.processAllAvailable()
      input.addData(Event(9, ts(200), 2, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(400), 2, "view", 0.0))
      q.processAllAvailable()
      q.stop()

      val sessions = spark.table("sessions_tws").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.start_ms)
      assert(sessions.length == 2, sessions.mkString(", "))
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
      assert(sessions(0).start_ms == base && sessions(0).end_ms == base + 5 * 60000L)
      assert(sessions(1).n_events == 1 && sessions(1).total_value == 4.0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState MapState tracks running distinct users per type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventsStream.distinctUsersPerType(input.toDS())
        .writeStream.format("memory").queryName("type_users")
        .outputMode(OutputMode.Update()).start()

      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 2, "view", 1.0),
        Event(3, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(4, ts(3), 1, "view", 1.0),   // user 1 already counted for view
        Event(5, ts(4), 3, "view", 1.0),   // new view user
        Event(6, ts(5), 1, "click", 1.0))  // no change for click
      q.processAllAvailable()
      q.stop()

      // Update mode: the LAST row per type is the running count
      val last = spark.table("type_users")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(last == Map("view" -> 3L, "click" -> 1L), last.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState ListState keeps the rolling last-3 history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = EventsStream.recentEventsPerUser(input.toDS(), n = 3)
        .writeStream.format("memory").queryName("recent")
        .outputMode(OutputMode.Update()).start()

      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(3, ts(2), 1, "view", 1.0),
        Event(4, ts(3), 1, "view", 1.0),   // 1 falls out of the window
        Event(5, ts(4), 2, "view", 1.0))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("recent").as[EventsStream.Recent].collect()
      val lastPerUser = rows.groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.last.recent_ids.toList }
      assert(lastPerUser == Map(1L -> List(2L, 3L, 4L), 2L -> List(5L)),
        lastPerUser.toString)
      // first batch emitted the pre-trim state for user 1
      assert(rows.exists(r => r.user_id == 1 && r.recent_ids == Seq(1L, 2L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState TTL state survives within TTL, expires past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime mode re-triggers batches continuously (TTL/timer
    // evaluation makes the engine always want another batch), so neither
    // processAllAvailable nor AvailableNow ever settles. Empty batches emit
    // no rows, though — so poll the memory sink until the expected number
    // of OUTPUT rows has landed instead of waiting for stream quiescence.
    def awaitRows(name: String, n: Int): List[Long] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var rows = List.empty[Long]
      while (rows.length < n && System.nanoTime() < deadline) {
        rows = spark.table(name).as[EventsStream.Burst]
          .collect().map(_.burst_n).toList
        if (rows.length < n) Thread.sleep(50)
      }
      rows
    }
    try {
      // long TTL: the count accumulates across batches
      val in1 = MemoryStream[Event]
      val q1 = EventsStream.burstCountPerUser(in1.toDS(),
          java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("burst_long")
        .outputMode(OutputMode.Update()).start()
      in1.addData(Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "view", 1.0))
      assert(awaitRows("burst_long", 1) == List(2L))
      in1.addData(Event(3, ts(2), 1, "view", 1.0))
      assert(awaitRows("burst_long", 2) == List(2L, 3L))
      q1.stop()

      // 1 ms TTL + a real pause: the slot expires on the store side and
      // the count restarts instead of accumulating
      val in2 = MemoryStream[Event]
      val q2 = EventsStream.burstCountPerUser(in2.toDS(),
          java.time.Duration.ofMillis(1))
        .writeStream.format("memory").queryName("burst_short")
        .outputMode(OutputMode.Update()).start()
      in2.addData(Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "view", 1.0))
      assert(awaitRows("burst_short", 1) == List(2L))
      Thread.sleep(200)
      in2.addData(Event(3, ts(2), 1, "view", 1.0))
      assert(awaitRows("burst_short", 2) == List(2L, 1L))
      q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("randomized stream: fMGWS and transformWithState sessions agree") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seeded random stream: 5 users, gaps that straddle the 30-min session
    // boundary, delivered in 3 batches + a far-future watermark push
    val rnd = new scala.util.Random(42)
    var id = 0L
    val evs = (1 to 5).flatMap { u =>
      var m = rnd.nextInt(10)
      (1 to 24).map { _ =>
        m += (if (rnd.nextBoolean()) rnd.nextInt(10) else 25 + rnd.nextInt(50))
        id += 1
        Event(id, ts(m), u, "view", rnd.nextInt(10).toDouble)
      }
    }
    val batches = evs.grouped(40).toSeq

    def run(name: String,
        f: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session]): Set[Session] = {
      val input = MemoryStream[Event]
      val q = f(input.toDS()).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Event(900000, ts(100000), 99, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(900001, ts(200000), 99, "view", 0.0))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[Session].collect().filter(_.user_id != 99).toSet
    }

    val viaFmgws = run("sess_rand_fmgws", ds => EventsStream.sessionize(ds))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val viaTws =
      try run("sess_rand_tws", ds => EventsStream.sessionizeTws(ds))
      finally prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    assert(viaFmgws.nonEmpty && viaFmgws == viaTws,
      s"fmgws=${viaFmgws.size} tws=${viaTws.size}\n" +
        s"only fmgws: ${(viaFmgws -- viaTws).take(3)}\n" +
        s"only tws: ${(viaTws -- viaFmgws).take(3)}")
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 5 min apart (one session), then a 40-min gap
    input.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(5), 1, "view", 2.0),
      Event(3, ts(45), 1, "view", 4.0))
    q.processAllAvailable()
    // watermark push: closes the open session via event-time timeout
    input.addData(Event(9, ts(200), 2, "view", 0.0))
    q.processAllAvailable()
    input.addData(Event(10, ts(400), 2, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1).sortBy(_.start_ms)
    assert(sessions.length == 2, sessions.mkString(", "))
    assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    assert(sessions(0).start_ms == base && sessions(0).end_ms == base + 5 * 60000L)
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 4.0)
  }
}
