package graft.streaming

import graft.schema.GSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Structured-Streaming re-expressions of the validation + pipeline
  * operators. A streaming DataFrame goes through the SAME validator
  * plan as batch (coerce + conjunctive filter are stateless narrow
  * transforms), so one schema definition serves both runtimes — the
  * reference's "define once, validate everywhere" promise, extended to
  * streams.
  */
object StreamOps extends Serializable {

  /** Filter-mode validation of a stream: coercion + one conjunctive
    * predicate. Stateless → any output mode, no watermark needed. */
  def validateStream(stream: DataFrame, schema: GSchema): DataFrame =
    schema.validator.filterValid(stream)

  /** Watermarked tumbling-window counts (the streaming twin of the
    * batch `window_tumbling` query). */
  def tumblingCounts(stream: DataFrame, tsCol: String, window: String,
      watermark: String, keyCol: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(F.window(F.col(tsCol), window), F.col(keyCol))
      .agg(F.count(F.lit(1)).as("n"))
      .select(
        F.col("window.start").as("win_start"),
        F.col(keyCol), F.col("n"))

  /** Stateful streaming exact-dedup: state is bounded by the watermark
    * horizon (dropDuplicates keeps one state entry per key until the
    * event-time watermark passes it). */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  // ---- custom state: gap-based streaming sessionization ----

  case class SessionInput(userId: Long, ts: java.sql.Timestamp)
  /** sessionStart/lastSeen are epoch MICROS (not millis): Timestamp
    * carries micros in its nanos field, and `.getTime` alone would
    * truncate them — session boundaries must be micro-exact to agree
    * with the batch sessionizer. */
  case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)
  case class SessionOut(userId: Long, sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp, nEvents: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom-state streaming sessionization via flatMapGroupsWithState:
    * a session closes when the next event for the key arrives after
    * `gap`, or when the event-time watermark passes lastSeen+gap
    * (EventTimeTimeout — watermark-driven, so idle keys don't spin
    * empty micro-batches the way processing-time timeouts do). Per-key
    * state is one small struct — bounded regardless of stream length. */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessionInput],
      gapMs: Long, watermarkDelay: String = "10 minutes"): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[SessionInput],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val gapUs = gapMs * 1000L
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, microsTs(s.sessionStart),
          microsTs(s.lastSeen), s.nEvents))
      } else {
        val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = tsMicros(e.ts)
          cur match {
            case Some(s) if t - s.lastSeen <= gapUs =>
              // a late-but-in-gap event must never move the session
              // boundaries backward (lastSeen regressing would wrongly
              // split later events into a new session)
              cur = Some(s.copy(
                sessionStart = math.min(s.sessionStart, t),
                lastSeen = math.max(s.lastSeen, t),
                nEvents = s.nEvents + 1))
            case Some(s) => // gap exceeded: close and start fresh
              closed ::= SessionOut(userId, microsTs(s.sessionStart),
                microsTs(s.lastSeen), s.nEvents)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout API is epoch-millis; floor keeps it ≤ the exact
          // micro deadline (fires one ms early at worst — callers that
          // compare against batch apply a margin anyway)
          state.setTimeoutTimestamp(Math.floorDiv(s.lastSeen, 1000L) + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  // ---- transformWithState (arbitrary-state v2): ordered balance replay ----

  case class BalIn(userId: Long, ts: java.sql.Timestamp, eventId: Long,
      deltaMicro: Long)
  case class BalEv(tsUs: Long, eventId: Long, deltaMicro: Long)
  case class BalOut(userId: Long, nEvents: Long, finalMicro: Long,
      minMicro: Long, nDips: Long)
  /** Running trajectory carried across flushes so each emission is the
    * CUMULATIVE summary, not a per-segment partial: continuing a replay
    * needs exactly (balance, min-so-far, dips-so-far, count) — the dip
    * test for the next event only needs the previous balance, which IS
    * `bal`. Makes multi-emission (events straddling micro-batches with
    * a >flush-delay gap) converge to the same final row; consumers keep
    * the max-nEvents emission per key. */
  case class BalCarry(bal: Long, mn: Long, dips: Long, n: Long)

  /** Spark 4 `StatefulProcessor` for ordered running-balance replay —
    * the transformWithState (state v2, RocksDB-backed) counterpart of
    * [[transitionsStream]]'s flatMapGroupsWithState buffer-and-flush:
    * events buffer in a ListState across micro-batches; an event-time
    * timer keyed to the key's LAST event + flushDelay fires once the
    * watermark passes it, replaying the buffer in exact (ts, tie) order
    * and emitting the balance trajectory summary (final / min /
    * dips-below-zero). ListState + ValueState + per-key timers are the
    * v2 API surface this operator exists to exercise; state is bounded
    * by the flush horizon exactly like the v1 twin. */
  private class BalanceProcessor(flushDelayMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BalIn, BalOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ListState, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var buf: ListState[BalEv] = _
    @transient private var armed: ValueState[Long] = _
    @transient private var carry: ValueState[BalCarry] = _

    override def init(outputMode: streaming.OutputMode,
        timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[BalEv]("buf", Encoders.product[BalEv],
        TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
      // 4 longs per user, bounded by key cardinality like any per-key
      // aggregate (production would add a TTL for retired users)
      carry = getHandle.getValueState[BalCarry]("carry",
        Encoders.product[BalCarry], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[BalIn],
        timerValues: streaming.TimerValues): Iterator[BalOut] = {
      val added = rows.map(e =>
        BalEv(tsMicros(e.ts), e.eventId, e.deltaMicro)).toArray
      if (added.nonEmpty) {
        buf.appendList(added)
        val maxMs = added.iterator
          .map(e => Math.floorDiv(e.tsUs, 1000L)).max
        val want = maxMs + flushDelayMs
        val prev = Option(armed.get()).getOrElse(0L)
        if (want > prev) { // re-arm to the later deadline
          if (prev > 0L) getHandle.deleteTimer(prev)
          getHandle.registerTimer(want)
          armed.update(want)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
        timerValues: streaming.TimerValues,
        expiredTimerInfo: streaming.ExpiredTimerInfo): Iterator[BalOut] = {
      val evs = buf.get().toSeq.sortBy(e => (e.tsUs, e.eventId))
      buf.clear(); armed.clear()
      if (evs.isEmpty) Iterator.empty
      else {
        // resume from the carried trajectory: emissions are cumulative,
        // so a key flushed twice (events straddling a micro-batch
        // boundary with a >flush-delay gap) emits a superseded row and
        // then the complete one — never two divergent partials
        val c0 = Option(carry.get()).getOrElse(BalCarry(0L, 0L, 0L, 0L))
        var bal = c0.bal; var mn = c0.mn; var dips = c0.dips
        var prev = bal
        evs.foreach { e =>
          prev = bal; bal += e.deltaMicro
          if (bal < mn) mn = bal
          if (bal < 0 && prev >= 0) dips += 1
        }
        val n = c0.n + evs.size.toLong
        carry.update(BalCarry(bal, mn, dips, n))
        Iterator.single(BalOut(key, n, bal, mn, dips))
      }
    }
  }

  /** Ordered balance replay over an out-of-order stream via
    * transformWithState — see [[BalanceProcessor]]. Requires the
    * RocksDB state store provider (set by the caller; state v2 does
    * not run on the default HDFS-backed store). */
  def balanceStream(events: org.apache.spark.sql.Dataset[BalIn],
      flushDelayMs: Long, watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.Dataset[BalOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .transformWithState(new BalanceProcessor(flushDelayMs),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[BalOut])
  }

  // ---- custom state: watermark-ordered transition replay ----

  case class TransIn(userId: Long, ts: java.sql.Timestamp, eventId: Long,
      eventType: String)
  case class TransEv(tsUs: Long, eventId: Long, typ: String)
  case class TransBufState(events: List[TransEv])
  case class TransOut(userId: Long, src: String, dst: String)

  /** Ordered-replay transition extraction from an out-of-order stream:
    * per-key events buffer until the key's flush timeout (last event +
    * `flushDelayMs`) passes the event-time watermark, then replay in
    * exact (ts, tie) order and emit consecutive (src → dst) pairs —
    * the CDC/clickstream pattern where correctness requires total
    * per-key order that arrival order does not provide.
    *
    * State is the buffered event list — bounded by the flush horizon
    * (watermark + flushDelay) on an infinite stream, because a key
    * flushes (and clears) once it goes quiet for the flush delay; a
    * key that never goes quiet would need incremental emission below
    * the watermark instead (the sessionizer's strategy). Keys still
    * open when an AvailableNow run ends stay unemitted — callers'
    * oracles exclude keys whose last event is inside the flush+
    * watermark horizon, same discipline as the sessionizer. */
  def transitionsStream(events: org.apache.spark.sql.Dataset[TransIn],
      flushDelayMs: Long, watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.Dataset[TransOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[TransIn],
        state: GroupState[TransBufState]): Iterator[TransOut] = {
      if (state.hasTimedOut) {
        val evs = state.get.events.sortBy(e => (e.tsUs, e.eventId))
        state.remove()
        evs.sliding(2).collect {
          case List(a, b) => TransOut(userId, a.typ, b.typ)
        }
      } else {
        val added = rows.map(e =>
          TransEv(tsMicros(e.ts), e.eventId, e.eventType)).toList
        val all = state.getOption.map(_.events).getOrElse(Nil) ::: added
        state.update(TransBufState(all))
        // timeout keys off the key's LAST event (ms floor, like the
        // sessionizer): fires once the watermark passes it + the delay
        val maxMs = all.iterator.map(e => Math.floorDiv(e.tsUs, 1000L)).max
        state.setTimeoutTimestamp(maxMs + flushDelayMs)
        Iterator.empty
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
