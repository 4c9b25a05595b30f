package graft.stream

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** `StatefulProcessor` for the per-user interest vector (ST5) on the
  * transformWithState API: state = (interest vector, events seen), F9
  * blend folded in (ts, itemId) order per batch — identical semantics to
  * the `flatMapGroupsWithState` path in [[StreamOps.interestStream]].
  *
  * `idleTimeout` bounds state to O(active users) with EVENT-TIME timers
  * (the API's native analogue of the fMGWS path's `EventTimeTimeout`):
  * every batch re-arms one timer at max(batch ts) + horizon, and
  * [[handleExpiredTimer]] clears the user's state when the watermark
  * passes it — deterministic under replay, and the micro-batch engine
  * quiesces between data batches (a processing-time TTL keeps
  * `shouldRunAnotherBatch` true forever — same livelock as
  * ProcessingTimeTimeout, observed on the fMGWS path). An evicted user
  * re-initializes from zeros per F9 on return.
  */
class InterestProcessor(dim: Int, lambda: Double,
    idleTimeout: Option[java.time.Duration] = None)
    extends StatefulProcessor[Int, EnrichedEvent, UserInterest] {

  @transient private var state: ValueState[(Array[Double], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Array[Double], Long)](
      "interest", Encoders.kryo[(Array[Double], Long)], TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[EnrichedEvent],
      timerValues: TimerValues): Iterator[UserInterest] = {
    val (u0, n0) =
      if (state.exists()) state.get() else (Array.fill(dim)(0.0), 0L)
    val batch = rows.toSeq.sortBy(e => (e.ts, e.itemId))
    val u = batch.foldLeft(u0)((u, e) =>
      StreamOps.blend(u, e.features, e.rating, lambda))
    val n = n0 + batch.size
    state.update((u, n))
    idleTimeout.foreach { d =>
      // one live timer per user: drop the previous one, re-arm at the
      // new horizon (clamped above the watermark for late data)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(
        batch.map(_.ts).max + d.toMillis,
        timerValues.getCurrentWatermarkInMs() + 1))
    }
    Iterator.single(UserInterest(key, u, n))
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[UserInterest] = {
    // idle horizon elapsed with no new events: drop the vector
    state.clear()
    Iterator.empty
  }
}
