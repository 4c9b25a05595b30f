package graft.stream

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** `StatefulProcessor` for the per-user interest vector (ST5) on the
  * transformWithState API: state = (interest vector, events seen), F9
  * blend folded in (ts, itemId) order per batch — identical semantics to
  * the `flatMapGroupsWithState` path in [[StreamOps.interestStream]].
  */
class InterestProcessor(dim: Int, lambda: Double)
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
    Iterator.single(UserInterest(key, u, n))
  }
}
