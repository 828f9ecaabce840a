package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One per-user cumulative snapshot emitted at each microbatch the user
  * appears in: this batch's row count plus the RUNNING totals carried
  * in the operator's keyed state. */
final case class UserTotals(
    user_id: Long,
    batch_rows: Long,
    n_events: Long,
    sum_value_c: Long)

/**
 * Spark 4's arbitrary-state API (`transformWithState` /
 * [[StatefulProcessor]]) exercised on the running-totals shape — the
 * modern replacement for `mapGroupsWithState`'s single-blob state:
 * named, individually-evolvable state variables (here one
 * `ValueState[(n, sum)]`), explicit TTL config, and timer support,
 * backed by the RocksDB state store.
 *
 * Exact integer state (values scaled to 1e-4 units upstream), so the
 * cumulative snapshots replay closed-form in SQL. State per key is two
 * longs — the 100 TB shape: the store carries |users| × 16 bytes, and
 * each microbatch touches only the keys it contains.
 */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Long), UserTotals] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[UserTotals] = {
    var batchRows = 0L
    var batchSum = 0L
    rows.foreach { case (_, vc) =>
      batchRows += 1L
      batchSum += vc
    }
    val (prevN, prevS) =
      if (totals.exists()) totals.get() else (0L, 0L)
    val (nextN, nextS) = (prevN + batchRows, prevS + batchSum)
    totals.update((nextN, nextS))
    Iterator.single(UserTotals(key, batchRows, nextN, nextS))
  }
}

object TransformWithStateOps {

  /** Running per-user totals over a stream of (user_id, value_c) rows —
    * one [[UserTotals]] snapshot per (user, batch) pair. */
  def runningTotals(rows: Dataset[(Long, Long)]): Dataset[UserTotals] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
