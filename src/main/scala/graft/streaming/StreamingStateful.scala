package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing via Spark 4's `transformWithState` —
  * the successor API to flatMapGroupsWithState (typed state handles,
  * per-state TTL, timers) and the one designed for the RocksDB state
  * store, where per-key state lives off-heap and scales past executor
  * memory — the 100 TB answer to "my keyed state doesn't fit".
  *
  * The demo operator keeps a per-key running (count, sum) in a
  * ValueState and emits the updated totals each micro-batch — the
  * canonical incremental-aggregate shape. Correctness contract: after
  * any prefix of batches, the latest emission per key equals the batch
  * aggregate over the same input (StreamingStatefulSpec pins this
  * stream==batch equivalence, the same pattern the other streaming
  * twins use).
  *
  * State discipline at scale: one fixed-size value per key (two
  * longs), no per-row retention; a TTL (`TTLConfig`) can bound
  * abandoned keys' lifetime — passed through so deployments evict
  * cold keys without code changes.
  */
object StreamingStateful {

  /** Per-key running totals: (key, running n, running sum). */
  final class RunningTotals(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, v) => n += 1; sum += v }
      totals.update((n, sum))
      Iterator.single((key, n, sum))
    }
  }

  /** Wire the processor over a keyed stream of (key, value) pairs.
    * Emits in Update mode: one row per key per batch it appeared in,
    * carrying the running totals so far.
    */
  def runningTotals(input: Dataset[(Long, Long)],
                    ttl: TTLConfig = TTLConfig.NONE): Dataset[(Long, Long, Long)] = {
    import input.sparkSession.implicits._
    input.groupByKey(_._1)
      .transformWithState(new RunningTotals(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
