package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Keyed stateful processors (`transformWithState` `StatefulProcessor`s) —
  * exact-parity ports of the reference's Flink keyed-state patterns
  * (SURVEY.md §2.I): per-key `ValueState` compare-and-set and
  * timer-driven timeout emission. State lives in the partition-local
  * state store; scale-out is by key hash, identical to Flink `keyBy`.
  */
object Processors {

  /** Input row for visit-style processors. */
  case class Visit(userId: Long, date: String, tsMs: Long)

  /** Output: the visit annotated with the first-visit flag. */
  case class VisitOut(userId: Long, date: String, tsMs: Long, isFirst: Boolean)

  /** First-visit detection (reference UV / new-visitor flag: per-user
    * `ValueState<lastVisitDate>` compare-and-set). Key: userId. Emits every
    * visit with `isFirst = date != lastSeenDate`; state stores the last
    * seen date. Same semantics as the Flink pattern, including
    * within-batch ordering by arrival. */
  class FirstVisitProcessor extends StatefulProcessor[Long, Visit, VisitOut] {
    @transient private var lastDate: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastDate = getHandle.getValueState[String]("lastDate", Encoders.STRING,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Visit],
                                 timers: TimerValues): Iterator[VisitOut] = {
      rows.map { v =>
        // strictly-greater compare on the ISO date (lexicographic =
        // chronological): a late out-of-order visit from an EARLIER day
        // must neither flag first nor regress the state, else the next
        // current-day visit double-counts as a new visitor
        val isFirst = !lastDate.exists() || v.date > lastDate.get()
        if (isFirst) lastDate.update(v.date)
        VisitOut(v.userId, v.date, v.tsMs, isFirst)
      }
    }
  }

  /** Order lifecycle input: `kind` ∈ {created, paid}. Carries a real
    * timestamp column so the watermark survives into `groupByKey`. */
  case class OrderEvent(orderId: Long, kind: String, ts: java.sql.Timestamp)

  /** Output: `status` ∈ {paid, timeout}; `tsMs` = event/firing time. */
  case class OrderOut(orderId: Long, status: String, tsMs: Long)

  /** Payment-timeout detection (reference order-payment timeout via Flink
    * event-time timers). On `created`: arm an event-time timer at
    * created.ts + timeoutMs. On `paid` before the timer: emit `paid`,
    * disarm. When the watermark passes the timer with no payment: emit
    * `timeout`. Requires TimeMode.EventTime and a watermarked input. */
  class PaymentTimeoutProcessor(timeoutMs: Long)
      extends StatefulProcessor[Long, OrderEvent, OrderOut] {
    @transient private var createdTs: ValueState[Long] = _
    @transient private var settled: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      createdTs = getHandle.getValueState[Long]("createdTs", Encoders.scalaLong,
        TTLConfig.NONE)
      settled = getHandle.getValueState[Boolean]("settled", Encoders.scalaBoolean,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[OrderEvent],
                                 timers: TimerValues): Iterator[OrderOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[OrderOut]
      rows.foreach { e =>
        e.kind match {
          case "created" =>
            // the settled marker makes paid-before-created (out-of-order
            // within the watermark) and duplicate-created replays safe:
            // a settled order never re-arms a timer
            if (!settled.exists()) {
              // duplicate created: disarm the previous deadline first so
              // the stale timer cannot fire a premature timeout
              if (createdTs.exists()) {
                getHandle.deleteTimer(createdTs.get() + timeoutMs)
              }
              createdTs.update(e.ts.getTime)
              getHandle.registerTimer(e.ts.getTime + timeoutMs)
            }
          case "paid" =>
            if (createdTs.exists()) {
              getHandle.deleteTimer(createdTs.get() + timeoutMs)
              createdTs.clear()
            }
            if (!settled.exists()) {
              settled.update(true)
              out += OrderOut(key, "paid", e.ts.getTime)
            }
          case _ => // ignore unknown kinds (dirty-data guard)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    timer: ExpiredTimerInfo): Iterator[OrderOut] = {
      // only the timer matching the current armed deadline may fire; a
      // stale timer (superseded created) or a settled order emits nothing
      val armed = createdTs.exists() &&
        createdTs.get() + timeoutMs == timer.getExpiryTimeInMs()
      if (armed && !settled.exists()) {
        createdTs.clear()
        settled.update(true)
        Iterator.single(OrderOut(key, "timeout", timer.getExpiryTimeInMs()))
      } else Iterator.empty
    }
  }

  /** Running per-key aggregate with `ValueState` (the reference's keyed
    * `reduce` shape, record-at-a-time): emits the updated running sum for
    * every input row. */
  case class Measure(key: String, value: Double)
  case class RunningOut(key: String, runningSum: Double, n: Long)

  class RunningSumProcessor extends StatefulProcessor[String, Measure, RunningOut] {
    @transient private var acc: ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[(Double, Long)]("acc",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Measure],
                                 timers: TimerValues): Iterator[RunningOut] = {
      var (sum, n) = if (acc.exists()) acc.get() else (0.0, 0L)
      val out = rows.map { m =>
        sum += m.value; n += 1
        RunningOut(key, sum, n)
      }.toVector
      acc.update((sum, n))
      out.iterator
    }
  }
}
