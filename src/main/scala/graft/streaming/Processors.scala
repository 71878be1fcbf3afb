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
    * within-batch ordering by arrival.
    *
    * `stateTtl` bounds the per-user state: the user key space is
    * unbounded, so with `TTLConfig.NONE` the store grows forever — give
    * it the replay horizon (a few days: long enough that a user seen
    * within the horizon is never re-flagged, short enough that dormant
    * keys age out). TTL expiry is wall-clock and requires a timed
    * TimeMode — Spark rejects any TTL under `TimeMode.None`, hence the
    * NONE default for the untimed call sites. */
  class FirstVisitProcessor(stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Visit, VisitOut] {
    @transient private var lastDate: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastDate = getHandle.getValueState[String]("lastDate", Encoders.STRING,
        stateTtl)

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

  /** The SAME first-visit semantics on the CLASSIC state API
    * (`flatMapGroupsWithState` + `GroupState`) — the migration-parity
    * surface: most existing Spark jobs run this API, and the engine
    * supports both state backends with identical outputs. Use with
    * `.flatMapGroupsWithState(OutputMode.Append,
    * GroupStateTimeout.NoTimeout())(Processors.firstVisitClassic)`. */
  def firstVisitClassic(key: Long, rows: Iterator[Visit],
                        state: org.apache.spark.sql.streaming.GroupState[String])
      : Iterator[VisitOut] =
    rows.map { v =>
      val isFirst = !state.exists || v.date > state.get
      if (isFirst) state.update(v.date)
      VisitOut(v.userId, v.date, v.tsMs, isFirst)
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
    * `timeout`. Requires TimeMode.EventTime and a watermarked input.
    *
    * State is BOUNDED per key lifecycle: `createdTs` clears on the
    * terminal transition, and the settled marker (`settledAt`, which
    * absorbs duplicate `paid` replays and out-of-order created-after-paid)
    * is cleared by a cleanup timer `settledRetainMs` after the terminal
    * event — the Flink pattern's state.clear() with a replay horizon. On
    * an unbounded order key space the store holds only in-flight orders
    * plus orders settled within the horizon, never all orders ever seen.
    * The trade-off is explicit: an event for a key replayed LATER than
    * the retain horizon is treated as a new lifecycle (default horizon =
    * timeoutMs, which covers everything the watermark can still admit for
    * well-configured delays). */
  class PaymentTimeoutProcessor(timeoutMs: Long, settledRetainMs: Long = -1L)
      extends StatefulProcessor[Long, OrderEvent, OrderOut] {
    private val retainMs = if (settledRetainMs > 0) settledRetainMs else timeoutMs
    @transient private var createdTs: ValueState[Long] = _
    @transient private var settledAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      createdTs = getHandle.getValueState[Long]("createdTs", Encoders.scalaLong,
        TTLConfig.NONE)
      settledAt = getHandle.getValueState[Long]("settledAt", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    /** Mark the lifecycle terminal and schedule the state-cleanup timer. */
    private def settle(tsMs: Long): Unit = {
      settledAt.update(tsMs)
      getHandle.registerTimer(tsMs + retainMs)
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
            if (!settledAt.exists()) {
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
            if (!settledAt.exists()) {
              settle(e.ts.getTime)
              out += OrderOut(key, "paid", e.ts.getTime)
            }
          case _ => // ignore unknown kinds (dirty-data guard)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    timer: ExpiredTimerInfo): Iterator[OrderOut] = {
      val expiry = timer.getExpiryTimeInMs()
      // deadline timer: only the one matching the current armed deadline
      // may fire; a stale timer (superseded created) emits nothing
      if (createdTs.exists() && createdTs.get() + timeoutMs == expiry &&
          !settledAt.exists()) {
        createdTs.clear()
        settle(expiry)
        Iterator.single(OrderOut(key, "timeout", expiry))
      } else if (settledAt.exists() && settledAt.get() + retainMs == expiry) {
        // cleanup timer: the retain horizon has passed — drop the settled
        // marker; the key now holds zero state
        settledAt.clear()
        Iterator.empty
      } else Iterator.empty
    }
  }

  /** Running per-key aggregate with `ValueState` (the reference's keyed
    * `reduce` shape, record-at-a-time): emits the updated running sum for
    * every input row. `stateTtl` as in [[FirstVisitProcessor]]: bound it
    * to the activity horizon when the key space is unbounded (an expired
    * key restarts its sum from zero — the idle-state cleanup semantics of
    * the Flink pattern). */
  case class Measure(key: String, value: Double)
  case class RunningOut(key: String, runningSum: Double, n: Long)

  class RunningSumProcessor(stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Measure, RunningOut] {
    @transient private var acc: ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[(Double, Long)]("acc",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong), stateTtl)

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

  /** Streaming CUSUM drift monitor — the stream form of the batch
    * `q_cusum` changepoint screen: per key, the first `warmupN`
    * observations learn the reference level μ (their mean); every later
    * observation accumulates S ← S + (v − μ), and |S| > `threshold`
    * emits an ALERT row and restarts S (the standard CUSUM restart, so
    * repeated drift keeps firing instead of saturating). State is one
    * fixed-width tuple per key — (n, warmupSum, μ, S) — KB-scale at any
    * key cardinality; `stateTtl` bounds idle keys exactly like the other
    * processors. Emits one row per input (running S visible), alert
    * rows flagged. Observations carry an event timestamp and each
    * batch folds in (tsMs, value) order — see the processor note. */
  case class Drift(key: String, value: Double, tsMs: Long)
  case class DriftOut(key: String, n: Long, s: Double, alert: Boolean)

  /** Input row for the streaming funnel. */
  case class FunnelEvent(userId: Long, etype: String, tsMs: Long)

  /** Output: a stage ADVANCEMENT (stage = 1-based index just reached);
    * `completed` marks the final stage — at most three rows ever emitted
    * per user, each exactly once. */
  case class FunnelOut(userId: Long, stage: Int, tsMs: Long,
                       completed: Boolean)

  /** Streaming ordered funnel — the stateful twin of the batch
    * [[graft.operators.Analytics.funnel3]]: per-user monotone stage
    * machine over an ordered stage list. An event advances the user to
    * stage k+1 only if it matches stage k+1's type and arrives
    * at-or-after the stage-k timestamp; duplicates and out-of-order
    * stage types are ignored, so each advancement emits EXACTLY once
    * (append-mode safe, idempotent under batch replay of the same
    * prefix). State per user is one fixed-width timestamp array —
    * unbounded-key-safe behind `stateTtl`, same discipline as every
    * processor here. */
  /** Funnel state: when each stage was reached (`Long.MinValue` = not
    * yet). A PRODUCT type on purpose — the state encoder derives a
    * named-field schema from it, so the persisted state survives code
    * evolution (a later release adding a field reads old rows with the
    * new field defaulted). The kryo encoder this replaced serializes
    * opaque bytes: any class change invalidates every checkpoint. */
  case class FunnelState(reachedTs: Seq[Long])

  class FunnelProcessor(stages: Seq[String],
                        stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, FunnelEvent, FunnelOut] {
    require(stages.size >= 2, "a funnel needs at least two stages")
    @transient private var reached: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      reached = getHandle.getValueState[FunnelState]("reached",
        Encoders.product[FunnelState], stateTtl)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[FunnelOut] = {
      // ts[k] = when stage k was reached, Long.MinValue = not yet
      val ts = if (reached.exists()) reached.get().reachedTs.toArray
               else Array.fill(stages.size)(Long.MinValue)
      val out = Vector.newBuilder[FunnelOut]
      var changed = false
      // fold in EVENT-TIME order (ties: earlier stage first, so a
      // same-timestamp view→click still progresses): the per-key batch
      // iterator's order after the groupByKey shuffle is NOT arrival
      // order, and the stage machine's at-or-after rule is an event-time
      // contract. The sort buffers one key's single-batch rows — bounded
      // by the micro-batch, not the stream.
      rows.toArray
        .sortBy(e => (e.tsMs, stages.indexOf(e.etype)))
        .foreach { e =>
          val k = stages.indexOf(e.etype)
          if (k == 0 && ts(0) == Long.MinValue) {
            ts(0) = e.tsMs
            changed = true
            out += FunnelOut(key, 1, e.tsMs, completed = stages.size == 1)
          } else if (k > 0 && ts(k) == Long.MinValue &&
                     ts(k - 1) != Long.MinValue && e.tsMs >= ts(k - 1)) {
            ts(k) = e.tsMs
            changed = true
            out += FunnelOut(key, k + 1, e.tsMs, completed = k == stages.size - 1)
          }
        }
      // write state only on advancement: zero-progress keys (noise
      // events before any stage-1) must not accumulate store entries,
      // and unchanged keys must not pay a store write per batch
      if (changed) reached.update(FunnelState(ts.toSeq))
      out.result().iterator
    }
  }

  class DriftMonitorProcessor(warmupN: Long, threshold: Double,
                              stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Drift, DriftOut] {
    require(warmupN >= 1 && threshold > 0)
    @transient private var st: ValueState[(Long, Double, Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Double, Double)]("drift",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaDouble, Encoders.scalaDouble), stateTtl)

    override def handleInputRows(key: String, rows: Iterator[Drift],
                                 timers: TimerValues): Iterator[DriftOut] = {
      var (n, warmupSum, mu, s) =
        if (st.exists()) st.get() else (0L, 0.0, 0.0, 0.0)
      // fold in EVENT-TIME order (ties by value — equal-value rows are
      // fold-interchangeable, so the order is effectively total): the
      // per-key batch iterator after the groupByKey shuffle is NOT
      // arrival order, and the warmup mean, running S, and alert
      // positions are all order-dependent — an unsorted fold would make
      // replays non-reproducible. Same discipline as FunnelProcessor;
      // the sort buffers one key's single-batch rows, bounded by the
      // micro-batch, not the stream.
      val out = rows.toArray.sortBy(m => (m.tsMs, m.value)).map { m =>
        n += 1
        if (n <= warmupN) {
          warmupSum += m.value
          if (n == warmupN) mu = warmupSum / warmupN
          DriftOut(key, n, 0.0, alert = false)
        } else {
          s += m.value - mu
          if (math.abs(s) > threshold) {
            val peak = s
            s = 0.0 // restart after alert
            DriftOut(key, n, peak, alert = true)
          } else DriftOut(key, n, s, alert = false)
        }
      }.toVector
      st.update((n, warmupSum, mu, s))
      out.iterator
    }
  }

  /** Input/output rows for the streaming sequence packer. */
  case class PackDoc(shard: Long, docId: Long, nTokens: Long)
  case class PackOut(shard: Long, seqId: Long, docId: Long, nTokens: Long)

  /** Streaming sequence packing — the stream form of the batch
    * [[graft.operators.Sampling.packSequencesSharded]] (the training-
    * data ingest path: documents arrive continuously and must land in
    * fixed-token-budget bins without a batch re-pack). Keyed by shard;
    * state is ONE open bin per shard — (seqId, fill), a fixed-width
    * tuple, KB-scale at any shard cardinality — and the packing rule is
    * the same NEXT-fit the batch operator declares: a doc that does not
    * fit (or any doc ≥ the budget) closes the bin and opens the next.
    * Within a micro-batch docs fold in ascending docId order (sorted
    * here, so a batch's output is replay-deterministic); ACROSS batches
    * arrival order governs — the streaming contract, pinned by the
    * StreamingSpec law: one batch holding all docs reproduces the batch
    * operator's packing exactly. */
  class PackingProcessor(maxTokens: Long, stateTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, PackDoc, PackOut] {
    require(maxTokens > 0, "maxTokens must be positive")
    @transient private var bin: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bin = getHandle.getValueState[(Long, Long)]("bin",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), stateTtl)

    override def handleInputRows(key: Long, rows: Iterator[PackDoc],
                                 timers: TimerValues): Iterator[PackOut] = {
      var (seq, fill) = if (bin.exists()) bin.get() else (0L, 0L)
      val out = rows.toVector.sortBy(_.docId).map { d =>
        if (seq == 0L || fill + d.nTokens > maxTokens) { seq += 1; fill = 0L }
        fill += d.nTokens
        PackOut(key, seq, d.docId, d.nTokens)
      }
      bin.update((seq, fill))
      out.iterator
    }
  }
}
