package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Warehouse-style behavioral analytics over an event stream: cohort
  * retention and ordered funnels — the reference's DWS summary-layer
  * territory (user-behavior aggregates over Kafka events,
  * `realtime-dws/pom.xml:12`), batch form.
  */
object Analytics {

  /** Cohort retention: cohort = each user's first active day; cell
    * (cohort_day, day_offset) counts the distinct cohort users active
    * that many days later. Two keyed shuffles — the per-user first-day
    * map, then the cell aggregate. The cohort map is one row per user
    * and joins back on the same user_id key, so the join reuses the
    * aggregation's hash partitioning (no extra exchange) and AQE can
    * pick a broadcast when the map is small. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day"))
    val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Scale-safe GLOBAL row numbering: `row_number() OVER (ORDER BY …)`
    * without the single-partition window (Spark's WindowExec funnels
    * the ENTIRE relation through one task and logs the "No Partition
    * Defined" anti-pattern WARN — the thing that falls over first at
    * 100 TB). Instead: range-repartition on the sort key (a shuffle
    * whose partitions each hold a contiguous key range), sort within
    * partitions, count per partition (tiny driver-side array, one row
    * per partition), and number each partition starting at its
    * cumulative offset. The `sortCols` order must be TOTAL (tie-broken
    * to a unique key) for the numbering to be deterministic.
    *
    * The relation is locally checkpointed so the counting pass and the
    * numbering pass see the identical partitioning (range sampling is
    * otherwise re-drawn per action). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      rankCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = df.repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(eager = true)
    // per-partition counts WITHOUT a shuffle: a single map-only job over
    // the already-checkpointed partitions (one count per partition, ≤
    // nPart rows collected). The previous groupBy(spark_partition_id())
    // form paid a two-stage exchange per call — pure scheduling overhead
    // on an iterative-cadence operator.
    val counts = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator(pid -> n)
    }.collect().toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until nPart).map { p =>
        val o = p -> acc; acc += counts.getOrElse(p, 0L); o
      }.toMap
    }
    val outSchema = StructType(df.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val numbered = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets(pid)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(numbered, outSchema)
  }

  /** Scale-safe GLOBAL running sum: `sum(v) OVER (ORDER BY … ROWS
    * UNBOUNDED PRECEDING)` without the single-partition window — the
    * same range-repartition + per-partition-offset machinery as
    * [[globalRowNumber]], accumulating a long `valueCol` instead of a
    * counter. Per-partition totals (≤ nPart longs) are the only thing
    * collected to the driver; each partition then prefix-sums locally
    * starting at its cumulative offset. `sortCols` must be a TOTAL
    * order (tie-broken to a unique key) for determinism. */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column],
                       valueCol: String, outCol: String): DataFrame =
    globalRunningSums(df, sortCols, Seq(valueCol -> outCol))

  /** Multi-column form of [[globalRunningSum]]: N running sums over ONE
    * total order for one range shuffle + one offset pass (two
    * single-column calls would shuffle twice). */
  def globalRunningSums(df: DataFrame, sortCols: Seq[Column],
                        cols: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val vIdx = cols.map { case (v, _) => df.schema.fieldIndex(v) }.toArray
    val k = vIdx.length
    val sorted = df.repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(eager = true)
    val sums = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = new Array[Long](k)
      while (it.hasNext) {
        val row = it.next()
        var i = 0
        while (i < k) { s(i) += row.getLong(vIdx(i)); i += 1 }
      }
      Iterator(pid -> s)
    }.collect().toMap
    val offsets: Map[Int, Array[Long]] = {
      val acc = new Array[Long](k)
      (0 until nPart).map { p =>
        val o = p -> acc.clone()
        sums.get(p).foreach { s =>
          var i = 0; while (i < k) { acc(i) += s(i); i += 1 }
        }
        o
      }.toMap
    }
    val outSchema = StructType(df.schema.fields ++
      cols.map { case (_, out) => StructField(out, LongType, nullable = false) })
    val summed = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = offsets(pid).clone()
      it.map { row =>
        var i = 0
        while (i < k) { run(i) += row.getLong(vIdx(i)); i += 1 }
        Row.fromSeq(row.toSeq ++ run.toSeq)
      }
    }
    spark.createDataFrame(summed, outSchema)
  }

  /** Exact `ntile(k)` bucket from a 1-based global rank — the pure
    * arithmetic form of SQL ntile (first `n % k` buckets take one extra
    * row), so the bucket assignment composes with [[globalRowNumber]]
    * instead of needing a window. Column `/` is TRUE division (double);
    * the quotients here must be exact at any rank, so integer division
    * is spelled (a − a mod b)/b — the numerator is an exact multiple,
    * making the double division exact, then the cast is lossless. */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val big = n % k
    val sizeBig = idiv(n, lit(k)) + 1
    val sizeSmall = idiv(n, lit(k))
    when(rank <= big * sizeBig, idiv(rank - 1, sizeBig) + 1)
      .otherwise(big + idiv(rank - big * sizeBig - 1, sizeSmall) + 1)
  }

  /** One-pass pipeline-stage accounting via the `Observation` API: a
    * training pipeline must account for every dropped row, but a
    * separate `count()` per stage re-executes the plan. `observe`
    * attaches the counters to the SAME pass: rows entering the stage and
    * rows its predicate keeps, collected as a side effect of whatever
    * action eventually runs. Read `obs.get` after the action. */
  def observedFilter(df: DataFrame, keep: Column, name: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("rows_in"),
      sum(when(keep, 1L).otherwise(0L)).as("rows_kept"))
    (observed.filter(keep), obs)
  }

  /** Ordered three-stage funnel: a user's first `stages._1`, then the
    * first `stages._2` at-or-after it, then the first `stages._3`
    * at-or-after that, with the last stage landing within `windowMs`
    * of the first. Returns one row: users reaching each stage.
    *
    * Each stage is a filtered min-aggregate plus a user-keyed join —
    * keyed shuffles only, no window function over the full stream, so
    * per-user event counts never have to fit in one sort buffer. */
  def funnel3(events: DataFrame, stages: (String, String, String),
              windowMs: Long = 7L * 24 * 3600 * 1000,
              userCol: String = "user_id", tsCol: String = "ts",
              typeCol: String = "event_type"): DataFrame = {
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsCol).as("ts"))
    // each stage's user-sized first-timestamp map feeds BOTH the next
    // stage's gate and the final count join — materialize each once, so
    // the events source is scanned exactly once per stage filter (the
    // floor: the three scans carry three different pushed predicates)
    // instead of re-deriving earlier stages per consumer
    val t1 = ev.filter(col("et") === stages._1)
      .groupBy("user_id").agg(min("ts").as("t1"))
      .localCheckpoint(true)
    val t2 = ev.filter(col("et") === stages._2)
      .join(t1, Seq("user_id"))
      .filter(col("ts") >= col("t1"))
      .groupBy("user_id", "t1").agg(min("ts").as("t2"))
      .localCheckpoint(true)
    val t3 = ev.filter(col("et") === stages._3)
      .join(t2, Seq("user_id"))
      .filter(col("ts") >= col("t2") &&
        unix_millis(col("ts")) - unix_millis(col("t1")) <= lit(windowMs))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2.select("user_id", "t2"), Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_stage1"),
        count(col("t2")).as("n_stage2"),
        count(col("t3")).as("n_stage3"))
  }
}
