package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Composed streaming jobs — end-to-end pipelines mirroring the
  * reference's job mains (SURVEY.md §3): each is a pure
  * stream-DataFrame → stream-DataFrame function, sink-agnostic, so the
  * same composition runs against Kafka on a cluster or MemoryStream in
  * tests.
  */
object Jobs {

  /** The DWS traffic-keyword job (SURVEY.md §3.3, the reference's
    * signature composition): text events → tokenize (UDTF shape) →
    * watermarked tumbling window → per-window keyword counts.
    * Input schema: (ts timestamp, text string). Output: one row per
    * (window, word) with its count — the Doris-bound aggregate.
    */
  def keywordWindowCounts(textStream: DataFrame, tsCol: String,
                          textCol: String, windowDur: String,
                          watermarkDelay: String): DataFrame =
    textStream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(window(col(tsCol), windowDur), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("word"), col("cnt"))

  /** The DWD log-split job (SURVEY.md §3.2 shape): dirty-JSON guard then
    * fan-out by payload type. Input: raw JSON strings with a `type` field
    * and epoch-millis `ts`. Returns the cleansed typed stream; route with
    * [[Streams.split]]. */
  def cleanseLogStream(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    raw.select(from_json(col(jsonCol), schema).as("e"))
      .filter(col("e").isNotNull && col("e.type").isNotNull && col("e.ts").isNotNull)
      .select(col("e.type").as("type"),
        timestamp_millis(col("e.ts")).as("ts"), col("e.payload").as("payload"))
  }

  /** The DWS per-user spend job: watermarked window × user aggregate with
    * broadcast dim enrichment applied per micro-batch via foreachBatch
    * (use [[Streams.enrichWithDim]] in the sink). */
  def userWindowSpend(events: DataFrame, tsCol: String, userCol: String,
                      valueCol: String, windowDur: String,
                      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(userCol))
      .agg(sum(col(valueCol)).as("spend"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(userCol),
        col("spend"), col("n_events"))
}
