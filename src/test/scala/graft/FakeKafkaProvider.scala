package graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Recording stand-in for the Kafka connector (whose jar is absent from
  * this hermetic image): advertises the connector's fixed schema,
  * captures the options `IO.kafkaStream` / `IO.kafkaSink` plumb through
  * the `format` seam, and sinks to nowhere. Lets SourcesSpec cover the
  * cluster call sites end-to-end without a broker. */
class FakeKafkaProvider extends StreamSourceProvider with StreamSinkProvider {
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    FakeKafkaProvider.sourceParams = parameters
    ("fake-kafka", FakeKafkaProvider.kafkaSchema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    throw new UnsupportedOperationException(
      "FakeKafkaProvider resolves schema/options only; it cannot produce data")

  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    FakeKafkaProvider.sinkParams = parameters
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // consume like the connector would (serialize every row)
        data.queryExecution.toRdd.count()
        ()
      }
    }
  }
}

object FakeKafkaProvider {
  @volatile var sourceParams: Map[String, String] = Map.empty
  @volatile var sinkParams: Map[String, String] = Map.empty

  /** The Kafka connector's fixed source schema. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Case-insensitive option lookup: Spark wraps reader/writer options in
    * a case-insensitive map whose concrete key casing is an impl detail. */
  def opt(m: Map[String, String], key: String): Option[String] =
    m.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
}
