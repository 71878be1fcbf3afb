package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md). In the reference these shapes arrive over Kafka /
  * MySQL-CDC connectors (reference `pom.xml:153-162`, SURVEY.md §2.A);
  * hermetically we read the parquet snapshots. At cluster scale the same
  * loaders would point at partitioned parquet/iceberg paths — nothing
  * here assumes single-file inputs.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other    => spark.read.parquet(s"$sfDir/$other.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Typed Dataset surface (SURVEY.md §1.3: case classes + Encoders replace
    * the reference's Lombok POJOs + beanutils reflection). */
  def eventsTyped(s: SparkSession, d: String): Dataset[Rows.Event] = {
    import s.implicits._
    events(s, d).as[Rows.Event]
  }
  def documentsTyped(s: SparkSession, d: String): Dataset[Rows.Document] = {
    import s.implicits._
    documents(s, d).as[Rows.Document]
  }
  def customerTyped(s: SparkSession, d: String): Dataset[Rows.Customer] = {
    import s.implicits._
    customer(s, d).as[Rows.Customer]
  }

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as
    * long and floor-convert to microseconds — lossless on this data (every
    * value is µs-aligned; verified against the parquet footers) and
    * identical to DuckDB's native ns read for all comparisons at ≥µs grain.
    *
    * Note the `nanosAsLong` flag is session-wide (there is no per-read
    * option for it): this engine sets it deliberately and uniformly — any
    * TIMESTAMP(NANOS) parquet column read through this engine comes back
    * as a nanos long, never a silently-degraded timestamp.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}

/** Case-class row types for the typed `Dataset[T]` surface (replaces the
  * reference's Lombok POJO beans + beanutils reflection — SURVEY.md §1.1 #4).
  */
object Rows {
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
}
