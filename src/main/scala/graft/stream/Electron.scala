package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The message envelope of the catenae-shaped streaming layer: what a
  * catenae Electron carries (key, payload, topic routing, provenance)
  * re-expressed as a typed Spark row. On the Kafka wire an Electron is
  * the standard Structured Streaming Kafka schema
  * (key binary, value binary, topic string, timestamp) with the payload
  * JSON-encoded — schema-on-write replaces catenae's Python pickle, so
  * any consumer (not just this library) can decode it.
  */
final case class Electron(
    key: Option[String],
    value: String,
    topic: Option[String],
    previousTopic: Option[String],
    ts: Timestamp)

object Electron {

  /** JSON payload schema used on the wire (`value` holds the payload
    * itself; envelope fields travel as Kafka key/topic/timestamp). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("previous_topic", StringType)))

  /** Decode a Kafka-wire frame (key/value binary, topic, timestamp) into
    * typed Electron columns. Works identically on a streaming or batch
    * DataFrame — pass the result through `.as[Electron]`. */
  def decode(wire: DataFrame): DataFrame = {
    val payload = from_json(col("value").cast("string"), payloadSchema)
    wire.select(
      col("key").cast("string").as("key"),
      payload.getField("value").as("value"),
      col("topic").as("topic"),
      payload.getField("previous_topic").as("previousTopic"),
      col("timestamp").as("ts"))
  }

  /** Encode typed Electron columns back to the Kafka-wire shape; the
    * `topic` column routes per-row like catenae's `electron.topic`. */
  def encode(electrons: DataFrame): DataFrame =
    electrons.select(
      col("key").cast("binary").as("key"),
      to_json(struct(
        col("value").as("value"),
        col("topic").as("previous_topic"))).cast("binary").as("value"),
      col("topic"))

  def encodeCol(value: Column, previousTopic: Column): Column =
    to_json(struct(value.as("value"), previousTopic.as("previous_topic")))
}
