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
    * `topic` column routes per-row like catenae's `electron.topic`.
    * The payload's previous_topic serializes the electron's
    * previousTopic — the topic THIS producer consumed from — so
    * one-hop-back provenance survives the wire for any consumer (the
    * former code wrote the DESTINATION topic there, which a consumer
    * already has from the Kafka record itself; encode/decode round
    * trips lost the real provenance — r4 review). */
  def encode(electrons: DataFrame): DataFrame =
    electrons.select(
      col("key").cast("binary").as("key"),
      encodeCol(col("value"), col("previousTopic")).cast("binary").as("value"),
      col("topic"))

  /** The payload JSON for one (value, previousTopic) pair — the single
    * serialization both encode and any custom producer share. */
  def encodeCol(value: Column, previousTopic: Column): Column =
    to_json(struct(value.as("value"), previousTopic.as("previous_topic")))
}
