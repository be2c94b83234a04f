package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Source/sink abstraction isolating the transport from the operators —
  * the analog of catenae's `-i/-o` topic wiring. Tests drive operators
  * through MemoryStream; production wires KafkaSource/KafkaSink (the
  * `spark-sql-kafka-0-10` connector jar is not present in this
  * container, so those two are format-string-only code paths: they
  * compile here and run on any cluster with the connector on the
  * classpath — `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`).
  */
trait StreamSource {
  def load(spark: SparkSession): DataFrame
}

/** Kafka ingest (catenae consumer thread analog). Multi-topic subscribe
  * mirrors `-i t1,t2`; starting offsets default to earliest like a new
  * consumer group. */
final case class KafkaSource(
    bootstrap: String,
    topics: Seq[String],
    startingOffsets: String = "earliest") extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()
}

/** File-drop source (useful for replay/backfill; same wire schema as a
  * decoded stream when pointed at parquet of Electron columns). The
  * schema is REQUIRED: streaming file sources reject schema-less loads
  * for parquet/json unless global schema inference is flipped on —
  * and inference is a full extra listing pass a 100 TB backfill
  * shouldn't pay anyway (same explicit-schema rule as the batch
  * ingest paths in SourceFormatsSpec). */
final case class FileSource(path: String,
    schema: org.apache.spark.sql.types.StructType,
    format: String = "parquet") extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format(format)
      .schema(schema)
      .option("path", path)
      .load()
}

/** Synthetic load generator (catenae generator-Link analog for tests). */
final case class RateSource(rowsPerSecond: Int) extends StreamSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
}

object Sinks {

  /** Kafka produce (catenae producer thread analog); a per-row `topic`
    * column routes like `electron.topic`, with NULL topics falling back
    * to the default. The default must be applied via coalesce on the
    * COLUMN — Spark's Kafka sink treats a `topic` OPTION as an override
    * of the per-row column, which would silently send every row to the
    * default and break routing (r4 review). */
  def kafka(df: DataFrame, bootstrap: String, defaultTopic: String,
      checkpoint: String): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // frames WITHOUT a topic column route wholly to the default — the
    // per-row coalesce fix must not break the topicless capability the
    // defaultTopic parameter exists for (second r4 review pass)
    val routed =
      if (df.columns.contains("topic"))
        df.withColumn("topic", coalesce(col("topic"), lit(defaultTopic)))
      else df.withColumn("topic", lit(defaultTopic))
    routed.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
  }

  /** External-KV upsert sink (catenae Aerospike/Mongo connector analog):
    * exactly-once-per-batch via foreachBatch + idempotent upserts keyed
    * by (key, batchId is NOT part of the key — upserts are idempotent by
    * design, giving effective exactly-once on replay). */
  def kvUpsert(df: DataFrame, checkpoint: String)(
      upsert: (String, String) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // runs on executors, one connection per partition — never a
        // driver-side collect
        batch.select("key", "value").foreachPartition {
          (rows: Iterator[Row]) =>
            rows.foreach(r => upsert(r.getString(0), r.getString(1)))
        }
      }

  /** Periodic trigger mirroring catenae's `loop(interval)`. */
  def withInterval[T](w: DataStreamWriter[T], seconds: Int): DataStreamWriter[T] =
    w.trigger(Trigger.ProcessingTime(s"$seconds seconds"))
}
