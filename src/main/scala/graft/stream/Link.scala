package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}

/** The catenae Link surface: a user subclasses Link and implements
  * `transform(electron) => 0..N electrons`; the framework runs
  * consume → transform → produce. Here a Link is a Dataset
  * transformation inside one StreamingQuery — parallelism comes from
  * partitions (not processes), delivery from the checkpoint WAL (not
  * Kafka offset commits), and fan-out from the per-row `topic` column.
  *
  * Differences from catenae, by design: exactly-once to idempotent/file
  * sinks instead of at-least-once; event-time + watermarks exist (catenae
  * had only arrival order); the JSON-RPC control plane is out of scope
  * (SURVEY §2.J).
  */
abstract class Link extends Serializable {

  /** 1→N transform; return Seq.empty to drop (catenae `return None`). */
  def transform(e: Electron): Seq[Electron]

  /** Optional default output topic (catenae `-o`). */
  def defaultTopic: Option[String] = None

  /** Run this link over decoded electrons (streaming or batch). The
    * consumed topic becomes provenance (`previousTopic`) and the
    * destination is cleared before `transform` — an output goes to the
    * link's default topic unless the transform routes it explicitly. */
  final def run(electrons: Dataset[Electron]): Dataset[Electron] = {
    import electrons.sparkSession.implicits._
    val topic = defaultTopic
    electrons.flatMap { e0 =>
      val e = e0.copy(topic = None, previousTopic = e0.topic)
      transform(e).map { out =>
        out.copy(
          topic = out.topic.orElse(topic),
          previousTopic = e.previousTopic)
      }
    }
  }
}

object Link {

  /** Build a link from a function (the common case in tests/pipelines). */
  def apply(fn: Electron => Seq[Electron], outTopic: Option[String] = None): Link =
    new Link {
      def transform(e: Electron): Seq[Electron] = fn(e)
      override def defaultTopic: Option[String] = outTopic
    }

  /** Chain: decode wire → link → encode wire, ready for a Kafka sink —
    * the single-process equivalent of one catenae topology edge.
    * Electron.decode applies only to the Kafka wire shape
    * (key/value binary + topic + timestamp); a FileSource replay of
    * Electron-columned parquet is ALREADY decoded, and running the wire
    * decode over it would fail on the missing `timestamp` column or
    * silently null every payload through from_json (r4 review) — so
    * the source type picks the path. */
  def pipeline(spark: SparkSession, source: StreamSource, link: Link):
      org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val loaded = source.load(spark)
    val decoded = source match {
      case _: KafkaSource => Electron.decode(loaded).as[Electron]
      case _              => loaded.as[Electron]
    }
    Electron.encode(link.run(decoded).toDF())
  }
}
