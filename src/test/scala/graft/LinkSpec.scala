package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.stream.{Electron, Link}

/** The catenae-shaped surface: Electron codec round-trip and a Link
  * topology (transform 1→N, drop, topic routing) driven as a stream. */
class LinkSpec extends SparkSpec {

  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def wireRow(key: String, value: String, topic: String):
      (Array[Byte], Array[Byte], String, Timestamp) =
    (key.getBytes, s"""{"value":"$value","previous_topic":null}""".getBytes,
      topic, new Timestamp(1000L))

  test("Electron decode/encode round-trip preserves payload and routing") {
    val wire = Seq(wireRow("k1", "hello", "t_in"), wireRow("k2", "world", "t_in"))
      .toDF("key", "value", "topic", "timestamp")
    val decoded = Electron.decode(wire).as[Electron].collect().sortBy(_.key)
    assert(decoded.map(_.value).toSeq == Seq("hello", "world"))
    assert(decoded.forall(_.topic.contains("t_in")))
    val encoded = Electron.encode(Electron.decode(wire))
    val back = Electron.decode(encoded.withColumn("timestamp", lit(new Timestamp(1000L))))
      .as[Electron].collect().sortBy(_.key)
    assert(back.map(_.value).toSeq == Seq("hello", "world"))
  }

  test("Link.transform: map, fan-out, and drop semantics over a stream") {
    val link = Link({ e =>
      e.value match {
        case "drop" => Seq.empty
        case v      => Seq(e.copy(value = v.toUpperCase),
                           e.copy(value = v.reverse, topic = Some("t_alt")))
      }
    }, outTopic = Some("t_out"))
    val ms = MemoryStream[Electron]
    val q = link.run(ms.toDS()).writeStream
      .format("memory").queryName("link_sink").outputMode(OutputMode.Append()).start()
    ms.addData(
      Electron(Some("a"), "abc", Some("t_in"), None, new Timestamp(1L)),
      Electron(Some("b"), "drop", Some("t_in"), None, new Timestamp(2L)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("link_sink").as[Electron].collect().sortBy(_.value)
    assert(out.length == 2) // "drop" dropped; "abc" fanned out ×2
    assert(out.map(_.value).toSeq == Seq("ABC", "cba"))
    assert(out.map(_.topic).toSet == Set(Some("t_out"), Some("t_alt")))
    assert(out.forall(_.previousTopic.contains("t_in")))
  }
}
