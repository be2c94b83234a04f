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

  test("Electron codec: previousTopic provenance survives the wire") {
    // encode must serialize the electron's previousTopic (the topic the
    // producer consumed from), not the destination — the destination is
    // already on the Kafka record (r4 review fix)
    val es = Seq(
      Electron(Some("k"), "v", Some("t_out"), Some("t_in"), new Timestamp(1L)))
      .toDF()
    val back = Electron.decode(
      Electron.encode(es).withColumn("timestamp", lit(new Timestamp(1L))))
      .as[Electron].collect().head
    assert(back.topic.contains("t_out"), "destination topic rides the record")
    assert(back.previousTopic.contains("t_in"),
      s"provenance lost on the wire: ${back.previousTopic}")
  }

  test("Link.pipeline replays Electron parquet through a FileSource") {
    // the already-decoded replay path: FileSource (explicit schema —
    // streaming file sources reject schema-less loads) must NOT go
    // through the wire decode (r4 review fix)
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    Seq(Electron(Some("a"), "abc", Some("t0"), None, new Timestamp(1L)),
        Electron(Some("b"), "xyz", Some("t0"), None, new Timestamp(2L)))
      .toDF().write.mode("overwrite").parquet(dir)
    val src = graft.stream.FileSource(dir,
      spark.read.parquet(dir).schema)
    val link = Link(e => Seq(e.copy(value = e.value.toUpperCase)),
      outTopic = Some("t_next"))
    val out = Link.pipeline(spark, src, link)
    val q = out.writeStream.format("memory").queryName("replay_sink")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("replay_sink")
      .withColumn("timestamp", lit(new Timestamp(3L)))
    val back = Electron.decode(rows).as[Electron].collect().sortBy(_.key)
    assert(back.map(_.value).toSeq == Seq("ABC", "XYZ"))
    assert(back.forall(_.topic.contains("t_next")))
    // provenance: the link consumed from t0
    assert(back.forall(_.previousTopic.contains("t0")))
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
