package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.Sinks

/** A5 — external-KV sink semantics: executor-side upserts via
  * foreachBatch, idempotent on replay (the catenae Aerospike/Mongo
  * connector analog). */
class SinkSpec extends SparkSpec {

  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("kvUpsert: every record lands exactly once per key (last write wins)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kv_ckpt").toString
    val ms = MemoryStream[(String, String)]
    val df = ms.toDF().select(col("_1").as("key"), col("_2").as("value"))
    val q = Sinks.kvUpsert(df, dir)(SinkSpec.put).start()
    ms.addData(("a", "1"), ("b", "2"))
    q.processAllAvailable()
    ms.addData(("a", "3")) // upsert same key
    q.processAllAvailable()
    q.stop()
    assert(SinkSpec.store.get("a") == "3")
    assert(SinkSpec.store.get("b") == "2")
    assert(SinkSpec.store.size == 2)
  }
}

/** Store + upsert live on the companion so the closure shipped to
  * executors references a static (per-JVM) singleton — in local mode
  * that is the same map the assertions read. */
object SinkSpec {
  val store = new ConcurrentHashMap[String, String]()
  def put(k: String, v: String): Unit = store.put(k, v)
}
