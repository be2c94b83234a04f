package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing/plan probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val t00 = System.nanoTime()
    import java.lang.management.ManagementFactory
    println("[probe] jvmargs: " + ManagementFactory.getRuntimeMXBean.getInputArguments)
    println("[probe] procs: " + Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(label: String, t0: Long): Long = {
      val t = System.nanoTime(); println(f"[probe] $label: ${(t - t0) / 1e9}%.2f s"); t
    }
    var t = tick("session", t00)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.orderBy("event_id").limit(3).collect().foreach(r => println("[probe] event: " + r))
    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    t = tick("raw count", t)
    spark.read.parquet(s"$sf/lineitem.parquet").count()
    t = tick("raw count again", t)
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sf)
    t = tick("build", t)
    df.count()
    t = tick("first run", t)
    SparkEntry.queries("agg_pricing_summary")(spark, sf).count()
    t = tick("second run", t)
    df.explain("formatted")
    spark.stop()
  }
}
