package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every input table once (parquet footer reads, FS
    // cache, codegen of the scan path) so the first timed query doesn't
    // pay cold-start costs that min-of-2 can't always hide (round-1
    // bench showed 11.8 s on a pushed-down 600k-row scan — cold FS).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // min of two runs per query: the first pays codegen/broadcast
    // warm-up and is hostage to ambient host noise (observed 10x swings
    // on shared CPU); the min is the reproducible cost. A query that
    // throws reports -1 (never a fast-fail latency masquerading as a
    // result) and is listed under "errors".
    var errors = List.empty[String]
    // optional comma-separated key filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }.toSeq
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // Noise strategy for this shared host (bursty multi-minute CPU-steal
    // windows, observed 10-40x swings): take the min over PASSES of the
    // whole suite rather than back-to-back repeats — consecutive samples
    // of one query land in the same steal burst, samples minutes apart
    // don't. Two full passes, then a third sample only for queries still
    // slow AND unstable (genuine cost reproduces, a burst doesn't).
    val mins = scala.collection.mutable.Map.empty[String, Double]
    val maxs = scala.collection.mutable.Map.empty[String, Double]
    (1 to 2).foreach { _ =>
      selected.foreach { case (name, _) =>
        val t = once(name)
        if (t >= 0) {
          mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), t)
          maxs(name) = math.max(maxs.getOrElse(name, 0.0), t)
        }
      }
    }
    val results = selected.map { case (name, _) =>
      var best = mins.getOrElse(name, -1.0)
      if (best < 0) errors ::= name
      else if (best > 3.0 && maxs(name) / best > 3.0) {
        val t3 = once(name)
        if (t3 >= 0) best = math.min(best, t3)
      }
      name -> best
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
