package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve harness (r5 verdict item 2): measure the near-dup
  * family at 1× and 10× the fixture corpus and commit the curve, so the
  * "banded/LSH paths scale near-linearly, all-pairs quadratically"
  * claim is a measurement rather than shape reasoning.
  *
  * Corpus synthesis — n× the fixture with the SAME duplication
  * structure: replica k of the sf0.1 documents table keeps every doc,
  * offsets doc_id by k·1e6, and suffixes every token with "_k". Jaccard
  * similarity is invariant under any injective token remap, so each
  * replica reproduces the fixture's internal near-dup structure
  * exactly, while distinct replicas share no tokens (cross-replica
  * Jaccard = 0). Hence the TRUE pair set grows exactly linearly in n —
  * the right fixture for a scaling curve: an algorithm whose cost
  * follows the true structure should grow ~n, an all-pairs algorithm
  * must still consider n² candidate pairs. Replica 0 is also suffixed,
  * so per-token bytes are identical at every multiplier.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleBench`
  * Env knobs: SPARK_GRAFT_SCALE_MULTS (default "1,10"),
  * SPARK_GRAFT_SCALE_PASSES (default 2, min-of-passes like Bench),
  * SPARK_GRAFT_SCALE_ONLY (comma-filter on query keys).
  * Writes SCALING_r06.json (per-query seconds and output rows per
  * multiplier, plus the x10/x1 ratio).
  */
object ScaleBench {

  private val queryKeys = Seq(
    "llm_jaccard_near_dup", // all-pairs baseline (quadratic by design)
    "llm_simhash_dedup",    // all-pairs simhash baseline (quadratic)
    "llm_minhash_lsh",      // banded scale path
    "llm_simhash_banded",   // banded scale path
    "llm_dedup_clusters",   // contraction + confined CC loop
    "llm_corpus_clean")     // composed pipeline

  def synthesize(spark: SparkSession, baseDir: String, mult: Int,
      outDir: String): Unit = {
    val docs = Tables.documents(spark, baseDir)
    val replicas = (0 until mult).map { k =>
      docs.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        concat_ws(" ", expr(s"transform(split(text, ' '), t -> concat(t, '_$k'))"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicas.reduce(_.unionByName(_))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    val keys = queryKeys.filter(k => only.forall(_.contains(k)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = mults.map { m =>
      val d = s"/tmp/graft_scale_x$m"
      synthesize(spark, baseDir, m, d)
      m -> d
    }
    val docCounts = dirs.map { case (m, d) =>
      m -> spark.read.parquet(s"$d/documents.parquet").count() // also warms FS cache
    }

    def once(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      try {
        val n = graft.ops.Q.withCached(SparkEntry.queries(name)(spark, dir))(_.count())
        ((System.nanoTime() - t0) / 1e9, n)
      } catch { case e: Throwable =>
        System.err.println(s"FAIL $name $dir: $e"); (-1.0, -1L)
      } finally spark.catalog.clearCache()
    }

    // pass structure mirrors Bench: min over whole-suite passes, so two
    // samples of one query never share a host steal burst
    val secs = scala.collection.mutable.Map.empty[(String, Int), Double]
    val rows = scala.collection.mutable.Map.empty[(String, Int), Long]
    (1 to passes).foreach { p =>
      dirs.foreach { case (m, d) =>
        keys.foreach { k =>
          val (t, n) = once(k, d)
          System.err.println(f"pass $p x$m $k%-22s $t%8.2f s  ($n rows)")
          if (t >= 0) {
            val cur = secs.getOrElse((k, m), Double.MaxValue)
            secs((k, m)) = math.min(cur, t)
            rows((k, m)) = n
          }
        }
      }
    }
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val lo = mults.min
    val hi = mults.max
    val qJson = keys.map { k =>
      val per = mults.map(m => s""""x$m":{"sec":${f(secs.getOrElse((k, m), -1.0))},"rows":${rows.getOrElse((k, m), -1L)}}""").mkString(",")
      val ratio =
        if (secs.contains((k, lo)) && secs.contains((k, hi)) && secs((k, lo)) > 0)
          f(secs((k, hi)) / secs((k, lo)))
        else "-1"
      s""""$k":{$per,"t_x$hi/t_x$lo":$ratio}"""
    }.mkString("{", ",", "}")
    val docsJson = docCounts
      .map { case (m, n) => s""""x$m":$n""" }.mkString("{", ",", "}")
    val out =
      s"""{"base":"$baseDir","multipliers":[${mults.mkString(",")}],"passes":$passes,"docs":$docsJson,"queries":$qJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALING_r06.json"), out.getBytes)
    println(out)
    spark.stop()
  }
}
