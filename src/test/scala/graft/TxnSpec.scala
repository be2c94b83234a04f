package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ops.Txn

/** The transactional-table contract (ops/Txn.scala): atomic pointer-swap
  * commits, torn-writer invisibility (the r8 verdict's "a failed rewrite
  * of a compacted or merged table is not atomic" gap), time travel,
  * version-CAS retry, transactional compaction, and vacuum. */
class TxnSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"txn_${tag}_").toString
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(p), true)
    p
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("commit/read roundtrip and time travel") {
    import spark.implicits._
    val root = freshRoot("rt")
    val v1 = Txn.commit((1L to 10L).toDF("id"), root)
    val v2 = Txn.commit((11L to 25L).toDF("id"), root)
    assert(v1 == 1 && v2 == 2)
    assert(Txn.currentVersion(spark, root).contains(2L))
    assert(ids(Txn.read(spark, root)) == (11L to 25L).toSet)
    // old snapshot still pinned — readers of v1 are unaffected by v2
    assert(ids(Txn.readVersion(spark, root, 1)) == (1L to 10L).toSet)
  }

  test("torn writer (crash before publish rename) is invisible to readers") {
    import spark.implicits._
    val root = freshRoot("torn")
    Txn.commit((1L to 5L).toDF("id"), root)
    // simulate the crash: snapshot fully written, manifest staged, the
    // publish rename never ran
    (100L to 200L).toDF("id")
      .write.mode("overwrite").parquet(s"$root/data/torn-attempt")
    val out = fs(root).create(new Path(s"$root/_tmp/staged"), false)
    try out.write("data/torn-attempt".getBytes("UTF-8")) finally out.close()
    assert(Txn.currentVersion(spark, root).contains(1L))
    assert(ids(Txn.read(spark, root)) == (1L to 5L).toSet)
  }

  test("rewrite killed MID-WRITE leaves the previous version intact") {
    import spark.implicits._
    val root = freshRoot("kill")
    Txn.commit((1L to 5L).toDF("id"), root)
    // the new-version computation dies partway through the data write —
    // some task has already flushed parquet bytes when another throws
    val boom = udf((i: Long) =>
      if (i == 9999L) throw new RuntimeException("killed mid-rewrite") else i)
    intercept[Exception] {
      Txn.commit(spark.range(0, 10000, 1, 8).select(boom(col("id")).as("id")), root)
    }
    // no marker was published; readers see version 1 exactly
    assert(Txn.currentVersion(spark, root).contains(1L))
    assert(ids(Txn.read(spark, root)) == (1L to 5L).toSet)
  }

  test("version CAS: a taken version number is skipped, not overwritten") {
    import spark.implicits._
    val root = freshRoot("cas")
    Txn.commit((1L to 3L).toDF("id"), root)
    // a concurrent writer already published version 2 (marker exists);
    // our commit must land at 3 without touching 2
    val out = fs(root).create(new Path(s"$root/_commits/2"), false)
    try out.write("data/someone-else".getBytes("UTF-8")) finally out.close()
    val v = Txn.commit((10L to 12L).toDF("id"), root)
    assert(v == 3L)
    assert(ids(Txn.readVersion(spark, root, 3)) == (10L to 12L).toSet)
  }

  test("transactional compaction: atomic swap, content preserved, files shrink") {
    val root = freshRoot("compact")
    val frag = s"${freshRoot("frag")}/in"
    val ev = Tables.events(spark, sf("sf0.001"))
    ev.repartition(32).write.mode("overwrite").parquet(frag)
    val v1 = Txn.commit(spark.read.parquet(frag), root)
    val fragBytes = {
      var t = 0L
      val it = fs(frag).listFiles(new Path(frag), true)
      while (it.hasNext) { val s = it.next(); if (s.getPath.getName.endsWith(".parquet")) t += s.getLen }
      t
    }
    val (v2, nOut) = Txn.compactCommit(spark, frag, root, math.max(1L, fragBytes / 4))
    assert(v2 == v1 + 1)
    assert(nOut <= 8, s"expected <= 8 compacted files, got $nOut")
    // bit-level content preservation through the committed swap
    def digest(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(expr("event_id * 31 + crc32(cast(event_type as string))")),
        count(lit(1))).collect().head
    assert(digest(Txn.read(spark, root)) == digest(ev))
    // the fragmented snapshot remains pinned for in-flight readers
    assert(Txn.readVersion(spark, root, v1).count() == ev.count())
  }

  test("vacuum drops unreferenced snapshots and keeps the current one readable") {
    import spark.implicits._
    val root = freshRoot("vac")
    Txn.commit((1L to 4L).toDF("id"), root)
    Txn.commit((5L to 9L).toDF("id"), root)
    // orphan from a crashed writer — vacuum's other target
    (0L to 2L).toDF("id").write.parquet(s"$root/data/orphan")
    Txn.vacuum(spark, root, keepLast = 1)
    assert(ids(Txn.read(spark, root)) == (5L to 9L).toSet)
    assert(Txn.currentVersion(spark, root).contains(2L))
    intercept[IllegalArgumentException] { Txn.readVersion(spark, root, 1) }
    val dataDirs = fs(root).listStatus(new Path(s"$root/data")).length
    assert(dataDirs == 1, s"vacuum left $dataDirs snapshots, expected 1")
    assert(!fs(root).exists(new Path(s"$root/_tmp")))
  }
}
