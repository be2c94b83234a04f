package graft

import org.apache.spark.sql.functions._
import graft.ops.{GraftCatalog, Txn}

/** The named-table layer (ops/Catalog.scala): exclusive atomic CREATE,
  * resolve/read/read-by-version through names, SHOW TABLES, external
  * DROP, DESCRIBE HISTORY, and the spark.sql bridge. */
class CatalogSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"cat_${tag}_").toString
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("create/resolve/read/drop lifecycle; data outlives the name") {
    import spark.implicits._
    val cat = fresh("life")
    val root = fresh("life_t")
    Txn.commit((1L to 5L).toDF("id"), root)
    GraftCatalog.create(spark, cat, "t1", root)
    assert(GraftCatalog.resolve(spark, cat, "t1") == root)
    assert(ids(GraftCatalog.read(spark, cat, "t1")) == (1L to 5L).toSet)
    assert(GraftCatalog.listTables(spark, cat) == Seq("t1"))
    GraftCatalog.drop(spark, cat, "t1")
    assert(!GraftCatalog.tableExists(spark, cat, "t1"))
    // external-table semantics: the data is untouched by DROP
    assert(ids(Txn.read(spark, root)) == (1L to 5L).toSet)
  }

  test("CREATE is exclusive (no silent remap) and validates inputs") {
    import spark.implicits._
    val cat = fresh("excl")
    val rootA = fresh("excl_a")
    val rootB = fresh("excl_b")
    Txn.commit((1L to 3L).toDF("id"), rootA)
    Txn.commit((4L to 6L).toDF("id"), rootB)
    GraftCatalog.create(spark, cat, "t", rootA)
    // a second CREATE of the same name loses — the first mapping holds
    intercept[Exception] { GraftCatalog.create(spark, cat, "t", rootB) }
    assert(GraftCatalog.resolve(spark, cat, "t") == rootA)
    // a name may not traverse paths, an empty root may not register
    intercept[IllegalArgumentException] {
      GraftCatalog.create(spark, cat, "../evil", rootB)
    }
    intercept[Exception] {
      GraftCatalog.create(spark, cat, "empty", fresh("excl_nothing"))
    }
    // unknown-name resolution is loud
    intercept[IllegalArgumentException] {
      GraftCatalog.resolve(spark, cat, "nope")
    }
  }

  test("versions, history, and the spark.sql bridge work through names") {
    import spark.implicits._
    val cat = fresh("ver")
    val root = fresh("ver_t")
    Txn.commit((1L to 3L).toDF("id"), root, meta = Map("op" -> "bootstrap"))
    Txn.commitAppend((4L to 6L).toDF("id"), root, meta = Map("op" -> "ingest"))
    GraftCatalog.create(spark, cat, "tv", root)
    assert(ids(GraftCatalog.read(spark, cat, "tv")) == (1L to 6L).toSet)
    assert(ids(GraftCatalog.readVersion(spark, cat, "tv", 1L)) == (1L to 3L).toSet)
    val hist = GraftCatalog.describeHistory(spark, cat, "tv")
      .orderBy("version").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(hist.last.getMap[String, String](2).get("op").contains("ingest"))
    GraftCatalog.registerView(spark, cat, "tv", "cat_spec_tv")
    assert(spark.sql("SELECT count(*) AS n FROM cat_spec_tv").head().getLong(0) == 6L)
    // the view pinned its snapshot: a commit AFTER registration does
    // not shift it (the Txn reader contract through the name layer)
    Txn.commitAppend(Seq(7L).toDF("id"), root)
    assert(spark.sql("SELECT count(*) AS n FROM cat_spec_tv").head().getLong(0) == 6L)
    assert(ids(GraftCatalog.read(spark, cat, "tv")) == (1L to 7L).toSet)
  }

  test("atomic rename: one mapping at every instant, no silent remap") {
    import spark.implicits._
    val cat = fresh("ren")
    val rootA = fresh("ren_a")
    val rootB = fresh("ren_b")
    Txn.commit((1L to 3L).toDF("id"), rootA)
    Txn.commit((10L to 12L).toDF("id"), rootB)
    GraftCatalog.create(spark, cat, "olda", rootA)
    GraftCatalog.renameTable(spark, cat, "olda", "newa")
    assert(!GraftCatalog.tableExists(spark, cat, "olda"))
    assert(ids(GraftCatalog.read(spark, cat, "newa")) == (1L to 3L).toSet)
    // the root never moved — only the name did
    assert(GraftCatalog.resolve(spark, cat, "newa") == rootA)
    // renaming onto an existing name fails loud (no silent remap)
    GraftCatalog.create(spark, cat, "other", rootB)
    assert(intercept[IllegalArgumentException] {
      GraftCatalog.renameTable(spark, cat, "newa", "other")
    }.getMessage.contains("already exists"))
    // renaming a missing name fails loud
    assert(intercept[IllegalArgumentException] {
      GraftCatalog.renameTable(spark, cat, "ghost", "x1")
    }.getMessage.contains("no table"))
  }
}
