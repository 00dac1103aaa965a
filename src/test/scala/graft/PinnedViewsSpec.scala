package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PinnedViews, StateStore}

/** The pinned-view cache: one checkpoint per semantic plan — and NO
  * stale pins across state mutations. A parquet read canonicalizes by
  * its root path, so a re-read after a StateStore swap is semantically
  * "equal" to the pre-swap plan; the store's write paths must
  * invalidate the cache or a pinned search scans pre-swap rows. */
class PinnedViewsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same semantic plan pins once; different data pins separately") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val p1 = PinnedViews.pinned(df.filter("id > 0"))
    val p2 = PinnedViews.pinned(df.filter("id > 0"))
    assert(p1 eq p2, "semantically equal plans must share one pin")
    val p3 = PinnedViews.pinned(df.filter("id > 1"))
    assert(!(p1 eq p3))
    assert(p3.count() === 1L)
  }

  test("StateStore.write invalidates pins — no stale reads after a swap") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pin_inval").toString
    val store = new StateStore(s, root)
    store.write("directory",
      Seq((1L, "/a", null, null, new java.sql.Timestamp(0), new java.sql.Timestamp(0)))
        .toDF("id", "dir_path", "ctime", "mtime", "inserted_on", "updated_on")
        .selectExpr("id", "dir_path", "CAST(ctime AS TIMESTAMP) ctime",
          "CAST(mtime AS TIMESTAMP) mtime", "inserted_on", "updated_on"))
    val before = PinnedViews.pinned(store.read("directory"))
    assert(before.count() === 1L)
    // swap in a 2-row version; the re-read has the SAME root path, so
    // without invalidation the cache would serve the 1-row pin
    store.write("directory",
      Seq((1L, "/a"), (2L, "/b")).toDF("id", "dir_path")
        .selectExpr("id", "dir_path", "CAST(NULL AS TIMESTAMP) ctime",
          "CAST(NULL AS TIMESTAMP) mtime",
          "CAST(NULL AS TIMESTAMP) inserted_on", "CAST(NULL AS TIMESTAMP) updated_on"))
    val after = PinnedViews.pinned(store.read("directory"))
    assert(after.count() === 2L, "post-swap pin must see the new version")
  }
}
