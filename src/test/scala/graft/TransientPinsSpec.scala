package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TransientPins

/** Per-thread transient-pin registry: drain releases only the calling
  * thread's pins — plus (round 19) the queues of threads that DIED
  * without a final drain, which previously leaked their map entry and
  * every pin registered after their last drain. */
class TransientPinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pinnedRdd(df: DataFrame) =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.head

  test("own-thread drain releases what this thread registered") {
    val df = TransientPins.track(
      spark.range(100).toDF("id").localCheckpoint(true))
    val rdd = pinnedRdd(df)
    assert(rdd.getStorageLevel !== StorageLevel.NONE)
    assert(TransientPins.drain(spark) >= 1)
    assert(rdd.getStorageLevel === StorageLevel.NONE)
  }

  test("a dead thread's pins are reclaimed by the next drain") {
    @volatile var df: DataFrame = null
    val t = new Thread(() => {
      df = TransientPins.track(
        spark.range(100).toDF("id").localCheckpoint(true))
    })
    t.start(); t.join()
    val rdd = pinnedRdd(df)
    assert(rdd.getStorageLevel !== StorageLevel.NONE)
    TransientPins.drain(spark) // sweeps the dead thread's queue too
    assert(rdd.getStorageLevel === StorageLevel.NONE)
  }

  test("a LIVE thread's pins survive another thread's drain") {
    val registered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var df: DataFrame = null
    val t = new Thread(() => {
      df = TransientPins.track(
        spark.range(100).toDF("id").localCheckpoint(true))
      registered.countDown()
      release.await()
      TransientPins.drain(spark)
    })
    t.start()
    registered.await()
    val rdd = pinnedRdd(df)
    TransientPins.drain(spark) // other thread still alive: hands off
    assert(rdd.getStorageLevel !== StorageLevel.NONE)
    release.countDown(); t.join()
    assert(rdd.getStorageLevel === StorageLevel.NONE)
  }
}
