package graft

import org.apache.spark.storage.StorageLevel

import graft.util.Memo

/** Memoized sub-plans must release: a long-lived session otherwise pins
  * corpus-sized MEMORY_AND_DISK frames forever (VERDICT r5 #4). */
class MemoSpec extends SparkSpec {

  test("cached() persists once and release() unpersists the scope") {
    import spark.implicits._
    var builds = 0
    // plans must differ per scope: Spark's CacheManager dedups identical
    // plans into one shared cache entry, which real scopes (distinct source
    // paths) never hit
    def build(tag: Int) = { builds += 1; (1 to 10).map((_, tag)).toDF("n", "tag") }

    val a = Memo.cached(spark, "/memo-spec/a", "frame")(build(1))
    a.count()
    assert(builds == 1)
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)

    // second lookup: same frame, no rebuild
    val a2 = Memo.cached(spark, "/memo-spec/a", "frame")(build(1))
    assert(builds == 1 && (a2 eq a))

    // a different scope builds its own frame and survives the other's release
    val b = Memo.cached(spark, "/memo-spec/b", "frame")(build(2))
    b.count()
    assert(builds == 2)

    Memo.release(spark, "/memo-spec/a")
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK)

    // the released scope rebuilds on next use
    val a3 = Memo.cached(spark, "/memo-spec/a", "frame")(build(3))
    assert(builds == 3 && !(a3 eq a))

    Memo.releaseAll(spark)
    assert(a3.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
  }

  test("re-registering fixtures for a different sfDir releases the stale scope") {
    graft.fixtures.Fixtures.register(spark, "/root/testdata/sf0.001")
    val frame = Memo.cached(spark, "/root/testdata/sf0.001", "memo-spec-probe") {
      spark.range(5).toDF("n")
    }
    frame.count()
    assert(frame.storageLevel == StorageLevel.MEMORY_AND_DISK)

    graft.fixtures.Fixtures.register(spark, "/root/testdata/sf0.01")
    assert(frame.storageLevel == StorageLevel.NONE)

    // leave the shared session back on the spec default
    graft.fixtures.Fixtures.register(spark, "/root/testdata/sf0.001")
  }
}
