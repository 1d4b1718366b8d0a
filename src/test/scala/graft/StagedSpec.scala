package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry semantics of [[Staged]]: memoization identity, and clear()
  * freeing exactly its own checkpoint blocks — never a user's caches.
  */
class StagedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("apply memoizes: same key returns the same staged DataFrame") {
    val a = Staged(spark, "spec:memo")(spark.range(5).toDF("x"))
    val b = Staged(spark, "spec:memo")(spark.range(5).toDF("x"))
    assert(a eq b)
    Staged.clear(spark)
  }

  test("clear frees only its own checkpoint blocks; a foreign cache survives") {
    val foreign = spark.range(100).toDF("x").cache()
    foreign.count() // materialize the cache blocks
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(before.nonEmpty)

    val staged = Staged(spark, "spec:own")(spark.range(50).toDF("y"))
    assert(staged.count() === 50)
    val withStaged = spark.sparkContext.getPersistentRDDs.keySet
    assert(before.subsetOf(withStaged) && withStaged != before)

    Staged.clear(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    // staged checkpoint gone, foreign cache untouched
    assert(after === before)
    assert(foreign.count() === 100)
    foreign.unpersist(true)
  }

  test("nested builds record SELF time: a parent is not charged its child") {
    // child sleeps ~400ms inside its build; parent builds FROM the staged
    // child and adds ~50ms of its own work plus checkpoint overhead of
    // UNBOUNDED duration under host load (a 10x-degraded window once
    // tripped an absolute `parent < 0.35s` form of this assert). So the
    // bound is relative to measured wall time: the whole nested build took
    // `wall` seconds INCLUDING the child's 400ms sleep; self-time
    // accounting must leave that sleep out of the parent's record, so
    // parent <= wall - ~400ms no matter how slow the host is. Inclusive
    // accounting would record parent ≈ wall and fail by the sleep margin.
    val t0 = System.nanoTime()
    val parent = Staged(spark, "spec:nest-parent")({
      val child = Staged(spark, "spec:nest-child")({
        Thread.sleep(400); spark.range(10).toDF("c")
      })
      Thread.sleep(50)
      child.select(org.apache.spark.sql.functions.col("c"))
    })
    val wall = (System.nanoTime() - t0) / 1e9
    assert(parent.count() === 10)
    val t = Staged.timings
    assert(t("spec:nest-child") >= 0.4)
    assert(t("spec:nest-parent") <= wall - 0.35,
      s"parent charged inclusive time: ${t("spec:nest-parent")} of $wall wall")
    Staged.clear(spark)
  }

  test("partitioned staging frees the pass-1 intermediate blocks") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val staged = Staged.partitioned(spark, "spec:relayout", Seq("k"))(
      spark.range(64).toDF("k"))
    assert(staged.count() === 64)
    val added = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    // only the relaid-out checkpoint's blocks remain persisted — the
    // flat pass-1 checkpoint is unpersisted once pass 2 materializes
    // (ids may linger in the map with zero blocks after unpersist, so
    // count RDDs that still hold storage)
    val live = added.toSeq.map(spark.sparkContext.getPersistentRDDs(_))
      .filter(_.getStorageLevel.isValid)
    assert(live.size === 1,
      s"expected exactly the relaid-out checkpoint persisted, got $live")
    Staged.clear(spark)
  }

  test("materialization seam: 'reliable' uses the context checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("staged_reliable")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.staged.materialization", "reliable")
    try {
      val staged = Staged(spark, "spec:reliable")(spark.range(7).toDF("x"))
      assert(staged.count() === 7)
      // rows live in the reliable checkpoint dir, not (only) executor blocks
      assert(java.nio.file.Files.walk(dir).anyMatch(p =>
        p.getFileName.toString.startsWith("rdd-")))
      // layout-preserving second pass works under the seam too
      val part = Staged.partitioned(spark, "spec:reliable-part", Seq("x"))(
        spark.range(16).toDF("x"))
      assert(part.count() === 16)
    } finally {
      spark.conf.unset("spark.graft.staged.materialization")
      Staged.clear(spark)
    }
  }

  test("materialization seam rejects unknown levels loudly") {
    spark.conf.set("spark.graft.staged.materialization", "bogus")
    try {
      val ex = intercept[IllegalArgumentException] {
        Staged(spark, "spec:bogus")(spark.range(1).toDF("x"))
      }
      assert(ex.getMessage.contains("bogus"))
    } finally spark.conf.unset("spark.graft.staged.materialization")
  }

  test("cleared key rebuilds on next apply") {
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF("z") }
    Staged(spark, "spec:rebuild")(build)
    Staged(spark, "spec:rebuild")(build)
    assert(builds === 1)
    Staged.clear(spark)
    Staged(spark, "spec:rebuild")(build)
    assert(builds === 2)
    Staged.clear(spark)
  }
}
