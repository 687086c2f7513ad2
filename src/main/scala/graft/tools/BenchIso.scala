package graft.tools
import org.apache.spark.sql.SparkSession
/** Warm-repetition micro-bench: runs each named query `reps` times in ONE
  * JVM and prints every timing — separates real per-query compute (warm
  * reps) from JVM/codegen startup (rep 1), which single-shot isolated
  * JVMs conflate. Dev tool for regression triage, not the driver bench. */
object BenchIso {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          System.gc() // let ContextCleaner reap dead broadcasts, as Bench does
          dt
        }
        println(f"$name%-14s ${ts.map(t => f"$t%.2f").mkString(" ")}")
      } catch {
        // At sf1+ the bounded quadratic baselines refuse by design; a
        // triage session over many names must record that and move on,
        // not die mid-list looking like the query crashed.
        case _: graft.core.ScaleGuardRefusal => println(f"$name%-14s skipped_guard")
      }
    }
    spark.stop()
  }
}
