package graft.tools
import org.apache.spark.sql.SparkSession
/** Warm-repetition micro-bench: runs each named query `reps` times in ONE
  * JVM and prints every timing — separates real per-query compute (warm
  * reps) from JVM/codegen startup (rep 1), which single-shot isolated
  * JVMs conflate. Dev tool for regression triage, not the driver bench. */
object BenchIso {

  /** Scratch hygiene guard (SCALING protocol): stale `blockmgr-*` /
    * `spark-*` dirs left by CRASHED runs silently eat the shuffle
    * scratch — two sf10 knn runs died of a full disk this way before the
    * cause was found (the stale dirs held ~50 GB of a dead run's shuffle
    * files). Before a decade run, refuse when such dirs exist and no
    * OTHER live JVM could own them (`rm -rf /tmp/blockmgr-* /tmp/spark-*`
    * is then safe); when another JVM is live, ownership is ambiguous —
    * warn with the total size and proceed. `SPARK_GRAFT_ALLOW_STALE=1`
    * overrides the refusal for runs that deliberately share scratch. */
  private def scratchGuard(): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory &&
        (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-")))
    if (stale.isEmpty) { println("[scratch-guard] clean: no blockmgr-*/spark-* dirs"); return }
    // No symlink traversal: a cycle under /tmp/spark-* would recurse to
    // StackOverflowError, and a link into a large tree would inflate the
    // reported size — count only regular files, recurse only into real dirs.
    def sizeOf(d: java.io.File): Long = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.map { f =>
        if (java.nio.file.Files.isSymbolicLink(f.toPath)) 0L
        else if (f.isDirectory) sizeOf(f)
        else f.length()
      }.sum
    }
    val bytes = stale.map(sizeOf).sum
    // "Another JVM might own the scratch" must not count OUR OWN launcher
    // chain: under `sbt runMain` the sbt JVM (and any shell between) is
    // always alive, which made the refusal branch unreachable — stale
    // 50 GB dirs were only warned about, the exact failure the guard
    // exists to block. Exclude the current process's ancestor chain from
    // the other-JVM count; any remaining live JVM keeps the warn-and-
    // proceed branch (ownership genuinely ambiguous).
    val self = ProcessHandle.current()
    val ancestors = Iterator.iterate(Option(self))(_.flatMap(p =>
        if (p.parent().isPresent) Some(p.parent().get()) else None))
      .takeWhile(_.isDefined).flatten.map(_.pid()).toSet
    val otherJvms = ProcessHandle.allProcesses()
      .filter(p => !ancestors.contains(p.pid()) && p.info().command()
        .map[java.lang.Boolean](_.contains("java")).orElse(java.lang.Boolean.FALSE))
      .count()
    val msg = f"[scratch-guard] ${stale.length} stale scratch dir(s), ${bytes / 1e9}%.1f GB: " +
      stale.take(5).map(_.getName).mkString(", ")
    if (otherJvms > 0) {
      println(s"$msg — another JVM is live, ownership ambiguous; proceeding")
    } else if (sys.env.get("SPARK_GRAFT_ALLOW_STALE").contains("1")) {
      println(s"$msg — SPARK_GRAFT_ALLOW_STALE=1, proceeding")
    } else {
      println(s"$msg — no live JVM owns them; clean up first:\n" +
        "  rm -rf /tmp/blockmgr-* /tmp/spark-*   (or set SPARK_GRAFT_ALLOW_STALE=1)")
      sys.exit(2)
    }
  }

  def main(args: Array[String]): Unit = {
    scratchGuard()
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
