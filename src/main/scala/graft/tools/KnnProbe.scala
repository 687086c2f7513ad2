package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-job wall times for one query, to localize small-N
  * scheduling floors (which job/stage burns the time, not how much total).
  * Not part of the bench protocol. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("e_knn_graph")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    sys.env.get("SPARK_GRAFT_PARFIRST").foreach(v =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", v))
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time, Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
        println(f"[job ${je.jobId}%3d] ${(je.time - t0) / 1000.0}%6.2f s  ${desc.take(90)}")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(f"[stage ${si.stageId}%3d] ${ms.getOrElse(-1L) / 1000.0}%6.2f s  ${si.numTasks}%3d tasks  ${si.name.take(110)}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      stages = 0
      val t0 = System.nanoTime()
      val n = graft.core.CacheScope.scoped { fn(spark, sfDir).count() }
      println(f"=== rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows, $stages stages ===")
    }
    spark.stop()
  }
}
