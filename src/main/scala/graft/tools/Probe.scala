package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: prints schemas of the driver-generated test tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "lineitem", "supplier", "part", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.treeString}")
    }
    graft.sources.Tables.events(spark, dir).show(3, truncate = false)
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    spark.stop()
  }
}
