package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("entry-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
  }
}
