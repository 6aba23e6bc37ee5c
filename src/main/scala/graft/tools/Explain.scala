package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/profiling tool: prints the formatted physical plan and wall time
  * for one or all registered queries. Usage:
  *   runMain graft.tools.Explain <sfDir> [queryName]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only  = args.drop(1).headOption
    val spark = graft.GraftSession
      .builder("graft-explain")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = only.map(Seq(_)).getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"===== $name%s  ($sec%.2f s)")
      if (only.isDefined) df.explain("formatted")
    }
    spark.stop()
  }
}
