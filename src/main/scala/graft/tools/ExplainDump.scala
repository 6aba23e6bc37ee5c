package graft.tools

/** Batch plan capture for the optimization-round evidence trail: writes
  * `.explain("formatted")` for each named query to
  * `<outDir>/<query>_<suffix>.txt`. Usage:
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.GraftSession
      .builder("graft-explain-dump")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[explaindump] wrote $p (${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
