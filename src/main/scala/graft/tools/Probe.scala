package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling main. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"## $n: ${(System.nanoTime - t0) / 1e9}%.2f s"); r }

    import graft.operators.TextAnalysis._
    time("docs.count")(docs.count())
    val norm = docs.select(col("doc_id"), normalize(col("text")).as("n"))
    time("normalize")(norm.write.format("noop").mode("overwrite").save())
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    time("tokens")(toks.write.format("noop").mode("overwrite").save())
    val shing = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("s"))
    time("wordShingles")(shing.write.format("noop").mode("overwrite").save())
    val dist = docs.select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("s"))
    time("distinct-shingles")(dist.write.format("noop").mode("overwrite").save())
    val repart = docs.repartition(32)
    val dist32 = repart.select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("s"))
    time("distinct-shingles-32part")(dist32.write.format("noop").mode("overwrite").save())
    val exploded = dist32.select(col("doc_id"), explode(col("s")).as("shingle"))
    time("exploded")(exploded.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
