package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session — one SparkSession per JVM (suites share it via
  * getOrCreate), same configs as the production entry points.
  */
trait GraftSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder("graft-test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config(
      "spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    )
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
