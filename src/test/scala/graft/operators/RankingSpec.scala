package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.GraftSpecBase

/** The distributed ranking must be bit-identical to the single-partition
  * window forms it replaces — checked on adversarial sizes (empty, N < n,
  * N not divisible by n) and on randomized heavy-duplicate data where
  * whole quantile buckets collapse onto one value.
  */
class RankingSpec extends GraftSpecBase {
  import spark.implicits._

  private def df(rows: Seq[(Double, Long)]) =
    rows.toDF("v", "k").repartition(7) // scatter input so bucket-local sorts matter

  test("global rank equals window row_number on fixed edge sizes") {
    for (n <- Seq(0, 1, 2, 9, 10, 11, 97)) {
      val rows = (1 to n).map(i => ((i % 5).toDouble, (n - i).toLong))
      val got = Ranking.withGlobalRank(df(rows), "v", "k").select("v", "k", "rn")
        .as[(Double, Long, Long)].collect().toSet
      val want = df(rows)
        .withColumn("rn", row_number().over(Window.orderBy(col("v").asc, col("k").asc)).cast("long"))
        .as[(Double, Long, Long)].collect().toSet
      assert(got === want, s"n=$n")
    }
  }

  test("ntile equals window ntile on randomized heavy-duplicate data") {
    val rowsGen = for {
      n    <- Gen.chooseNum(0, 120)
      tile <- Gen.oneOf(1, 2, 3, 7, 10)
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 6)) // few distinct values → bucket collapse
    } yield (tile, vals.zipWithIndex.map { case (v, i) => (v.toDouble, i.toLong) })

    val prop = forAll(rowsGen) { case (tile, rows) =>
      val got = Ranking.withNtile(df(rows), tile, "v", "k").select("k", "tile")
        .as[(Long, Long)].collect().toMap
      val want = df(rows)
        .withColumn("tile", ntile(tile).over(Window.orderBy(col("v").asc, col("k").asc)).cast("long"))
        .select("k", "tile").as[(Long, Long)].collect().toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("ntile rejects n < 1") {
    intercept[IllegalArgumentException] {
      Ranking.withNtile(df(Seq((1.0, 1L))), 0, "v", "k")
    }
  }
}
