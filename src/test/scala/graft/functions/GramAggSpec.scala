package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.GraftSpecBase

class GramAggSpec extends GraftSpecBase with Matchers {

  import spark.implicits._

  private def gram(rows: Seq[Seq[Long]]): Seq[Long] = {
    val d = rows.head.length
    val buf = new Array[Long](2 + d + d * (d + 1) / 2)
    buf(0) = d.toLong
    rows.foreach { xs =>
      buf(1) += 1
      var p = 2 + d
      for (i <- 0 until d) {
        buf(2 + i) += xs(i)
        for (j <- i until d) { buf(p) += xs(i) * xs(j); p += 1 }
      }
    }
    buf.toSeq
  }

  private val vecs = Seq(
    Seq(1L, -2L, 3L),
    Seq(4L, 5L, -6L),
    Seq(-7L, 8L, 9L),
    Seq(0L, 0L, 1L),
    Seq(2L, 2L, 2L)
  )

  test("matches the hand-computed [d, n, sums, upper-tri gram] layout") {
    val got = vecs.toDF("xs")
      .agg(GramAgg.gramMatrix(col("xs")))
      .as[Seq[Long]].head()
    got shouldBe gram(vecs)
  }

  test("partial/final merge across partitions is lossless") {
    val got = vecs.toDF("xs").repartition(4)
      .agg(GramAgg.gramMatrix(col("xs")))
      .as[Seq[Long]].head()
    got shouldBe gram(vecs)
  }

  test("null arrays and null elements skip the row, not the aggregate") {
    val withNulls = Seq(
      Some(Seq(Some(1L), Some(-2L), Some(3L))),
      None,
      Some(Seq(Some(4L), None, Some(-6L))),
      Some(Seq(Some(2L), Some(2L), Some(2L)))
    )
    val got = withNulls.toDF("xs")
      .agg(GramAgg.gramMatrix(col("xs")))
      .as[Seq[Long]].head()
    got shouldBe gram(Seq(Seq(1L, -2L, 3L), Seq(2L, 2L, 2L)))
  }

  test("ragged dimensions fail loudly instead of corrupting the buffer") {
    val ragged = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("xs").coalesce(1)
    val e = intercept[Exception] {
      ragged.agg(GramAgg.gramMatrix(col("xs"))).collect()
    }
    e.getMessage should include("ragged")
  }

  test("empty input evaluates to the [0, 0] sentinel") {
    val got = Seq.empty[Seq[Long]].toDF("xs")
      .agg(GramAgg.gramMatrix(col("xs")))
      .as[Seq[Long]].head()
    got shouldBe Seq(0L, 0L)
  }

  test("registered as graft_gram_matrix in SQL, grouped form included") {
    vecs.zipWithIndex.map { case (xs, i) => (i % 2, xs) }
      .toDF("grp", "xs").createOrReplaceTempView("gram_in")
    val rows = spark.sql(
      "SELECT grp, graft_gram_matrix(xs) AS g FROM gram_in GROUP BY grp ORDER BY grp"
    ).as[(Int, Seq[Long])].collect()
    rows(0)._2 shouldBe gram(Seq(vecs(0), vecs(2), vecs(4)))
    rows(1)._2 shouldBe gram(Seq(vecs(1), vecs(3)))
  }
}
