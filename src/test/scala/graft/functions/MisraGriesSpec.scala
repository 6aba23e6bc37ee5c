package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.GraftSpecBase

/** The Misra–Gries guarantees are theorems, not tendencies — pin both
  * clauses (coverage: every item above n/(k+1) is kept; bound:
  * est ∈ [exact − n/(k+1), exact]) under adversarial partitioning and
  * orders, because the summary CONTENT below the threshold is
  * legitimately order-dependent and a regression could hide behind it.
  */
class MisraGriesSpec extends GraftSpecBase {
  import spark.implicits._

  private def check(p: org.scalacheck.Prop): Unit = {
    // each evaluation runs a Spark aggregation — keep the sample count
    // small; the deterministic skew test above covers the bulk cases
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  private def summarize(xs: Seq[Long], k: Int, parts: Int): Map[Long, Long] =
    xs.toDF("x")
      .repartition(parts)
      .agg(MisraGries.mgSketchLong(col("x"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.id"), col("e.est"))
      .as[(Long, Long)]
      .collect()
      .toMap

  test("both theorem clauses hold on skewed data across many partitions") {
    // 1000 copies of item 1, 300 of item 2, singletons 100..400
    val xs = Seq.fill(1000)(1L) ++ Seq.fill(300)(2L) ++ (100L to 400L)
    val k  = 8
    val n  = xs.size
    val thr = n / (k + 1)
    for (parts <- Seq(1, 4, 13)) {
      val mg    = summarize(xs, k, parts)
      val exact = xs.groupBy(identity).map { case (id, g) => id -> g.size.toLong }
      exact.filter(_._2 > thr).foreach { case (id, c) =>
        assert(mg.contains(id), s"frequent item $id (count $c > $thr) missing at parts=$parts")
      }
      mg.foreach { case (id, est) =>
        val ex = exact.getOrElse(id, 0L)
        assert(est <= ex, s"overcount: $id est=$est exact=$ex")
        assert(est >= ex - thr, s"undershoot beyond n/(k+1): $id est=$est exact=$ex thr=$thr")
      }
    }
  }

  test("property: guarantees hold for random streams, k, and partitioning") {
    val gen = for {
      k     <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 8)
      xs    <- Gen.listOfN(300, Gen.frequency(5 -> Gen.choose(0L, 3L), 1 -> Gen.choose(0L, 50L)))
    } yield (k, parts, xs)
    check(forAll(gen) { case (k, parts, xs) =>
      val mg    = summarize(xs, k, parts)
      val thr   = xs.size / (k + 1)
      val exact = xs.groupBy(identity).map { case (id, g) => id -> g.size.toLong }
      exact.filter(_._2 > thr).forall { case (id, _) => mg.contains(id) } &&
      mg.forall { case (id, est) =>
        val ex = exact.getOrElse(id, 0L)
        est <= ex && est >= ex - thr
      } &&
      mg.size <= k
    })
  }

  test("nulls are skipped; k=1 degenerates to majority candidate") {
    val df = Seq[Option[Long]](Some(7L), None, Some(7L), Some(7L), Some(3L), None)
      .toDF("x")
    val mg = df
      .agg(MisraGries.mgSketchLong(col("x"), 1).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.id"), col("e.est"))
      .as[(Long, Long)]
      .collect()
      .toMap
    // 7 occurs 3 of 4 non-null rows — a strict majority, so the single
    // counter must hold it (Boyer–Moore majority vote is MG with k=1)
    assert(mg.keySet == Set(7L))
  }

  test("SQL front door: graft_mg_sketch registered via GraftExtensions") {
    Seq(1L, 1L, 1L, 2L).toDF("x").createOrReplaceTempView("mg_in")
    val out = spark
      .sql("SELECT graft_mg_sketch(x, 2) AS mg FROM mg_in")
      .select(explode(col("mg")).as("e"))
      .select(col("e.id"), col("e.est"))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(out === Map(1L -> 3L, 2L -> 1L))
  }

  test("group-level summaries stay independent") {
    val df = (Seq.fill(50)(("a", 1L)) ++ Seq.fill(5)(("b", 2L)) ++ Seq((("b"), 9L)))
      .toDF("g", "x")
      .repartition(7)
    val out = df
      .groupBy(col("g"))
      .agg(MisraGries.mgSketchLong(col("x"), 4).as("mg"))
      .select(col("g"), explode(col("mg")).as("e"))
      .select(col("g"), col("e.id"))
      .as[(String, Long)]
      .collect()
      .toSet
    assert(out.contains(("a", 1L)) && out.contains(("b", 2L)))
    assert(!out.contains(("a", 2L)) && !out.contains(("b", 1L)))
  }
}
