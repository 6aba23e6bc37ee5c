package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming Space-Saving: exactness below m, the three summary
  * invariants against exact counts (no undercount, overshoot ≤ error,
  * untracked ≤ min tracked), the guaranteed-rank proof flag, in-batch
  * order independence (exact-counts-first fold), cross-batch
  * accumulation, and key isolation — under the RocksDB provider.
  */
class SpaceSavingSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, String)]],
      m: Int,
      qname: String
  ): Map[String, Seq[SpaceSaving.TrackedItem]] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = SpaceSaving.perKey(input.toDS(), m = m)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val rows = spark.table(qname).as[SpaceSaving.TrackedItem].collect()
      rows.zipWithIndex
        .groupBy { case (h, _) => (h.key, h.rank) }
        .map { case (_, grp) => grp.maxBy(_._2)._1 }
        .toSeq
        .groupBy(_.key)
        .map { case (k, hs) => k -> hs.sortBy(_.rank).filter(_.estimate > 0) }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("below m distinct ids everything is exact with zero error and proven ranks") {
    val batch = Seq.fill(5)(("k", "a")) ++ Seq.fill(3)(("k", "b")) ++ Seq(("k", "c"))
    val got = drain(Seq(batch), m = 5, qname = "ss1")("k")
    assert(got.map(t => (t.id, t.estimate, t.error, t.rank)) ===
      Seq(("a", 5L, 0L, 1), ("b", 3L, 0L, 2), ("c", 1L, 0L, 3)))
    // with zero error every strict-gap rank is proven
    assert(got.map(_.guaranteed) === Seq(1, 1, 1))
  }

  test("summary invariants hold against exact counts under eviction pressure") {
    // 40 distinct ids through m=8 counters, skewed so there are real heavies
    val rows = (0 until 600).map { i =>
      val id = if (i % 3 == 0) s"hot-${i % 4}" else s"cold-${i % 40}"
      ("k", id)
    }
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = drain(Seq(rows), m = 8, qname = "ss2")("k")
    assert(got.nonEmpty && got.size <= 8)
    val minTracked = got.map(_.estimate).min
    got.foreach { t =>
      val ex = truth(t.id)
      assert(t.estimate >= ex, s"undercount for ${t.id}")
      assert(t.estimate - t.error <= ex, s"overshoot beyond error for ${t.id}")
    }
    // any untracked id's true count is bounded by the min tracked estimate
    val trackedIds = got.map(_.id).toSet
    truth.filterNot { case (id, _) => trackedIds(id) }.foreach { case (id, ex) =>
      assert(ex <= minTracked, s"untracked $id true=$ex > minTracked=$minTracked")
    }
    // every id above n/m MUST be tracked (the coverage theorem)
    val n = rows.size
    truth.filter(_._2 > n / 8).foreach { case (id, _) =>
      assert(trackedIds(id), s"frequent $id missing from summary")
    }
    // a guaranteed=1 row's rank is provably correct: est − err ≥ next est
    got.filter(_.guaranteed == 1).foreach { t =>
      val next = got.find(_.rank == t.rank + 1).map(_.estimate).getOrElse(0L)
      assert(t.estimate - t.error >= next)
    }
  }

  test("in-batch arrival order cannot change the emission") {
    val rows = (0 until 200).map(i => ("k", s"id-${i % 23}"))
    val fwd = drain(Seq(rows), m = 5, qname = "ss3")("k")
    val rev = drain(Seq(rows.reverse), m = 5, qname = "ss4")("k")
    assert(fwd.map(t => (t.id, t.estimate, t.error, t.rank, t.guaranteed)) ===
      rev.map(t => (t.id, t.estimate, t.error, t.rank, t.guaranteed)))
  }

  test("cross-batch accumulation carries counts and errors forward") {
    val got = drain(Seq(
      Seq.fill(4)(("k", "hot")) ++ Seq(("k", "a"), ("k", "b")),
      Seq.fill(3)(("k", "hot")) ++ Seq(("k", "c"))
    ), m = 3, qname = "ss5")("k")
    assert(got.head.id === "hot" && got.head.estimate === 7L)
    // c evicted someone with count 1 → est 2, err 1, true count 1 within bounds
    val c = got.find(_.id == "c")
    assert(c.exists(t => t.estimate - t.error <= 1L && t.estimate >= 1L))
  }

  test("keys are isolated") {
    val got = drain(Seq(
      Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("b", "y"))
    ), m = 4, qname = "ss6")
    assert(got("a").map(_.id) === Seq("x"))
    assert(got("b").map(_.id) === Seq("y"))
    assert(got("a").head.estimate === 5L && got("b").head.estimate === 2L)
  }
}
