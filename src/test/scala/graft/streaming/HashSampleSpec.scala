package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** The bottom-k hash sample's whole value is BIT-EXACT determinism:
  * the stream's final sample must equal the batch SQL bottom-k over the
  * same distinct-id set, whatever the arrival order, batch split, or
  * duplicate arrivals — pinned exactly here, not statistically. Plus
  * sub-k completeness, the exclusion threshold certificate, and key
  * isolation, under the RocksDB provider.
  */
class HashSampleSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, String)]],
      k: Int,
      qname: String
  ): Map[String, Seq[HashSample.SampleMember]] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = HashSample.perKey(input.toDS(), k = k)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val rows = spark.table(qname).as[HashSample.SampleMember].collect()
      rows.zipWithIndex
        .groupBy { case (m, _) => (m.key, m.rank) }
        .map { case (_, grp) => grp.maxBy(_._2)._1 }
        .toSeq
        .groupBy(_.key)
        .map { case (key, ms) =>
          // Update-mode sink keeps stale high ranks from earlier batches
          // when the sample later tightened; the live sample is the rank
          // prefix below the final threshold
          val live = ms.sortBy(_.rank)
          val thr  = live.map(_.threshold).min
          key -> live.filter(m => m.hash <= thr)
        }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Batch-side oracle: bottom-k by the same md5-52bit formula in SQL. */
  private def batchBottomK(ids: Seq[String], k: Int): Seq[(String, Long)] = {
    val df = ids.distinct.toDF("id")
    df.createOrReplaceTempView("hs_ids")
    spark.sql(
      s"""SELECT id, CAST(conv(substring(md5(id), 1, 13), 16, 10) AS BIGINT) AS h
         |FROM hs_ids ORDER BY h, id LIMIT $k""".stripMargin
    ).as[(String, Long)].collect().toSeq
  }

  test("stream sample is bit-identical to the batch SQL bottom-k") {
    val ids = (0 until 200).map(i => s"id-$i")
    val rows = ids.map(("k", _))
    val got = drain(Seq(rows), k = 16, qname = "hs1")("k")
    val expect = batchBottomK(ids, 16)
    assert(got.map(m => (m.id, m.hash)) === expect)
  }

  test("arrival order, batch split, and duplicates cannot change the sample") {
    val ids = (0 until 150).map(i => s"u$i")
    val oneBatch   = drain(Seq(ids.map(("k", _))), k = 12, qname = "hs2")("k")
    val shuffled   = drain(Seq(scala.util.Random.shuffle(ids).map(("k", _))), k = 12, qname = "hs3")("k")
    val splitDuped = drain(
      Seq(
        ids.take(50).map(("k", _)) ++ ids.take(20).map(("k", _)), // dups in batch
        ids.drop(50).map(("k", _)),
        ids.take(30).map(("k", _)) // replayed later
      ),
      k = 12, qname = "hs4"
    )("k")
    val norm = (s: Seq[HashSample.SampleMember]) => s.map(m => (m.id, m.hash, m.rank, m.threshold))
    assert(norm(oneBatch) === norm(shuffled))
    assert(norm(oneBatch) === norm(splitDuped))
  }

  test("below k the sample is the whole distinct set with an open threshold") {
    val got = drain(Seq(Seq(("k", "a"), ("k", "b"), ("k", "a"))), k = 10, qname = "hs5")("k")
    assert(got.map(_.id).toSet === Set("a", "b"))
    assert(got.forall(_.threshold === Long.MaxValue))
  }

  test("threshold certifies exclusion: every non-member hashes above it") {
    val ids = (0 until 100).map(i => s"x$i")
    val got = drain(Seq(ids.map(("k", _))), k = 8, qname = "hs6")("k")
    val thr = got.head.threshold
    val members = got.map(_.id).toSet
    ids.filterNot(members).foreach { id =>
      assert(KmvSketch.hash52(id) >= thr, s"excluded $id hashes below threshold")
    }
  }

  test("keys are isolated") {
    val got = drain(
      Seq(Seq(("a", "only-a"), ("b", "only-b"))),
      k = 4, qname = "hs7"
    )
    assert(got("a").map(_.id) === Seq("only-a"))
    assert(got("b").map(_.id) === Seq("only-b"))
  }
}
