package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.GraftSpecBase

/** Crash-restart parity for the round-10 streaming operators: state
  * written through one checkpointed query must be picked up by a FRESH
  * query on the same checkpoint and produce exactly what an
  * uninterrupted run would have — the exactly-once-state claim behind
  * every "cross-batch accumulation" spec, proven across a process
  * boundary rather than across micro-batches of one live query.
  * (Same Trigger.Once + foreachBatch + parquet-source shape as
  * TwsTtlSpec — the memory sink cannot recover a checkpoint.)
  */
class RestartParitySpec extends GraftSpecBase {
  import spark.implicits._

  @annotation.nowarn("cat=deprecation")
  private val onceTrigger: Trigger = Trigger.Once()

  private def withRocksDB[T](body: => T): T = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("SpaceSaving: a fresh query on the same checkpoint continues the summary exactly") {
    withRocksDB {
      val srcDir = java.nio.file.Files.createTempDirectory("ssr-src").toString
      val ckpt   = java.nio.file.Files.createTempDirectory("ssr-ckpt").toString
      def writeBatch(rows: Seq[(String, String)]): Unit =
        rows.toDF("key", "id").write.mode("append").parquet(srcDir)
      def drainOnce(qname: String): Seq[SpaceSaving.TrackedItem] = {
        val got = new java.util.concurrent.CopyOnWriteArrayList[SpaceSaving.TrackedItem]()
        val src = spark.readStream.schema("key STRING, id STRING").parquet(srcDir).as[(String, String)]
        val q = SpaceSaving.perKey(src, m = 3)
          .writeStream.queryName(qname).outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[SpaceSaving.TrackedItem], _: Long) =>
            b.collect().foreach(got.add)
          }
          .option("checkpointLocation", ckpt)
          .trigger(onceTrigger)
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        got.asScala.toSeq
      }

      writeBatch(Seq.fill(4)(("k", "hot")) ++ Seq(("k", "a"), ("k", "b")))
      val r1 = drainOnce("ssr1")
      assert(r1.map(t => (t.id, t.estimate)).toSet === Set(("hot", 4L), ("a", 1L), ("b", 1L)))

      // restart: a NEW query object on the same checkpoint must see the
      // prior summary — hot accumulates, c evicts a 1-count entry
      writeBatch(Seq.fill(3)(("k", "hot")) :+ (("k", "c")))
      val r2 = drainOnce("ssr2").filter(_.estimate > 0)
      val hot = r2.find(_.id == "hot").get
      assert(hot.estimate === 7L, s"restart lost state: $r2")
      val c = r2.find(_.id == "c").get
      assert(c.estimate === 2L && c.error === 1L, s"eviction after restart wrong: $r2")
    }
  }

  test("DriftMonitor: histogram survives the restart and scores the union of both drains") {
    withRocksDB {
      val srcDir = java.nio.file.Files.createTempDirectory("dmr-src").toString
      val ckpt   = java.nio.file.Files.createTempDirectory("dmr-ckpt").toString
      val ref    = Map(HistQuantiles.bucketOf(100L) -> 1000000L)
      def writeBatch(rows: Seq[(String, Long)]): Unit =
        rows.toDF("key", "v").write.mode("append").parquet(srcDir)
      def drainOnce(qname: String): Seq[DriftMonitor.DriftScore] = {
        val got = new java.util.concurrent.CopyOnWriteArrayList[DriftMonitor.DriftScore]()
        val src = spark.readStream.schema("key STRING, v LONG").parquet(srcDir).as[(String, Long)]
        val q = DriftMonitor.perKey(src, ref)
          .writeStream.queryName(qname).outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[DriftMonitor.DriftScore], _: Long) =>
            b.collect().foreach(got.add)
          }
          .option("checkpointLocation", ckpt)
          .trigger(onceTrigger)
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        got.asScala.toSeq
      }

      val b1 = Seq(("k", 100L), ("k", 100L))
      val b2 = Seq(("k", 5000000L), ("k", 100L))
      writeBatch(b1)
      val r1 = drainOnce("dmr1")
      assert(r1.map(_.n) === Seq(2L))
      writeBatch(b2)
      val r2 = drainOnce("dmr2")
      // closed form over the UNION proves the histogram carried across
      val counts = new Array[Long](1024)
      (b1 ++ b2).foreach { case (_, v) => counts(HistQuantiles.bucketOf(v)) += 1L }
      assert(r2.map(_.n) === Seq(4L), s"restart lost counters: $r2")
      assert(r2.head.psiMicro === DriftMonitor.psiMicro(counts, 4L, ref))
      assert(r2.head.ksPpm === DriftMonitor.ksPpm(counts, 4L, ref))
    }
  }
}
