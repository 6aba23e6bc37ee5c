package graft.streaming

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.GraftSpecBase

/** A17/A18 control-plane semantics, mirroring the reference's
  * AnimalStreamControlIT offset sequence (reset to earliest / latest /
  * specific offsets, lag while a backlog exists, zero after drain).
  */
class ControlSpec extends GraftSpecBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def writeFile(dir: String, ids: Long*): Unit =
    ids.toSeq.toDF("id").coalesce(1).write.mode("append").parquet(dir)

  private def drain(): Unit = spark.streams.active.foreach(_.processAllAvailable())

  private def sinkIds(dir: String): Seq[Long] =
    if (new java.io.File(dir).exists())
      spark.read.schema("id LONG").parquet(dir).as[Long].collect().toSeq.sorted
    else Seq.empty

  test("OffsetLag.distance handles scalar, file and kafka offset shapes") {
    assert(OffsetLag.distance("5", "12") === Some(7L))
    assert(OffsetLag.distance("""{"logOffset":3}""", """{"logOffset":3}""") === Some(0L))
    assert(OffsetLag.distance("""{"logOffset":1}""", """{"logOffset":4}""") === Some(3L))
    assert(OffsetLag.distance(
      """{"t":{"0":100,"1":50}}""",
      """{"t":{"0":130,"1":55}}"""
    ) === Some(35L))
    // partition missing on the committed side counts from 0, like a fresh
    // partition the group never consumed
    assert(OffsetLag.distance("""{"t":{"0":10}}""", """{"t":{"0":10,"1":5}}""") === Some(5L))
    assert(OffsetLag.distance("not-json", "1") === None)
  }

  test("ResetSpec maps to Kafka startingOffsets values") {
    assert(ResetSpec.kafkaStartingOffsets(ResetSpec.Earliest, "animals") === "earliest")
    assert(ResetSpec.kafkaStartingOffsets(ResetSpec.Latest, "animals") === "latest")
    assert(ResetSpec.kafkaStartingOffsets(
      ResetSpec.Offsets(Map(1 -> 42L, 0 -> 7L)), "animals"
    ) === """{"animals":{"0":7,"1":42}}""")
  }

  test("reset to latest skips the backlog; reset to earliest replays it") {
    val srcDir = tmp("rst-src"); val ckptRoot = tmp("rst-ckpt"); val okRoot = tmp("rst-ok")
    writeFile(srcDir, 1L, 2L)
    writeFile(srcDir, 3L)

    val registry = new StreamRegistry(spark)
    @volatile var curCkpt = ""
    registry.registerResettable(
      "files",
      (epoch, spec) => {
        val ckpt = s"$ckptRoot/e$epoch"
        curCkpt = ckpt
        if (spec == ResetSpec.Latest) {
          FileSourceReset.seedLatest(spark, ckpt, srcDir)
          FileSourceReset.seedSinkLog(s"$okRoot/e$epoch")
        }
        spark.readStream.schema("id LONG").parquet(srcDir)
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt)
          .option("path", s"$okRoot/e$epoch")
          .start()
      },
      lagProbe = Some(() => FileSourceLag.unprocessedFiles(curCkpt, srcDir))
    )
    drain()
    assert(sinkIds(s"$okRoot/e0") === Seq(1L, 2L, 3L))
    assert(registry.lag("files") === Some(0L))

    // reset to LATEST: the 3-row backlog is skipped; only post-reset files
    // flow (the reference's seek-to-end)
    registry.reset("files", ResetSpec.Latest)
    writeFile(srcDir, 4L)
    drain()
    assert(sinkIds(s"$okRoot/e1") === Seq(4L))

    // reset to EARLIEST: everything replays into the fresh epoch
    registry.reset("files", ResetSpec.Earliest)
    drain()
    assert(sinkIds(s"$okRoot/e2") === Seq(1L, 2L, 3L, 4L))
    registry.stopAll()
  }

  test("reset fully terminates the old run before the new one starts") {
    // the reference's group-inactive wait (StreamControlService.java:199-219)
    // guarantees no concurrent consumption during a reset; here the factory
    // itself checks the previous query is dead at relaunch time
    val srcDir = tmp("seq-src"); val ckptRoot = tmp("seq-ckpt")
    writeFile(srcDir, 1L)
    val registry = new StreamRegistry(spark)
    @volatile var prevQ: org.apache.spark.sql.streaming.StreamingQuery = null
    @volatile var overlapped = false
    registry.registerResettable(
      "seq",
      (epoch, _) => {
        if (prevQ != null && prevQ.isActive) overlapped = true
        val q = spark.readStream.schema("id LONG").parquet(srcDir)
          .writeStream.format("noop")
          .option("checkpointLocation", s"$ckptRoot/e$epoch")
          .start()
        prevQ = q
        q
      }
    )
    drain()
    registry.reset("seq", ResetSpec.Earliest)
    registry.reset("seq", ResetSpec.Earliest)
    assert(!overlapped, "a relaunched query observed its predecessor still active")
    registry.stopAll()
  }

  test("lag reports the backlog mid-stream and zero after drain") {
    val srcDir = tmp("lag-src"); val ckpt = tmp("lag-ckpt")
    writeFile(srcDir, 1L)
    writeFile(srcDir, 2L)
    writeFile(srcDir, 3L)

    val gate     = new CountDownLatch(1)
    val registry = new StreamRegistry(spark)
    registry.registerResettable(
      "throttled",
      (_, _) =>
        spark.readStream.schema("id LONG").option("maxFilesPerTrigger", "1").parquet(srcDir)
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.count()
            if (id == 1) gate.await(60, TimeUnit.SECONDS)
            ()
          }
          .start(),
      lagProbe = Some(() => FileSourceLag.unprocessedFiles(ckpt, srcDir))
    )
    // batch 0 (1 file) commits, batch 1 blocks in its sink: committed side
    // has processed 1 of 3 files (lag counts down 3 → 2 and holds there
    // while the gate is closed)
    val deadline = System.currentTimeMillis() + 30000
    while (!registry.lag("throttled").contains(2L) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(registry.lag("throttled") === Some(2L))
    gate.countDown()
    drain()
    assert(registry.lag("throttled") === Some(0L))
    registry.stopAll()
  }
}
