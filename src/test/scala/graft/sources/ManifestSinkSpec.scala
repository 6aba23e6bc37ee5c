package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** The V2 write connector's commit protocol, proven property by property:
  * manifest-defined visibility (stray files invisible), exact rows/bytes
  * accounting, append = manifest union, overwrite = atomic snapshot swap,
  * unsupported types rejected loudly, and temp-dir cleanup.
  */
class ManifestSinkSpec extends GraftSpecBase {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"manifest-$tag-")
    d.toString
  }

  private def sample = Seq(
    (1L, "alpha", 1.5, true),
    (2L, "beta \"quoted\" \\slash\n", 2.5, false),
    (3L, "γunicode", -0.25, true)
  ).toDF("id", "name", "score", "flag")

  test("round trip: committed data reads back exactly, manifest accounts rows") {
    val dir = freshDir("rt")
    sample.repartition(3).write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    val m = ManifestJsonl.readManifest(Paths.get(dir)).get
    assert(m.files.map(_.rows).sum === 3L)
    assert(m.files.nonEmpty && m.files.forall(_.bytes > 0))
    val back = ManifestJsonl.read(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "name", "score", "flag"))
    assert(back.orderBy("id").collect().toSeq === sample.orderBy("id").collect().toSeq)
    // _tmp is gone after a successful commit
    assert(!Files.exists(Paths.get(dir).resolve("_tmp")))
  }

  test("visibility is manifest-defined: stray part files are invisible") {
    val dir = freshDir("stray")
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    // a crashed/concurrent writer left a plausible-looking file behind
    Files.write(
      Paths.get(dir).resolve("part-99999-424242.jsonl"),
      """{"id":999,"name":"ghost","score":0.0,"flag":false}""".getBytes(StandardCharsets.UTF_8)
    )
    assert(ManifestJsonl.read(spark, dir).count() === 3L)
    assert(ManifestJsonl.read(spark, dir).where(col("id") === 999).count() === 0L)
  }

  test("append unions manifests; overwrite swaps the snapshot") {
    val dir = freshDir("modes")
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    Seq((10L, "x", 0.0, false)).toDF("id", "name", "score", "flag")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    assert(ManifestJsonl.read(spark, dir).count() === 4L)
    Seq((42L, "only", 9.0, true)).toDF("id", "name", "score", "flag")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("overwrite").save()
    val back = ManifestJsonl.read(spark, dir)
    assert(back.count() === 1L)
    assert(back.select("id").as[Long].head() === 42L)
    // replaced files stay on disk (time travel) until vacuum retires them
    def partFiles() = {
      val it = Files.list(Paths.get(dir)).iterator()
      var n = 0
      while (it.hasNext) if (it.next().getFileName.toString.startsWith("part-")) n += 1
      n
    }
    assert(partFiles() > ManifestJsonl.readManifest(Paths.get(dir)).get.files.size)
    val (vVers, vFiles) = ManifestJsonl.vacuum(Paths.get(dir), keepVersions = 1)
    assert(vVers === 2L && vFiles > 0L)
    assert(partFiles() === ManifestJsonl.readManifest(Paths.get(dir)).get.files.size)
    // current snapshot unaffected by the vacuum
    assert(ManifestJsonl.read(spark, dir).count() === 1L)
  }

  test("time travel: readAt pins any retained version; vacuum retires it loudly") {
    val dir = freshDir("tt")
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()          // v1: 3 rows
    Seq((10L, "x", 0.0, false)).toDF("id", "name", "score", "flag")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()              // v2: 4 rows
    Seq((42L, "only", 9.0, true)).toDF("id", "name", "score", "flag")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("overwrite").save()           // v3: 1 row
    assert(ManifestJsonl.versions(Paths.get(dir)) === Seq(1L, 2L, 3L))
    assert(ManifestJsonl.readAt(spark, dir, 1L).count() === 3L)
    assert(ManifestJsonl.readAt(spark, dir, 2L).count() === 4L)
    assert(ManifestJsonl.readAt(spark, dir, 3L).count() === 1L)
    // pre-overwrite data is readable THROUGH the overwrite (files retained)
    assert(ManifestJsonl.readAt(spark, dir, 2L).where(col("id") === 10L).count() === 1L)
    ManifestJsonl.vacuum(Paths.get(dir), keepVersions = 1)
    assert(ManifestJsonl.versions(Paths.get(dir)) === Seq(3L))
    val e = intercept[IllegalArgumentException](ManifestJsonl.readAt(spark, dir, 1L))
    assert(e.getMessage.contains("vacuum"))
    assert(ManifestJsonl.read(spark, dir).count() === 1L)
  }

  test("unsupported column types are rejected loudly at write build") {
    val dir = freshDir("types")
    val withTs = sample.withColumn("ts", current_timestamp())
    val e = intercept[Exception] {
      withTs.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("cast timestamps to epoch longs"))
  }

  test("commits publish a versioned manifest log, one snapshot per commit") {
    val dir = freshDir("log")
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    val log = Paths.get(dir).resolve("_manifests")
    val versions = Files.list(log).iterator()
    var names = List.empty[String]
    while (versions.hasNext) names ::= versions.next().getFileName.toString
    assert(names.sorted === List(f"v${1L}%020d.json", f"v${2L}%020d.json"))
    assert(ManifestJsonl.readManifest(Paths.get(dir)).get.version === 2L)
    assert(ManifestJsonl.read(spark, dir).count() === 6L)
  }

  test("append with a different schema fails loudly instead of corrupting") {
    val dir = freshDir("schema")
    sample.write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("id", "other")
        .write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("append schema mismatch"))
    // the failed append published nothing: snapshot still the original
    assert(ManifestJsonl.read(spark, dir).count() === 3L)
    // overwrite with the new schema IS allowed — it replaces the snapshot
    Seq((1L, 2L)).toDF("id", "other")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("overwrite").save()
    assert(ManifestJsonl.read(spark, dir).columns.toSeq === Seq("id", "other"))
  }

  test("a replayed txn commit is a no-op: exactly-once across forced retry") {
    val dir = freshDir("txn")
    def writeOnce(): Unit =
      sample.write.format("graft-manifest-jsonl").option("path", dir)
        .option("txnAppId", "pipeline-ok").option("txnVersion", "7")
        .mode("append").save()
    writeOnce()
    // the forced retry: a crash between sink commit and checkpoint commit
    // re-runs the same micro-batch with the same txnVersion
    writeOnce()
    assert(ManifestJsonl.read(spark, dir).count() === 3L)
    // a LATER txnVersion from the same app does append
    sample.write.format("graft-manifest-jsonl").option("path", dir)
      .option("txnAppId", "pipeline-ok").option("txnVersion", "8")
      .mode("append").save()
    assert(ManifestJsonl.read(spark, dir).count() === 6L)
    assert(ManifestJsonl.readManifest(Paths.get(dir)).get.txns === Map("pipeline-ok" -> 8L))
  }

  test("concurrent appends do not lose updates (optimistic version race)") {
    val dir = freshDir("race")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() =>
        try {
          (0 until 3).foreach { i =>
            Seq((t * 10L + i, s"w$t-$i", 0.0, true)).toDF("id", "name", "score", "flag")
              .write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
          }
        } catch { case e: Throwable => errors.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent append failed: ${Option(errors.peek()).map(_.getMessage)}")
    // every one of the 12 single-row commits is visible — the pre-log
    // read-modify-write of a mutable manifest would have lost some
    assert(ManifestJsonl.read(spark, dir).count() === 12L)
    assert(ManifestJsonl.readManifest(Paths.get(dir)).get.version === 12L)
  }

  test("writeStream path: epochs commit transactionally through the manifest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir   = freshDir("stream")
    val ckpt  = freshDir("stream-ckpt")
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("id", "name")
      .writeStream
      .format("graft-manifest-jsonl")
      .option("path", dir)
      .option("txnAppId", "stream-spec")
      .option("checkpointLocation", ckpt)
      .start()
    input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
    input.addData((3L, "c")); q.processAllAvailable()
    q.stop()
    val m = ManifestJsonl.readManifest(Paths.get(dir)).get
    assert(ManifestJsonl.read(spark, dir).count() === 3L)
    // txn ledger carries the LAST committed epoch for the app
    assert(m.txns.get("stream-spec").exists(_ >= 1L))
  }

  test("Hadoop-qualified file: URIs resolve to the target dir, not a CWD-relative 'file:' dir") {
    val dir = freshDir("uri")
    val qualified = s"file:$dir" // WorkDirs.fresh-style qualified form
    sample.write.format("graft-manifest-jsonl").option("path", qualified).mode("append").save()
    // data and manifest landed at the real target...
    assert(ManifestJsonl.readManifest(Paths.get(dir)).exists(_.files.map(_.rows).sum == 3L))
    assert(ManifestJsonl.read(spark, qualified).count() === 3L)
    // ...and no stray CWD-relative 'file:' directory was created
    assert(!Files.exists(Paths.get("file:")))
    // file:/// triple-slash form resolves identically
    assert(ManifestJsonl.localPath(s"file://$dir") === Paths.get(dir))
  }

  test("non-file schemes are rejected loudly instead of mis-resolved") {
    val ex = intercept[IllegalArgumentException] {
      ManifestJsonl.localPath("s3a://bucket/prefix")
    }
    assert(ex.getMessage.contains("s3a"))
    // and the write path trips the same gate eagerly at plan time
    val ex2 = intercept[Exception] {
      sample.write.format("graft-manifest-jsonl")
        .option("path", "hdfs://nn/warehouse/t").mode("append").save()
    }
    val chain = Iterator.iterate(ex2: Throwable)(_.getCause).takeWhile(_ != null).take(6)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(chain.contains("hdfs"))
  }

  test("null cells and special doubles serialize as JSON nulls") {
    val dir = freshDir("nulls")
    Seq((1L, Option.empty[String], Double.NaN), (2L, Some("ok"), 1.0))
      .toDF("id", "name", "score")
      .write.format("graft-manifest-jsonl").option("path", dir).mode("append").save()
    val back = ManifestJsonl.read(spark, dir).orderBy("id").collect()
    assert(back(0).isNullAt(1) && back(0).isNullAt(2))
    assert(back(1).getString(1) === "ok" && back(1).getDouble(2) === 1.0)
  }
}
