package graft.streaming

import graft.GraftSpecBase

/** Pins the injectable-scratch-base contract cdc_pipeline_e2e and the
  * bench stream rely on: session-conf override wins, every allocation is
  * unique (bench trials must never share a checkpoint), and the returned
  * path is qualified + created on the resolved filesystem.
  */
class WorkDirsSpec extends GraftSpecBase {

  test("default base is java.io.tmpdir; allocations are unique and created") {
    val a = WorkDirs.fresh(spark, "wd-test")
    val b = WorkDirs.fresh(spark, "wd-test")
    assert(a !== b)
    val tmp = System.getProperty("java.io.tmpdir").stripSuffix("/")
    assert(a.contains(tmp))
    assert(new java.io.File(new java.net.URI(a)).isDirectory)
  }

  test("spark.graft.stream.workdir conf overrides the base") {
    val base = java.nio.file.Files.createTempDirectory("wd-base").toString
    spark.conf.set("spark.graft.stream.workdir", base)
    try {
      val d = WorkDirs.fresh(spark, "conf-scoped")
      assert(d.contains(base))
      assert(new java.io.File(new java.net.URI(d)).isDirectory)
    } finally spark.conf.unset("spark.graft.stream.workdir")
  }
}
