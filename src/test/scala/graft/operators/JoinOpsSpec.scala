package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

class JoinOpsSpec extends GraftSpecBase {
  import spark.implicits._

  test("asOf attaches the latest build value at-or-before each probe ts") {
    val probe = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "early"), (2L, 50L, "other"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, "v10"), (1L, 15L, "v15"), (2L, 60L, "late"))
      .toDF("k", "bts", "dim")
    val out = AsOfJoin.asOf(probe, build, "k", "ts", "bts", Seq("dim"))
      .select("tag", "dim").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "e1"    -> Some("v10"),   // inclusive: build at ts==10 applies
      "e2"    -> Some("v15"),
      "early" -> None,          // before first build version
      "other" -> None           // build only after probe
    ))
  }

  test("asOfNative (custom SparkPlan) matches the composed form's semantics") {
    val probe = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "early"), (2L, 50L, "other"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, "v10"), (1L, 15L, "v15"), (2L, 60L, "late"))
      .toDF("k", "bts", "dim")
    val native = AsOfJoin.asOfNative(probe, build, "k", "ts", "bts", Seq("dim"))
    // planned through the injected strategy, not a window/join composition
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = native.select("tag", "dim").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "e1"    -> Some("v10"),
      "e2"    -> Some("v15"),
      "early" -> None,
      "other" -> None
    ))
  }

  test("asOfNative direct collect() and shuffle-above honor the UnsafeRow contract") {
    val probe = Seq((1L, 10L, "e1"), (1L, 20L, "e2")).toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, "v10"), (1L, 15L, "v15")).toDF("k", "bts", "dim")
    // collect() with NO Project above the exec node: the node's own output
    // rows go straight into the byte-array collector, which requires
    // UnsafeRow (a JoinedRow here ClassCastExceptions)
    val rows = AsOfJoin.asOfNative(probe, build, "k", "ts", "bts", Seq("dim")).collect()
    assert(rows.map(r => (r.getString(2), r.getString(3))).toSet === Set(("e1", "v10"), ("e2", "v15")))
    // and an exchange directly above the node consumes its rows too
    val agg = AsOfJoin.asOfNative(probe, build, "k", "ts", "bts", Seq("dim"))
      .groupBy("dim").count().as[(String, Long)].collect().toMap
    assert(agg === Map("v10" -> 1L, "v15" -> 1L))
  }

  test("asOfNative forward attaches the earliest build value at-or-after") {
    val probe = Seq((1L, 10L, "eq"), (1L, 12L, "mid"), (1L, 99L, "after"), (2L, 50L, "other"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 10L, "v10"), (1L, 15L, "v15"), (2L, 60L, "v60"))
      .toDF("k", "bts", "dim")
    val out = AsOfJoin
      .asOfNative(probe, build, "k", "ts", "bts", Seq("dim"), direction = "forward")
      .select("tag", "dim").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "eq"    -> Some("v10"),   // inclusive: build at ts==10 applies
      "mid"   -> Some("v15"),
      "after" -> None,          // no build at-or-after
      "other" -> Some("v60")
    ))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(probe, build, "k", "ts", "bts", Seq("dim"), direction = "sideways")
    }
  }

  test("asOfNative tolerance nulls matches beyond the bound in both directions") {
    val probe = Seq((1L, 100L, "near"), (1L, 200L, "far")).toDF("k", "ts", "tag")
    val build = Seq((1L, 95L, "v95")).toDF("k", "bts", "dim")
    val back = AsOfJoin
      .asOfNative(probe, build, "k", "ts", "bts", Seq("dim"), tolerance = Some(10L))
      .select("tag", "dim").as[(String, Option[String])].collect().toMap
    assert(back === Map("near" -> Some("v95"), "far" -> None)) // 5 <= 10 < 105
    val fprobe = Seq((1L, 50L, "ffar"), (1L, 90L, "fnear")).toDF("k", "ts", "tag")
    val fwd = AsOfJoin
      .asOfNative(fprobe, build, "k", "ts", "bts", Seq("dim"),
        direction = "forward", tolerance = Some(10L))
      .select("tag", "dim").as[(String, Option[String])].collect().toMap
    // both probes see the same un-consumed lookahead build row; only the
    // near one is within tolerance
    assert(fwd === Map("fnear" -> Some("v95"), "ffar" -> None))
  }

  test("asOfNative property: all modes match a reference model on random data") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val caseGen = for {
      nB     <- Gen.chooseNum(0, 12)
      nP     <- Gen.chooseNum(1, 15)
      builds <- Gen.listOfN(nB, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 20L)))
      probes <- Gen.listOfN(nP, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 20L)))
      fwd    <- Gen.oneOf(true, false)
      tol    <- Gen.oneOf(None, Some(3L), Some(0L))
    } yield (builds.distinctBy(b => (b._1, b._2)), probes, fwd, tol) // (key, ts) unique on build

    val prop = forAll(caseGen) { case (builds, probes, fwd, tol) =>
      val buildDf = (builds.map { case (k, t) => (k, t, s"v$k-$t") } :+ ((99L, 0L, "pad")))
        .toDF("k", "bts", "dim")
      val probeDf = probes.zipWithIndex.map { case ((k, t), i) => (k, t, s"p$i") }
        .toDF("k", "ts", "tag")
      val got = AsOfJoin
        .asOfNative(probeDf, buildDf, "k", "ts", "bts", Seq("dim"),
          direction = if (fwd) "forward" else "backward", tolerance = tol)
        .select("tag", "dim").as[(String, Option[String])].collect().toMap
      val want = probes.zipWithIndex.map { case ((k, t), i) =>
        val cand =
          if (fwd) builds.filter(b => b._1 == k && b._2 >= t && tol.forall(b._2 - t <= _)).sortBy(_._2).headOption
          else builds.filter(b => b._1 == k && b._2 <= t && tol.forall(t - b._2 <= _)).sortBy(_._2).lastOption
        s"p$i" -> cand.map { case (bk, bt) => s"v$bk-$bt" }
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("asOfNative null-keyed probe rows pass through with null values") {
    val probe = Seq((Some(1L), 10L, "k1"), (None, 10L, "nk")).toDF("k", "ts", "tag")
    val build = Seq((1L, 5L, "v5")).toDF("k", "bts", "dim")
    val out = AsOfJoin.asOfNative(probe, build, "k", "ts", "bts", Seq("dim"))
      .select("tag", "dim").as[(String, Option[String])].collect().toMap
    assert(out === Map("k1" -> Some("v5"), "nk" -> None))
  }

  test("asOfNative equals the composed asOf on fixture-scale data") {
    val ev = graft.Tables.events(spark, sf()).withColumn("ms", unix_millis(col("ts")))
    val build = ev.filter(col("event_id") % 11 === 0)
      .groupBy(col("user_id"), col("ms")).agg(max(col("value")).as("dim_value"))
    val probe = ev.filter(col("event_id") % 11 =!= 0)
      .select(col("event_id"), col("user_id"), col("ms"))
    val composed = AsOfJoin.asOf(probe, build, "user_id", "ms", "ms", Seq("dim_value"))
    val native   = AsOfJoin.asOfNative(probe, build, "user_id", "ms", "ms", Seq("dim_value"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() === probe.count()) // left-outer: every probe row survives
  }

  test("banded range join equals the naive non-equi join") {
    val pts = Seq((5L, "a"), (10L, "b"), (25L, "c"), (99L, "d")).toDF("pt", "tag")
    val iv  = Seq((0L, 10L, 1L), (8L, 30L, 2L), (90L, 95L, 3L)).toDF("s", "e", "iid")
    val banded = RangeJoin.pointInInterval(pts, iv, "pt", "s", "e", bandWidth = 7L)
      .select("tag", "iid")
    val naive = pts.join(iv, col("pt") >= col("s") && col("pt") < col("e"))
      .select("tag", "iid")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    // d (99) matches nothing; a (5) matches interval 1 only
    assert(banded.as[(String, Long)].collect().toSet === Set(("a", 1L), ("b", 2L), ("c", 2L)))
  }

  test("saltedJoin equals the plain join") {
    val fact = graft.Tables.events(spark, sf()).select(col("event_id"), col("user_id"))
    val dim  = graft.Tables.customer(spark, sf())
    val plain = fact.join(dim, col("user_id") === col("c_custkey"))
      .select("event_id", "c_name")
    val salted = SkewJoin.saltedJoin(
      fact, dim, "user_id", "c_custkey",
      graft.functions.Hashing.h32(col("event_id").cast("string")), buckets = 8
    ).select("event_id", "c_name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
