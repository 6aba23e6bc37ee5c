package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 split/sampling batch that the
  * row-hash oracle can't express:
  *  - leakage safety: every verified near-dup PAIR lands in one split
  *    (checked through an independent path — the pair list vs the
  *    per-doc assignment — not by construction);
  *  - the temperature plan's largest-remainder allocation sums exactly
  *    to the budget and satisfies the quota property (floor ≤ alloc ≤
  *    ceil of the exact proportional share);
  *  - funnel latency order statistics equal a direct sort-based
  *    reference computed in test code;
  *  - the threshold sweep is monotone (tightening τ never adds pairs).
  */
class SplitSamplingInvariantSpec extends GraftSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf())

  test("corpus_split_leakage_safe: both ends of every near-dup pair share a split") {
    val docs  = Tables.documents(spark, sf())
    val pairs = operators.Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5)
    // per-doc assignment via the SAME rule the query uses, but applied
    // doc-by-doc: cluster label from components, split from its hash
    val labels = operators.Dedup
      .connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val assigned = docs
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        (graft.functions.Hashing.h32(
          concat(lit("split:"), coalesce(col("cluster_id"), col("doc_id")))
        ) % 10).as("bucket")
      )
    // independent check: join the PAIR LIST against the assignment —
    // a doc-level (non-cluster) splitter fails this on any near-dup pair
    // whose members hash apart
    val crossSplit = pairs
      .join(assigned.select(col("doc_id").as("id_a"), col("bucket").as("ba")), Seq("id_a"))
      .join(assigned.select(col("doc_id").as("id_b"), col("bucket").as("bb")), Seq("id_b"))
      .where(col("ba") =!= col("bb"))
    assert(pairs.count() > 0, "fixture must contain near-dup pairs for the check to bite")
    assert(crossSplit.count() === 0)
    // and the audit row conserves the corpus
    import spark.implicits._
    val total = run("corpus_split_leakage_safe").agg(sum("n_docs")).as[Long].head()
    assert(total === docs.count())
  }

  test("corpus_temperature_mix: allocation sums to budget and satisfies the quota property") {
    import spark.implicits._
    val plan = run("corpus_temperature_mix")
      .select("source", "tokens", "alloc_docs")
      .as[(String, Long, Long)]
      .collect()
    assert(plan.map(_._3).sum === 10000L)
    // replicate the snapped weights; quota: floor(q) <= alloc <= ceil(q)
    val w    = plan.map { case (_, t, _) => math.floor(math.sqrt(t.toDouble) * 1e6).toLong }
    val wsum = w.sum
    plan.zip(w).foreach { case ((srcName, _, alloc), wi) =>
      val lo = 10000L * wi / wsum
      val hi = if (10000L * wi % wsum == 0) lo else lo + 1
      assert(alloc >= lo && alloc <= hi, s"$srcName: alloc $alloc outside [$lo,$hi]")
    }
  }

  test("events_funnel_time: order statistics match a sort-based reference") {
    import spark.implicits._
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .as[(Long, String, Long)]
      .collect()
      .groupBy(_._1)
    def stageLats: (Seq[Long], Seq[Long]) = {
      val vc = scala.collection.mutable.ArrayBuffer[Long]()
      val cp = scala.collection.mutable.ArrayBuffer[Long]()
      ev.foreach { case (_, rows) =>
        val byType = rows.map(r => (r._2, r._3))
        val v = byType.filter(_._1 == "view").map(_._2).minOption
        v.foreach { vm =>
          val c = byType.filter(r => r._1 == "click" && r._2 > vm).map(_._2).minOption
          c.foreach { cm =>
            vc += (cm - vm) / 1000
            val p = byType.filter(r => r._1 == "purchase" && r._2 > cm).map(_._2).minOption
            p.foreach(pm => cp += (pm - cm) / 1000)
          }
        }
      }
      (vc.toSeq.sorted, cp.toSeq.sorted)
    }
    def discrete(xs: Seq[Long], num: Int, den: Int): Long = {
      // smallest x whose cumulative count reaches ceil(n*num/den)-ish
      // positions used by the query: median pos = (n+1)/2, p90 pos = ceil(.9n)
      val pos = if (den == 2) (xs.size + 1) / 2 else (9 * xs.size + 9) / 10
      xs((pos - 1).max(0))
    }
    val (vc, cp) = stageLats
    val got = run("events_funnel_time")
      .select("stage", "n_users", "median_s", "p90_s")
      .as[(String, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got("view_to_click") === ((vc.size.toLong, discrete(vc, 1, 2), discrete(vc, 9, 10))))
    assert(got("click_to_purchase") === ((cp.size.toLong, discrete(cp, 1, 2), discrete(cp, 9, 10))))
  }

  test("dedup_threshold_sweep: pair and doc counts are monotone non-increasing in tau") {
    import spark.implicits._
    val rows = run("dedup_threshold_sweep")
      .orderBy("threshold_milli")
      .select("threshold_milli", "n_pairs", "n_docs")
      .as[(Long, Long, Long)]
      .collect()
    assert(rows.map(_._1).toSeq === Seq(500L, 600L, 700L, 800L, 900L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"sweep not monotone at ${b._1}")
    }
  }
}
