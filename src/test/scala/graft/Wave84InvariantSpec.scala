package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 58 (B302–B305). */
class Wave84InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("mm_shard_plan: a partition of the corpus into near-full contiguous shards") {
    val rows = run("mm_shard_plan").orderBy(col("shard_id")).collect()
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val lastShard = rows.map(_.getAs[Long]("shard_id")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
      // next-fit against a 64 KiB budget with ~1 KiB docs: every shard
      // except the trailing remainder lands within 5% of full (over-full
      // by at most one straddling doc)
      if (r.getAs[Long]("shard_id") != lastShard) {
        val fill = r.getAs[Long]("fill_ppm")
        assert(fill >= 950000L && fill <= 1100000L, s"shard ${r.getAs[Long]("shard_id")} fill $fill")
      }
    }
    // contiguity: shard id ranges must not interleave
    val sorted = rows.sortBy(_.getAs[Long]("shard_id"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _           => ()
    }
  }

  test("q_encoding_gain: run counts bounded by rows and distincts; dict bits cover the dictionary") {
    val rows = run("q_encoding_gain").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val n  = r.getAs[Long]("n_rows")
      val d  = r.getAs[Long]("n_distinct")
      val ru = r.getAs[Long]("n_runs")
      assert(ru >= 1L && ru <= n, s"${r.getAs[String]("column_name")}: runs $ru vs rows $n")
      // each distinct value occupies at least one run
      assert(ru >= d, s"${r.getAs[String]("column_name")}: $ru runs < $d distincts")
      assert(r.getAs[Long]("rle_runs_ppm") <= 1000000L)
      val bits = r.getAs[Long]("dict_bits")
      assert((1L << bits) >= d || bits == 0L && d <= 1L, s"2^$bits cannot index $d values")
    }
  }

  test("sim_nn_descent_round: refinement re-ranks a superset — recall never decreases") {
    val rows = run("sim_nn_descent_round").collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val b = r.getAs[Long]("base_hits")
      val nd = r.getAs[Long]("nnd_hits")
      assert(b >= 0L && b <= 3L && nd <= 3L)
      assert(nd >= b, s"anchor ${r.getAs[Long]("vec_id")}: refinement lost recall ($b -> $nd)")
    }
  }

  test("embed_whitening_gain: whitening drives the mean pairwise cosine to the centered floor") {
    val r = run("embed_whitening_gain").head()
    val n = r.getAs[Long]("n_vectors")
    val white = r.getAs[Long]("whitened_mean_cos_micro")
    // mean-centered unit cloud: Σu ≈ 0 ⇒ mean pairwise cos ≈ −1/(n−1)
    val floorMicro = -1000000.0 / (n - 1)
    assert(math.abs(white - floorMicro) < 300.0,
      s"whitened mean cos $white micro not at the centered floor $floorMicro")
    assert(r.getAs[Long]("gain_micro") ===
      r.getAs[Long]("raw_mean_cos_micro") - white)
  }
}
