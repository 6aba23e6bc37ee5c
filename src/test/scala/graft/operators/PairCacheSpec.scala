package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** Pins the r14 session pair-table cache semantics (Dedup.PairCache):
  * the B3 verified-pair stage is memoized per (session, input plan,
  * params) so the 14-query audit family shares one materialization per
  * bench/verify session — and the keying must be exact enough that
  * distinct corpora or parameters can never alias.
  */
class PairCacheSpec extends GraftSpecBase {

  test("same input plan + params returns the SAME materialized frame") {
    // two SEPARATE reads of the same parquet table: the cache must match
    // them via sameResult on the analyzed plan (reference keying would
    // miss; the whole point is that every query builds its own read)
    val a = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    val b = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    assert(a eq b, "second call must be a cache hit (same DataFrame instance)")
    // and the cache's checkpoint blocks are registered for the bench
    // sweep exemption
    assert(Dedup.protectedRddIds.nonEmpty)
  }

  test("a different input plan gets its own entry (no aliasing)") {
    val full = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    val half = Dedup.minhashPairs(
      graft.Tables.documents(spark, sf()).filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 3, 0.5)
    assert(!(full eq half))
    // band collision is per-pair (independent of the rest of the corpus),
    // so the filtered corpus's pairs are EXACTLY the full pairs whose
    // both members survive the filter — a cache alias would break this
    val fullPairs = full.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val halfPairs = half.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(halfPairs === fullPairs.filter(p => p._1 % 2 == 0 && p._2 % 2 == 0))
  }

  test("different params get their own entry") {
    val tau5 = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    val tau8 = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.8)
    assert(!(tau5 eq tau8))
    assert(tau8.count() <= tau5.count())
    // every tau=0.8 pair is a tau=0.5 pair (the filter only tightens)
    assert(tau8.select("id_a", "id_b").exceptAll(tau5.select("id_a", "id_b")).isEmpty)
  }

  test("cached frame survives a blocking unpersist sweep of UNPROTECTED rdds") {
    // mirror of Bench.runOnce's storage-isolation sweep: everything not
    // in protectedRddIds is unpersisted; the cached pair table must stay
    // consumable afterwards (a localCheckpoint that lost its blocks
    // cannot be recomputed)
    val cached = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    val before = cached.count()
    val protectedIds = Dedup.protectedRddIds
    spark.sparkContext.getPersistentRDDs
      .filter(kv => !protectedIds(kv._1))
      .valuesIterator.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    assert(cached.count() === before)
    val again = Dedup.minhashPairs(graft.Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)
    assert(again.count() === before)
  }
}
