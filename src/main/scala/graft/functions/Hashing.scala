package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * MD5 is the one hash whose bytes agree across every engine (Spark, DuckDB,
  * Postgres, ...), so every content hash in this library is a slice of the
  * MD5 hex digest reinterpreted as an integer. That makes MinHash/SimHash
  * signatures reproducible by an independent SQL oracle — a property Spark's
  * own `xxhash64`/`hash` (Murmur3) don't have.
  *
  * Scale note: md5 is a codegen'd Catalyst expression; the `conv` +
  * `substring` slice stays inside whole-stage codegen, so these are
  * shuffle-free per-row ops.
  */
object Hashing {

  /** First 32 bits of md5(input) as a non-negative Long. DuckDB equivalent:
    * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** First 60 bits of md5(input) as a non-negative Long (fits a signed
    * 64-bit int — 15 hex digits). DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Prime just above 2^32 for the universal-hash family (a*x + b) mod P
    * used by MinHash permutations. a,b < 2^20 and x < 2^32 keep a*x + b
    * well inside signed-64 range — no overflow in either engine.
    */
  val MinhashP: Long = 4294967311L

  /** Fixed permutation coefficients (a, b) — 16 universal hashes → 16-wide
    * MinHash signatures banded 4×4 for LSH. Deterministic so the DuckDB
    * oracle replays the exact same signatures.
    */
  val Perms: Seq[(Long, Long)] = Seq(
    (387143L, 552993L), (176201L, 897269L), (725343L, 161001L), (943819L, 438109L),
    (610039L, 309341L), (130277L, 754931L), (869497L, 220141L), (492877L, 641411L),
    (291673L, 108923L), (777919L, 333133L), (581321L, 915587L), (102913L, 470207L),
    (844351L, 569003L), (363229L, 724099L), (918839L, 150151L), (534511L, 882377L)
  )

  /** The same coefficients as a SQL literal list usable in a DuckDB oracle:
    * `[(a1,b1),...]` rendered as two parallel lists.
    */
  val PermsAsSqlLists: (String, String) = (
    Perms.map(_._1).mkString("[", ",", "]"),
    Perms.map(_._2).mkString("[", ",", "]")
  )
}
