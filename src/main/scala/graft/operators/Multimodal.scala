package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2 B6): media payloads ride as
  * opaque `binary` columns next to relational ones; decode / feature
  * extraction runs partition-parallel over the binary column with a
  * batch-shaped API.
  *
  * The real codecs (image/audio libs) are NOT in this environment, so the
  * decode kernel is a clearly-marked deterministic stub — the Spark-side
  * contract (schema, encoders, mapPartitions batching, partition
  * parallelism) is real and tested. Swapping `decodeKernel` for a JNI/
  * library call is the only change needed at deployment.
  */
object Multimodal {

  /** A media row: relational id + opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      mean_luma: Double
  )

  /** STUB decode kernel — stands in for an image/audio codec. Deterministic
    * byte-level "features" so tests are reproducible; replace the body with
    * the real library call (e.g. TwelveMonkeys/ffmpeg via JNI) in
    * production. Runs once per row *inside* mapPartitions so per-partition
    * setup (codec init, native buffers) amortizes — the shape a real codec
    * needs.
    */
  private def decodeKernel(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    // fake dimensions derived from content — a real kernel parses the header
    val w = 16 + (sum % 64).toInt
    val h = 16 + ((sum / 64) % 64).toInt
    MediaFeatures(
      doc_id = row.doc_id,
      media_type = row.media_type,
      n_bytes = bytes.length.toLong,
      checksum = sum,
      width = w,
      height = h,
      mean_luma = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    )
  }

  /** Decode a media Dataset partition-parallel. mapPartitions (not map) so
    * a real codec can hoist expensive init out of the per-row loop; the
    * iterator stays lazy — no partition-sized buffering.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open(); rows.map(decodeWith(codec))
      rows.map(decodeKernel)
    }
  }

  /** Deterministic frame-sample offsets for a (fake) video payload: `n`
    * evenly spaced byte offsets. A real impl samples frames at these
    * timestamps; the plumbing (explode to one row per frame, carry-through
    * of relational columns) is what matters at scale.
    */
  def frameOffsets(df: DataFrame, lenCol: String, n: Int): DataFrame =
    df.withColumn(
      "frame_offsets",
      transform(sequence(lit(0), lit(n - 1)), i => (col(lenCol) * i / n).cast("long"))
    )

  /** Stand-in perceptual hash: 16 hex digits, one per fixed 16-char block
    * of the payload's first 256 chars — each digit is the first hex char
    * of the block's md5 (a per-block content signature, the shape of a
    * real pHash's per-DCT-block signs). Deterministic, engine-replayable,
    * and LOCAL: a small edit to the payload changes only the digits of
    * the blocks it touches, so near-identical payloads have near hashes —
    * the property the near-dup join needs. Built purely from codegen'd
    * substring/md5 (an earlier char-code-sum formulation needed an
    * interpreted higher-order aggregate per block and was ~4x slower).
    * A real deployment swaps this for a decoded-image pHash; everything
    * downstream (banding, bucket join, Hamming verify) is unchanged.
    */
  def pHashHex(payload: Column): Column =
    concat((0 until 16).map { i =>
      substring(md5(substring(payload, i * 16 + 1, 16)), 1, 1)
    }: _*)

  /** Hamming distance between two 16-digit pHashes = number of differing
    * block digits.
    */
  def pHashHamming(a: Column, b: Column): Column =
    aggregate(
      sequence(lit(1), lit(16)),
      lit(0),
      (acc, i) => acc + when(substr(a, i, lit(1)) =!= substr(b, i, lit(1)), lit(1)).otherwise(lit(0))
    ).cast("long")

  /** Near-duplicate media pairs by pHash: band the 16 digits into 4
    * bands of 4; two payloads within Hamming distance 3 must agree on at
    * least one full band (pigeonhole), so candidates come from a bucketed
    * equi-join on (band, band value) — never all-pairs — and the exact
    * Hamming verify runs only on collisions.
    *
    * Two mega-bucket guards keep candidate generation sub-quadratic:
    * (1) exact-duplicate payloads collapse to one representative per
    * distinct phash BEFORE banding — identical media all land in the
    * same buckets, so a duplicate cluster of size m would otherwise
    * contribute 4·C(m,2) candidate rows (observed: 1.6M candidates on
    * the sf0.1 fixture); group sizes ride along so downstream can expand
    * clusters. (2) bands whose every block is empty (payload shorter
    * than the band's char range ⇒ all digits are md5('')'s 'd') do not
    * generate candidates — every short payload shares those bands, and
    * agreement on absence is not similarity evidence. The filter is a
    * pure function of the phash string, so any engine replays it. Two
    * trades: (a) a payload spanning only one content band has no
    * pigeonhole slack — any edit inside that band drops the pair (real
    * pipelines sub-band tiny payloads; out of scope for the stand-in);
    * (b) the filter is value-based, so a NON-empty content band that
    * happens to hash to "dddd" (~16^-4 ≈ 1.5e-5 per band) is also
    * dropped, a rare extra false-negative hole in the pigeonhole
    * guarantee — accepted, because a value-based filter is what keeps
    * the step replayable by any SQL engine without schema side-channels.
    *
    * Input: (id, phash). Returns (id_a, id_b, hamming, n_a, n_b) where
    * id_a/id_b are the smallest ids of two distinct-phash groups,
    * id_a < id_b, hamming <= maxDist, n_* the groups' member counts.
    */
  def pHashNearDup(hashed: DataFrame, maxDist: Int = 3): DataFrame = {
    val groups = hashed.groupBy("phash").agg(min(col("id")).as("id"), count(lit(1)).as("n"))
    val banded = groups.select(
      col("id"), col("phash"), col("n"),
      posexplode(array((0 until 4).map(bd => substring(col("phash"), bd * 4 + 1, 4)): _*))
        .as(Seq("band", "bval"))
    )
      // "dddd" = four empty blocks (md5('') begins with 'd')
      .where(col("bval") =!= "dddd")
    banded.as("x")
      .join(
        banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id")
      )
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.phash").as("pa"), col("y.phash").as("pb"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), pHashHamming(col("pa"), col("pb")).as("hamming"),
        col("n_a"), col("n_b"))
      .filter(col("hamming") <= maxDist)
  }

  /** Build a MediaRow Dataset from the documents fixture (text bytes as a
    * stand-in payload) — harness glue for tests/benchmarks.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload")
      )
      .as[MediaRow]
  }
}
