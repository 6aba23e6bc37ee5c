package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Manifest-committed JSONL sink on the DataSource V2 write API — the
  * write-side twin of the repo's V2 read connector (SyntheticEventsSource)
  * and a minimal honest version of the commit protocol every lakehouse
  * table format (Delta/Iceberg/Hudi) is built around:
  *
  *  - task writers land data in `_tmp/<queryId>/` under ATTEMPT-unique
  *    names and report them via `WriterCommitMessage`;
  *  - the driver's commit promotes exactly the reported files and then
  *    publishes a NEW VERSIONED SNAPSHOT `_manifests/v<N>.json` with a
  *    create-exclusive (put-if-absent) publish — a reader either sees
  *    the previous snapshot or the new one, never a torn directory
  *    listing, and two concurrent committers cannot both win version N
  *    (the loser re-reads, re-merges, and retries at N+1: optimistic
  *    concurrency, the same shape as Delta's `_delta_log`);
  *  - orphan files from failed or speculative task attempts are never
  *    promoted and die with `_tmp` — visibility is defined by the
  *    manifest, not by what `ls` returns (the property that makes
  *    atomic writes possible on stores without atomic directory moves);
  *  - `abort` removes `_tmp` and leaves the previous snapshot intact.
  *
  * Exactly-once re-commit: `.option("txnAppId", app)` +
  * `.option("txnVersion", v)` record (app → v) in the manifest; a commit
  * whose version is ≤ the recorded high-water mark is a no-op (its files
  * are discarded, not promoted). A foreachBatch sink passing
  * `txnVersion = batchId` gets exactly-once output across micro-batch
  * replays — checkpoint + transactional sink, not directory-overwrite
  * idempotence. The streaming write path (`writeStream.format(...)`)
  * applies the same protocol with `txnVersion = epochId` automatically.
  *
  * Append-mode schema gate: a second append whose column names/types
  * differ from the manifest's fails loudly — silently recording a new
  * schema would leave old files unreadable under it.
  *
  * `ManifestJsonl.read` consumes only manifest-listed files, so stray
  * files in the directory are invisible by construction. Append mode
  * unions the old manifest's files with the new ones; overwrite
  * (SupportsTruncate) publishes a snapshot of exactly the new files.
  * Replaced files stay ON DISK but invisible: every version file is a
  * complete snapshot, so `ManifestJsonl.readAt(path, v)` time-travels
  * to any retained version, and `ManifestJsonl.vacuum(dir, keep)` is
  * where old versions and their unreferenced data files actually die —
  * physical delete is a retention policy, never part of a commit
  * (the Delta/Iceberg model).
  *
  * Local-filesystem `java.nio` file ops keep the sink testable in this
  * sandbox; the create-exclusive publish uses a hard link (atomic
  * fail-if-exists on POSIX) with a documented fail-if-exists-move
  * fallback — on a cluster the same sequence maps onto the store's
  * put-if-absent primitive. Scale shape: one manifest write per commit,
  * O(files) driver memory at commit — the 100 TB failure mode this
  * avoids is full-directory listing on every read.
  *
  * Supported column types: long/int/double/boolean/string (timestamps
  * travel as epoch longs — cast before writing; rejected loudly).
  */
class ManifestJsonlSink extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-manifest-jsonl"

  // write-only source: schema comes from the DataFrame being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-manifest-jsonl requires .option(\"path\", ...)")
    )
    new ManifestJsonlTable(path, schema, opts)
  }

  override def supportsExternalMetadata(): Boolean = true
}

private class ManifestJsonlTable(path: String, schema: StructType, opts: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-manifest-jsonl(`$path`)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // txn options may arrive on the writer (info.options) or the source
    // (table properties) — accept both, writer wins
    def opt(k: String): Option[String] =
      Option(info.options.get(k)).orElse(Option(opts.get(k)))
    val txn = for {
      app <- opt("txnAppId")
      ver <- opt("txnVersion")
    } yield (app, ver.toLong)
    new ManifestWriteBuilder(path, info.schema(), info.queryId(), truncate = false, txn, opt("txnAppId"))
  }
}

private class ManifestWriteBuilder(
    path: String,
    schema: StructType,
    queryId: String,
    truncate: Boolean,
    txn: Option[(String, Long)],
    txnAppId: Option[String]
) extends WriteBuilder with SupportsTruncate {
  ManifestJsonl.validateSchema(schema)
  ManifestJsonl.localPath(path) // fail unsupported schemes at plan time, not mid-write

  override def truncate(): WriteBuilder =
    new ManifestWriteBuilder(path, schema, queryId, truncate = true, txn, txnAppId)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ManifestBatchWrite(path, schema, queryId, truncate, txn)
    // streaming: txnVersion is the epochId — cross-restart exactly-once
    // needs a stable explicit txnAppId (queryId changes per run)
    override def toStreaming: StreamingWrite =
      new ManifestStreamingWrite(path, schema, queryId, truncate, txnAppId.getOrElse(s"stream-$queryId"))
  }
}

private case class FileCommit(file: String, rows: Long, bytes: Long) extends WriterCommitMessage

private class ManifestBatchWrite(
    path: String,
    schema: StructType,
    queryId: String,
    truncate: Boolean,
    txn: Option[(String, Long)]
) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = ManifestJsonl.localPath(path)
    val tmp = dir.resolve("_tmp").resolve(queryId)
    val committed = messages.toSeq.collect { case f: FileCommit => f }
    try ManifestJsonl.commitFiles(dir, tmp, committed, schema, truncate, txn)
    finally {
      ManifestJsonl.deleteRecursively(tmp)
      ManifestJsonl.deleteIfEmptyDir(dir.resolve("_tmp"))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    ManifestJsonl.deleteRecursively(ManifestJsonl.localPath(path).resolve("_tmp").resolve(queryId))
    ManifestJsonl.deleteIfEmptyDir(ManifestJsonl.localPath(path).resolve("_tmp"))
  }
}

private class ManifestStreamingWrite(
    path: String,
    schema: StructType,
    queryId: String,
    truncate: Boolean,
    txnAppId: String
) extends StreamingWrite {

  private def tmpFor(epochId: Long): Path =
    ManifestJsonl.localPath(path).resolve("_tmp").resolve(s"$queryId-e$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestStreamingWriterFactory(path, schema, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = ManifestJsonl.localPath(path)
    val tmp = tmpFor(epochId)
    val committed = messages.toSeq.collect { case f: FileCommit => f }
    // txnVersion = epochId: a replayed micro-batch (crash between sink
    // commit and checkpoint commit) re-commits the same epoch and is
    // dropped by the manifest's txn high-water mark — exactly-once
    try ManifestJsonl.commitFiles(dir, tmp, committed, schema, truncate, Some((txnAppId, epochId)))
    finally {
      ManifestJsonl.deleteRecursively(tmp)
      ManifestJsonl.deleteIfEmptyDir(dir.resolve("_tmp"))
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    ManifestJsonl.deleteRecursively(tmpFor(epochId))
    ManifestJsonl.deleteIfEmptyDir(ManifestJsonl.localPath(path).resolve("_tmp"))
  }
}

private class ManifestWriterFactory(path: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(ManifestJsonl.localPath(path).resolve("_tmp").resolve(queryId), schema, partitionId, taskId)
}

private class ManifestStreamingWriterFactory(path: String, schema: StructType, queryId: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(
      ManifestJsonl.localPath(path).resolve("_tmp").resolve(s"$queryId-e$epochId"),
      schema, partitionId, taskId)
}

private class ManifestDataWriter(
    tmpDir: Path,
    schema: StructType,
    partitionId: Int,
    taskId: Long
) extends DataWriter[InternalRow] {

  // taskId is unique per ATTEMPT, so a speculative retry of the same
  // partition writes a different file and only the committed attempt's
  // name reaches the driver
  private val fileName = f"part-$partitionId%05d-$taskId.jsonl"
  Files.createDirectories(tmpDir)
  private val out =
    Files.newBufferedWriter(tmpDir.resolve(fileName), StandardCharsets.UTF_8)
  private var rows  = 0L
  private var bytes = 0L

  override def write(record: InternalRow): Unit = {
    val line = ManifestJsonl.rowToJson(record, schema)
    out.write(line); out.write('\n')
    rows += 1
    bytes += line.getBytes(StandardCharsets.UTF_8).length + 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FileCommit(fileName, rows, bytes)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmpDir.resolve(fileName))
  }

  override def close(): Unit = out.close()
}

object ManifestJsonl {

  final case class Manifest(
      version: Long,
      schemaJson: String,
      files: Seq[FileCommitInfo],
      txns: Map[String, Long]
  )
  final case class FileCommitInfo(file: String, rows: Long, bytes: Long)

  /** Resolve the sink's `path` option to a local java.nio Path.
    *
    * Callers hand this sink Hadoop-qualified URIs (`file:/tmp/...`,
    * `file:///tmp/...` — e.g. anything derived from a qualified
    * FileSystem path), and raw `Paths.get` on such a string silently
    * creates a CWD-relative `file:` DIRECTORY instead of writing to the
    * target — and for a non-file scheme it would scatter executor-local
    * relative dirs, which for an exactly-once sink is data loss. So:
    * scheme-qualified strings are parsed as URIs, and any scheme this
    * java.nio-backed sink cannot honor is rejected loudly instead of
    * mis-resolved.
    */
  def localPath(path: String): Path = {
    // 2+ char scheme: a single-letter prefix like `C:` is a Windows drive
    // path, not a URI scheme (RFC 3986 allows it, but no filesystem scheme
    // this sink could meet is one letter — file/hdfs/s3a/...)
    val schemeRe = "^[a-zA-Z][a-zA-Z0-9+.\\-]+:".r
    if (schemeRe.findFirstIn(path).isDefined) {
      val uri =
        try java.net.URI.create(path)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"graft-manifest-jsonl: path option '$path' looks scheme-qualified but is not a " +
                s"valid URI (${e.getMessage}); pass a plain local path or a well-formed file: URI",
              e
            )
        }
      require(
        uri.getScheme == "file",
        s"graft-manifest-jsonl is java.nio-backed and supports only local file paths; " +
          s"got scheme '${uri.getScheme}' in '$path'"
      )
      require(
        uri.getAuthority == null || uri.getAuthority.isEmpty,
        s"graft-manifest-jsonl: file: URI '$path' carries an authority " +
          s"('${uri.getAuthority}') — remote-host file URIs are not local paths; " +
          "use file:/abs/path or file:///abs/path"
      )
      try Paths.get(uri)
      catch {
        case e: RuntimeException =>
          throw new IllegalArgumentException(
            s"graft-manifest-jsonl: cannot resolve '$path' to a local filesystem path " +
              s"(${e.getMessage})",
            e
          )
      }
    } else Paths.get(path)
  }

  def validateSchema(schema: StructType): Unit = {
    val bad = schema.fields.filterNot(f => f.dataType match {
      case LongType | IntegerType | DoubleType | BooleanType | StringType => true
      case _                                                              => false
    })
    require(
      bad.isEmpty,
      s"graft-manifest-jsonl supports long/int/double/boolean/string columns; " +
        s"unsupported: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")} " +
        "(cast timestamps to epoch longs before writing)"
    )
  }

  /** Driver-side commit: promote the reported files, then publish the next
    * manifest version with put-if-absent. Losing the version race re-reads
    * and retries (append re-merges; truncate just re-versions — it is
    * serialized after the winner either way). The txn high-water mark makes
    * a replayed commit a no-op BEFORE any file is promoted.
    */
  private[sources] def commitFiles(
      dir: Path,
      tmp: Path,
      committed: Seq[FileCommit],
      schema: StructType,
      truncate: Boolean,
      txn: Option[(String, Long)]
  ): Unit = {
    Files.createDirectories(dir)
    var promoted = false
    var attempts = 0
    while (true) {
      val prior = readManifest(dir)
      txn.foreach { case (app, ver) =>
        if (prior.exists(_.txns.get(app).exists(_ >= ver))) return // replay: no-op
      }
      if (!truncate) prior.filter(_.files.nonEmpty).foreach { p =>
        val ps = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        require(
          sameShape(ps, schema),
          s"graft-manifest-jsonl append schema mismatch at $dir: manifest has " +
            s"${ps.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")} but the write has " +
            s"${schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")} — old files would be " +
            "misread under the new schema (use overwrite to replace the snapshot)"
        )
      }
      if (!promoted) {
        // files land before the manifest that references them; if the
        // publish below loses its race and retries, they stay in place
        // (still invisible — only the manifest grants visibility)
        committed.foreach { f =>
          Files.move(tmp.resolve(f.file), dir.resolve(f.file), StandardCopyOption.ATOMIC_MOVE)
        }
        promoted = true
      }
      val base      = if (truncate) Seq.empty else prior.map(_.files).getOrElse(Seq.empty)
      val priorTxns = prior.map(_.txns).getOrElse(Map.empty[String, Long])
      val next = Manifest(
        prior.map(_.version + 1).getOrElse(1L),
        schema.json,
        base ++ committed.map(f => FileCommitInfo(f.file, f.rows, f.bytes)),
        txn.fold(priorTxns) { case (a, v) => priorTxns + (a -> v) }
      )
      if (tryPublish(dir, next)) {
        // truncate drops the old files from VISIBILITY at the publish
        // above but leaves them on disk: every prior version file is a
        // complete snapshot, so `readAt` can time-travel to it until
        // `vacuum` retires the version — the Delta/Iceberg retention
        // model (physical delete is a retention policy, never part of
        // the commit).
        return
      }
      attempts += 1
      require(
        attempts < 50,
        s"graft-manifest-jsonl: lost the manifest version race $attempts times at $dir — " +
          "pathological commit contention, giving up (no partial state published)"
      )
    }
  }

  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType)).toSeq == b.fields.map(f => (f.name, f.dataType)).toSeq

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'            => b.append("\\\"")
      case '\\'           => b.append("\\\\")
      case c if c < 0x20  => b.append(f"\\u${c.toInt}%04x")
      case c              => b.append(c)
    }
    b.toString
  }

  def rowToJson(row: InternalRow, schema: StructType): String = {
    val parts = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case LongType    => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType =>
            val d = row.getDouble(i)
            if (d.isNaN || d.isInfinite) "null" else d.toString
          case BooleanType => row.getBoolean(i).toString
          case StringType  => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case other       => throw new IllegalStateException(s"unreachable: $other")
        }
      "\"" + esc(f.name) + "\":" + v
    }
    parts.mkString("{", ",", "}")
  }

  private[sources] def logDir(dir: Path): Path = dir.resolve("_manifests")
  private def versionFile(dir: Path, v: Long): Path = logDir(dir).resolve(f"v$v%020d.json")
  // pre-log layout (single mutable _MANIFEST.json): still readable as the
  // version-0 base so existing directories upgrade on their next commit
  private[sources] def legacyManifestPath(dir: Path): Path = dir.resolve("_MANIFEST.json")

  private def render(m: Manifest): String = {
    val files = m.files
      .map(f => s"""{"file":"${esc(f.file)}","rows":${f.rows},"bytes":${f.bytes}}""")
      .mkString("[", ",", "]")
    val txns = m.txns.toSeq.sortBy(_._1)
      .map { case (a, v) => s""""${esc(a)}":$v""" }.mkString("{", ",", "}")
    s"""{"version":${m.version},"schema":${m.schemaJson},"files":$files,"txns":$txns}"""
  }

  /** Put-if-absent publish of one complete snapshot: write the body to a
    * temp name, then HARD-LINK it to the version file — link(2) is atomic
    * and fails if the target exists, so exactly one committer wins a
    * version and a reader never observes partial content. Filesystems
    * without hard links fall back to a fail-if-exists move (the same
    * contract with a narrower atomicity guarantee, as Delta does on
    * stores without native put-if-absent).
    */
  private def tryPublish(dir: Path, m: Manifest): Boolean = {
    val log = logDir(dir)
    Files.createDirectories(log)
    val target = versionFile(dir, m.version)
    val tmp    = log.resolve(s".v${m.version}.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, render(m).getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
      case _: UnsupportedOperationException =>
        try { Files.move(tmp, target); true }
        catch { case _: FileAlreadyExistsException => Files.deleteIfExists(tmp); false }
    }
  }

  private def versionFiles(dir: Path): Seq[Path] = {
    val log = logDir(dir)
    if (!Files.isDirectory(log)) Seq.empty
    else Files.list(log).iterator().asScala
      .filter(p => p.getFileName.toString.matches("v\\d{20}\\.json")).toSeq
      .sortBy(_.getFileName.toString)
  }

  def readManifest(dir: Path): Option[Manifest] =
    versionFiles(dir).lastOption match {
      case Some(p) => Some(parseManifest(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
      case scala.None =>
        val legacy = legacyManifestPath(dir)
        if (!Files.exists(legacy)) scala.None
        else Some(parseManifest(new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8)))
    }

  /** Time travel: the snapshot as of a SPECIFIC committed version —
    * every version file is a complete snapshot (not a delta), so this is
    * one read, no log replay. Fails loudly on a version that never
    * existed or was vacuumed.
    */
  def readManifestAt(dir: Path, version: Long): Manifest = {
    val p = versionFile(dir, version)
    if (!Files.exists(p))
      throw new IllegalArgumentException(
        s"no manifest version $version at $dir — available: ${versions(dir).mkString(", ")} " +
          "(never committed, or removed by vacuum)")
    parseManifest(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** Committed versions still present in the log, ascending. */
  def versions(dir: Path): Seq[Long] =
    versionFiles(dir).map(_.getFileName.toString.stripPrefix("v").stripSuffix(".json").toLong)

  /** Retention: keep the newest `keepVersions` snapshots, delete older
    * version files AND any data file no surviving snapshot references
    * (overwrite leaves old files on disk precisely so time travel works;
    * vacuum is where they actually die). The CURRENT snapshot is always
    * kept. Returns (versions removed, data files removed).
    */
  def vacuum(dir: Path, keepVersions: Int): (Long, Long) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val all = versionFiles(dir)
    if (all.size <= keepVersions) return (0L, 0L)
    val (drop, keep) = all.splitAt(all.size - keepVersions)
    val keptFiles = keep.flatMap { p =>
      parseManifest(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).files.map(_.file)
    }.toSet
    val droppedFiles = drop.flatMap { p =>
      parseManifest(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).files.map(_.file)
    }.toSet
    val dead = droppedFiles -- keptFiles
    // order matters: delete the version POINTERS first, so a concurrent
    // time-travel read can never hold a manifest whose files are gone
    drop.foreach(Files.deleteIfExists(_))
    dead.foreach(f => Files.deleteIfExists(dir.resolve(f)))
    (drop.size.toLong, dead.size.toLong)
  }

  /** Snapshot read pinned to a version (time travel). */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val dir = ManifestJsonl.localPath(path)
    toDf(spark, dir, readManifestAt(dir, version))
  }

  private def parseManifest(body: String): Manifest = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(body)
    val schemaJson = org.json4s.jackson.JsonMethods.compact(j \ "schema")
    val version = (j \ "version") match {
      case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L
    }
    val files = (j \ "files") match {
      case JArray(items) => items.map { it =>
        FileCommitInfo(
          (it \ "file").asInstanceOf[JString].s,
          (it \ "rows") match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L },
          (it \ "bytes") match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L }
        )
      }
      case _ => Seq.empty
    }
    val txns = (j \ "txns") match {
      case JObject(fields) => fields.collect {
        case (k, JInt(n))  => k -> n.toLong
        case (k, JLong(n)) => k -> n
      }.toMap
      case _ => Map.empty[String, Long]
    }
    Manifest(version, schemaJson, files, txns)
  }

  /** Snapshot read: only manifest-listed files are visible — stray files
    * in the directory (crashed writers, concurrent attempts) are not.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = ManifestJsonl.localPath(path)
    val m = readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path — nothing committed")
    )
    toDf(spark, dir, m)
  }

  private def toDf(spark: SparkSession, dir: Path, m: Manifest): DataFrame = {
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    val files  = m.files.map(f => dir.resolve(f.file).toString)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(files: _*)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  /** Remove a now-empty staging parent; concurrent writers may still own
    * sibling query dirs, so only an empty directory is removed — and the
    * removal itself is best-effort: between the emptiness check and the
    * delete a concurrent writer may legitimately CREATE its own
    * `_tmp/<queryId>` child, making the parent non-empty again. That is
    * the normal overlap of two healthy commits, not an error, so the
    * resulting DirectoryNotEmpty/NoSuchFile must not fail a commit whose
    * data and manifest already published (it did, flakily, in the
    * 4-writer race spec).
    */
  def deleteIfEmptyDir(p: Path): Unit =
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      val empty    = !children.iterator().hasNext
      children.close()
      if (empty) {
        try Files.deleteIfExists(p)
        catch {
          case _: java.nio.file.DirectoryNotEmptyException => () // new sibling won the race
          case _: java.nio.file.NoSuchFileException        => () // another cleaner won it
        }
      }
    }
}
