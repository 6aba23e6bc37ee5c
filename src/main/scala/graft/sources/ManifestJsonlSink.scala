package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Manifest-committed JSONL sink on the DataSource V2 write API — the
  * write-side twin of the repo's V2 read connector (SyntheticEventsSource)
  * and a minimal honest version of the commit protocol every lakehouse
  * table format (Delta/Iceberg/Hudi) is built around:
  *
  *  - task writers land data in `_tmp/<queryId>/` under ATTEMPT-unique
  *    names and report them via `WriterCommitMessage`;
  *  - the driver's `BatchWrite.commit` promotes exactly the reported
  *    files and then atomically swaps `_MANIFEST.json` (write-temp +
  *    rename) — a reader either sees the old snapshot or the new one,
  *    never a torn directory listing;
  *  - orphan files from failed or speculative task attempts are never
  *    promoted and die with `_tmp` — visibility is defined by the
  *    manifest, not by what `ls` returns (the property that makes
  *    atomic writes possible on stores without atomic directory moves);
  *  - `abort` removes `_tmp` and leaves the previous snapshot intact.
  *
  * `ManifestJsonl.read` consumes only manifest-listed files, so stray
  * files in the directory are invisible by construction. Append mode
  * unions the old manifest's files with the new ones; overwrite
  * (SupportsTruncate) swaps the manifest to exactly the new files and
  * deletes the replaced ones AFTER the swap (readers holding the old
  * manifest finish their scan first on a posix-delete store; on S3-like
  * stores the delete is deferred garbage collection — same protocol).
  *
  * Local-filesystem `java.nio` file ops keep the sink testable in this
  * sandbox; on a cluster the same sequence maps 1:1 onto Hadoop
  * FileSystem rename/delete. Scale shape: one manifest write per commit,
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
    new ManifestJsonlTable(path, schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

private class ManifestJsonlTable(path: String, schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-manifest-jsonl(`$path`)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ManifestWriteBuilder(path, info.schema(), info.queryId(), truncate = false)
}

private class ManifestWriteBuilder(
    path: String,
    schema: StructType,
    queryId: String,
    truncate: Boolean
) extends WriteBuilder with SupportsTruncate {
  ManifestJsonl.validateSchema(schema)

  override def truncate(): WriteBuilder =
    new ManifestWriteBuilder(path, schema, queryId, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ManifestBatchWrite(path, schema, queryId, truncate)
  }
}

private case class FileCommit(file: String, rows: Long, bytes: Long) extends WriterCommitMessage

private class ManifestBatchWrite(
    path: String,
    schema: StructType,
    queryId: String,
    truncate: Boolean
) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val tmp = dir.resolve("_tmp").resolve(queryId)
    // promote EXACTLY the reported files; anything else in _tmp is a
    // failed/speculative attempt and is never made visible
    val committed = messages.toSeq.collect { case f: FileCommit => f }
    committed.foreach { f =>
      Files.move(tmp.resolve(f.file), dir.resolve(f.file), StandardCopyOption.ATOMIC_MOVE)
    }
    val prior =
      if (truncate) Seq.empty
      else ManifestJsonl.readManifest(dir).map(_.files).getOrElse(Seq.empty)
    val next = prior ++ committed.map(f => ManifestJsonl.FileCommitInfo(f.file, f.rows, f.bytes))
    ManifestJsonl.writeManifestAtomically(dir, ManifestJsonl.Manifest(schema.json, next))
    if (truncate) {
      // old files drop out of visibility at the manifest swap above; the
      // physical delete is cleanup, not the visibility boundary
      val keep = next.map(_.file).toSet
      val stale = Files.list(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter(p => p.getFileName.toString.startsWith("part-") && !keep(p.getFileName.toString))
        .toList
      stale.foreach(Files.deleteIfExists(_))
    }
    ManifestJsonl.deleteRecursively(tmp)
    ManifestJsonl.deleteIfEmptyDir(dir.resolve("_tmp"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    ManifestJsonl.deleteRecursively(Paths.get(path).resolve("_tmp").resolve(queryId))
    ManifestJsonl.deleteIfEmptyDir(Paths.get(path).resolve("_tmp"))
  }
}

private class ManifestWriterFactory(path: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema, queryId, partitionId, taskId)
}

private class ManifestDataWriter(
    path: String,
    schema: StructType,
    queryId: String,
    partitionId: Int,
    taskId: Long
) extends DataWriter[InternalRow] {

  // taskId is unique per ATTEMPT, so a speculative retry of the same
  // partition writes a different file and only the committed attempt's
  // name reaches the driver
  private val fileName = f"part-$partitionId%05d-$taskId.jsonl"
  private val tmpDir   = Paths.get(path).resolve("_tmp").resolve(queryId)
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

  final case class Manifest(schemaJson: String, files: Seq[FileCommitInfo])
  final case class FileCommitInfo(file: String, rows: Long, bytes: Long)

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

  private[sources] def manifestPath(dir: Path): Path = dir.resolve("_MANIFEST.json")

  def writeManifestAtomically(dir: Path, m: Manifest): Unit = {
    val files = m.files
      .map(f => s"""{"file":"${esc(f.file)}","rows":${f.rows},"bytes":${f.bytes}}""")
      .mkString("[", ",", "]")
    val body = s"""{"schema":${m.schemaJson},"files":$files}"""
    val tmp  = dir.resolve(s"._MANIFEST.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifest(dir: Path): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return None
    val body = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(body)
    val schemaJson = org.json4s.jackson.JsonMethods.compact(j \ "schema")
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
    Some(Manifest(schemaJson, files))
  }

  /** Snapshot read: only manifest-listed files are visible — stray files
    * in the directory (crashed writers, concurrent attempts) are not.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = Paths.get(path)
    val m = readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no _MANIFEST.json at $path — nothing committed")
    )
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
    * sibling query dirs, so only an empty directory is removed.
    */
  def deleteIfEmptyDir(p: Path): Unit =
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      val empty    = !children.iterator().hasNext
      children.close()
      if (empty) Files.deleteIfExists(p)
    }
}
