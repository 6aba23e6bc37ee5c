package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Client-side schema-compatibility gate, mirroring the registry-side check
  * the reference delegates to Schema Registry (docker/connect
  * register-connector.json:15-18 auto-registers writer schemas and relies on
  * the registry's subject compatibility mode to reject breaking evolution).
  *
  * Checking BEFORE the POST matters operationally: a producer that only
  * learns about incompatibility from the registry's 409 has already built
  * and serialized a batch against the bad schema; the client-side gate
  * fails fast at topology-construction time with the precise
  * incompatibility list instead of a remote status code.
  *
  * Semantics are Avro's own reader/writer resolution
  * (`org.apache.avro.SchemaCompatibility`, the same checker the Confluent
  * registry uses underneath):
  *   - BACKWARD: consumers on the NEW schema can read data produced with
  *     the latest OLD schema (reader = new, writer = old).
  *   - FORWARD: consumers still on the OLD schema can read data produced
  *     with the NEW schema (reader = old, writer = new).
  *   - FULL: both directions.
  *   - NONE: no gate (registry mode NONE).
  * Like Confluent's non-transitive modes, only the latest registered
  * version is checked.
  */
object SchemaCompat {
  sealed trait Mode
  case object Backward extends Mode
  case object Forward  extends Mode
  case object Full     extends Mode
  case object None     extends Mode

  /** Incompatibility messages for evolving `oldSchemaJson` → `newSchemaJson`
    * under `mode`; empty = compatible.
    */
  def check(mode: Mode, oldSchemaJson: String, newSchemaJson: String): Seq[String] = {
    val oldS = new Schema.Parser().parse(oldSchemaJson)
    val newS = new Schema.Parser().parse(newSchemaJson)
    def pair(reader: Schema, writer: Schema, dir: String): Seq[String] = {
      val r = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer).getResult
      if (r.getCompatibility == SchemaCompatibilityType.COMPATIBLE) Seq.empty
      else r.getIncompatibilities.asScala.toSeq.map(i =>
        s"$dir ${i.getType} at ${i.getLocation}: ${i.getMessage}")
    }
    mode match {
      case Backward => pair(newS, oldS, "BACKWARD")
      case Forward  => pair(oldS, newS, "FORWARD")
      case Full     => pair(newS, oldS, "BACKWARD") ++ pair(oldS, newS, "FORWARD")
      case None     => Seq.empty
    }
  }

  /** Gate + register: verifies `schemaJson` against the subject's latest
    * version under `mode`, then registers. Throws
    * `IllegalArgumentException` naming every incompatibility when the gate
    * rejects — nothing is sent to the registry in that case. First
    * registration of a subject always passes (nothing to be compatible
    * with), matching registry behavior.
    */
  def registerChecked(
      registry: SchemaRegistryClient,
      subject: String,
      schemaJson: String,
      mode: Mode = Backward
  ): Int = {
    registry.latest(subject).foreach { case (_, latestJson) =>
      val problems = check(mode, latestJson, schemaJson)
      if (problems.nonEmpty)
        throw new IllegalArgumentException(
          s"schema for subject '$subject' fails $mode compatibility with latest version: " +
            problems.mkString("; "))
    }
    registry.register(subject, schemaJson)
  }
}
