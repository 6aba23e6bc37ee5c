package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ResetSpec

/** The Kafka edge can't run without a broker, but its option contract is
  * pure data — assert it, including the A18 reset plumbing into
  * startingOffsets (the reference's consumer-group seek semantics).
  */
class KafkaOptionsSpec extends AnyFunSuite {

  test("cdc source options carry subscription, position and throttle") {
    assert(KafkaCdc.cdcSourceOptions("k:9092", "dbserver1.public.animal") === Map(
      "kafka.bootstrap.servers" -> "k:9092",
      "subscribe"               -> "dbserver1.public.animal",
      "startingOffsets"         -> "earliest"
    ))
    // the DLQ profile throttles like the reference's max.poll.records: 10
    assert(
      KafkaCdc.cdcSourceOptions("k:9092", "animal-transformer-dlq", maxOffsetsPerTrigger = Some(10L))
        .get("maxOffsetsPerTrigger") === Some("10")
    )
  }

  test("A18 reset specs plug directly into startingOffsets") {
    def opts(spec: ResetSpec) = KafkaCdc.cdcSourceOptions(
      "k:9092", "t",
      startingOffsets = ResetSpec.kafkaStartingOffsets(spec, "t")
    )("startingOffsets")
    assert(opts(ResetSpec.Earliest) === "earliest")
    assert(opts(ResetSpec.Latest) === "latest")
    assert(opts(ResetSpec.Offsets(Map(0 -> 5L))) === """{"t":{"0":5}}""")
  }
}
