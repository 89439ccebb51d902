package graft.functions

/** Confluent Schema Registry wire format (public spec): a magic `0x00`
  * byte, a 4-byte big-endian schema id, then the Avro-encoded payload.
  * The reference wires `KafkaAvroDeserializer` behind a registry URL
  * (`/root/reference/src/kbrowse/kafka.clj:38`, `search.clj:132-135`);
  * offline there is no registry, so this is the interface-only binding
  * (SURVEY.md §7.1): parse the envelope, surface the schema id, leave
  * payload decoding to a registry-backed implementation.
  */
object ConfluentWire {
  final case class Envelope(schemaId: Int, payload: Array[Byte])

  def parse(bytes: Array[Byte]): Envelope = {
    require(bytes.length >= 5, s"wire message too short: ${bytes.length} bytes")
    require(bytes(0) == 0x0, f"bad magic byte 0x${bytes(0)}%02x (expected 0x00)")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    Envelope(id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }
}
