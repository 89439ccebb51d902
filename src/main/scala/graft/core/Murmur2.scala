package graft.core

/** Kafka-compatible murmur2 hash + partitioner.
  *
  * Reimplements the algorithm of Kafka's `DefaultPartitioner` /
  * `org.apache.kafka.common.utils.Utils.murmur2` (public Apache Kafka
  * source), which the reference invokes through a fabricated single-node
  * `Cluster` to compute key → partition placement
  * (`/root/reference/src/kbrowse/kafka.clj:59-70`). Used here both to
  * synthesize the deterministic partition column of the parquet record-log
  * stand-in (FIXTURES.md §B.1) and for `--default-partition`-style
  * key-hash partition pruning (SURVEY.md §2.3 A2).
  *
  * Known-answer vector from the reference's own integration harness:
  * key "k2" with 10 partitions lands on partition 3
  * (`/root/reference/run-integration-tests:153-158`).
  */
object Murmur2 {
  private final val Seed = 0x9747b28c
  private final val M = 0x5bd1e995

  def hash(data: Array[Byte]): Int = {
    val length = data.length
    var h = Seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= M
      k ^= k >>> 24
      k *= M
      h *= M
      h ^= k
      i += 1
    }
    val base = length & ~3
    (length % 4) match {
      case 3 =>
        h ^= (data(base + 2) & 0xff) << 16
        h ^= (data(base + 1) & 0xff) << 8
        h ^= data(base) & 0xff
        h *= M
      case 2 =>
        h ^= (data(base + 1) & 0xff) << 8
        h ^= data(base) & 0xff
        h *= M
      case 1 =>
        h ^= data(base) & 0xff
        h *= M
      case _ => ()
    }
    h ^= h >>> 13
    h *= M
    h ^= h >>> 15
    h
  }

  /** Kafka's Utils.toPositive: cheap abs that maps MinValue safely. */
  def toPositive(i: Int): Int = i & 0x7fffffff

  def partition(key: Array[Byte], numPartitions: Int): Int =
    toPositive(hash(key)) % numPartitions

  def partition(key: String, numPartitions: Int): Int =
    partition(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), numPartitions)
}
