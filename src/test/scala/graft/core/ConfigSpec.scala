package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Config layer parity: YAML + env overrides with the reference's knobs
  * and defaults (`config.clj`, `config/default.yml`). */
class ConfigSpec extends AnyFunSuite {

  private val refYaml =
    """# comment
      |port: 4000
      |kafka-timeout: 5000
      |cache-item-size-limit: 4194304 # 4 MB
      |kafka-bootstrap-servers:
      |    "local": "localhost:9092"
      |""".stripMargin

  test("defaults match the reference's operational envelope") {
    val c = Config.load(env = Map.empty)
    assert(c.port == 4000)
    assert(c.kafkaTimeout == 5000)
    assert(c.cacheItemSizeLimit == 4194304)
    assert(c.stopConsumersAfterNSeconds == 86400)
    assert(c.cacheMaxItems == 100 && c.cacheTtlMinutes == 60)
    assert(c.kafkaTopicsCacheSleepSeconds == 300)
  }

  test("YAML file values are read (flat scalars + nested string map)") {
    val c = Config.load(
      env = Map("CONFIG" -> "x.yml", "KBROWSE_PORT" -> "4001"),
      readFile = _ => Some(refYaml))
    assert(c.port == 4001) // env beats yaml
    assert(c.kafkaBootstrapServers == Map("local" -> "localhost:9092"))
  }

  test("env var overrides: ints and 'foo=a,bar=b' maps") {
    val c = Config.load(env = Map(
      "CACHE_MAX_ITEMS" -> "7",
      "KAFKA_BOOTSTRAP_SERVERS" -> "prod=p:9092,stage=s:9092"))
    assert(c.cacheMaxItems == 7)
    assert(c.kafkaBootstrapServers == Map("prod" -> "p:9092", "stage" -> "s:9092"))
  }

  test("the reference's shipped default.yml parses") {
    val parsed = Config.parseYaml(refYaml)
    assert(parsed("port") == "4000")
    assert(parsed("kafka-bootstrap-servers") == Map("local" -> "localhost:9092"))
  }
}
