package graft.core

/** The reference's configuration layer
  * (`/root/reference/src/kbrowse/config.clj`, `config/default.yml`): a flat
  * YAML file at `$CONFIG` (scalars + one level of string→string maps),
  * with every value overridable by an environment variable — int knobs via
  * `ENV_VAR=123`, map knobs via `ENV_VAR='foo=a,bar=b'`.
  *
  * The YAML subset needed is tiny (flat `key: value` plus indented
  * `"k": "v"` map entries, `#` comments), so it is hand-parsed — no new
  * dependency resolves offline (SURVEY.md §1.3).
  */
final case class Config(
    port: Int,
    kafkaTopicsCacheSleepSeconds: Int,
    kafkaTimeout: Int,
    kafkaSeekToTimestampTolerance: Int, // dead knob, kept for parity
    cacheMaxItems: Int,
    cacheTtlMinutes: Int,
    cacheItemSizeLimit: Int,
    stopConsumersAfterNSeconds: Int,
    kafkaBootstrapServers: Map[String, String],
    kafkaSchemaRegistryUrls: Map[String, String])

object Config {

  val Defaults: Config = Config(
    port = 4000,
    kafkaTopicsCacheSleepSeconds = 300,
    kafkaTimeout = 5000,
    kafkaSeekToTimestampTolerance = 10000,
    cacheMaxItems = 100,
    cacheTtlMinutes = 60,
    cacheItemSizeLimit = 4 * 1024 * 1024,
    stopConsumersAfterNSeconds = 86400,
    kafkaBootstrapServers = Map("local" -> "localhost:9092"),
    kafkaSchemaRegistryUrls = Map.empty)

  /** Parse the flat YAML subset: `key: value`, one-level nested maps,
    * comments, quoted strings. */
  def parseYaml(text: String): Map[String, Any] = {
    var result = Map.empty[String, Any]
    var currentMap: Option[String] = None
    text.linesIterator.foreach { raw =>
      val noComment = raw.replaceAll("(^|\\s)#.*$", "")
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val line = noComment.trim
        line.split(":", 2) match {
          case Array(k, v) =>
            val key = unquote(k.trim)
            val value = unquote(v.trim)
            if (indented && currentMap.isDefined) {
              val m = result(currentMap.get).asInstanceOf[Map[String, String]]
              result += currentMap.get -> (m + (key -> value))
            } else if (value.isEmpty) { // map header
              currentMap = Some(key)
              result += key -> Map.empty[String, String]
            } else {
              currentMap = None
              result += key -> value
            }
          case _ => ()
        }
      }
    }
    result
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
    else s

  /** `ENV_VAR='foo=a,bar=b'` → map, like the reference's `get-map`. */
  def parseMapValue(v: String): Map[String, String] =
    v.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val Array(k, value) = kv.split("=", 2)
      k -> value
    }.toMap

  /** Load: `$CONFIG` YAML (or defaults) + per-key env overrides. */
  def load(env: Map[String, String] = sys.env,
      readFile: String => Option[String] = p =>
        try Some(scala.io.Source.fromFile(p).mkString) catch { case _: Exception => None })
      : Config = {
    val yaml = env.get("CONFIG").flatMap(readFile).map(parseYaml).getOrElse(Map.empty)
    def int(envKey: String, yamlKey: String, default: Int): Int =
      env.get(envKey).map(_.toInt)
        .orElse(yaml.get(yamlKey).map(_.toString.toInt))
        .getOrElse(default)
    def map(envKey: String, yamlKey: String, default: Map[String, String]): Map[String, String] =
      env.get(envKey).map(parseMapValue)
        .orElse(yaml.get(yamlKey).collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, String]] })
        .getOrElse(default)
    val d = Defaults
    Config(
      port = int("KBROWSE_PORT", "port", d.port),
      kafkaTopicsCacheSleepSeconds = int("KAFKA_TOPICS_CACHE_SLEEP_SECONDS",
        "kafka-topics-cache-sleep-seconds", d.kafkaTopicsCacheSleepSeconds),
      kafkaTimeout = int("KAFKA_TIMEOUT", "kafka-timeout", d.kafkaTimeout),
      kafkaSeekToTimestampTolerance = int("KAFKA_SEEK_TO_TIMESTAMP_TOLERANCE",
        "kafka-seek-to-timestamp-tolerance", d.kafkaSeekToTimestampTolerance),
      cacheMaxItems = int("CACHE_MAX_ITEMS", "cache-max-items", d.cacheMaxItems),
      cacheTtlMinutes = int("CACHE_TTL_MINUTES", "cache-ttl-minutes", d.cacheTtlMinutes),
      cacheItemSizeLimit = int("CACHE_ITEM_SIZE_LIMIT", "cache-item-size-limit",
        d.cacheItemSizeLimit),
      stopConsumersAfterNSeconds = int("STOP_CONSUMERS_AFTER_N_SECONDS",
        "stop-consumers-after-n-seconds", d.stopConsumersAfterNSeconds),
      kafkaBootstrapServers = map("KAFKA_BOOTSTRAP_SERVERS",
        "kafka-bootstrap-servers", d.kafkaBootstrapServers),
      kafkaSchemaRegistryUrls = map("KAFKA_SCHEMA_REGISTRY_URLS",
        "kafka-schema-registry-urls", d.kafkaSchemaRegistryUrls))
  }
}
