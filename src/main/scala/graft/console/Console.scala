package graft.console

import com.fasterxml.jackson.databind.ObjectMapper

/** C6 — the console's incremental JSON parser
  * (`/root/reference/resources/public/main.js:403-423`): the chunked
  * `/search` response is one ever-growing JSON array; rather than wait
  * for the close bracket, the console tracks brace depth from a resume
  * index (`dataParseFromIndex`, initialized past the pioneer prefix,
  * `main.js:19-20`) and emits every object the moment its closing brace
  * arrives. A partially received object is simply rescanned from its
  * opening brace on the next chunk.
  *
  * Divergence, documented: the reference counts braces *naively*, so a
  * record whose string value contains an unbalanced `{`/`}` desynchronizes
  * its parser (a real quirk — value `"{oops"` breaks the reference
  * console). This parser tracks JSON string/escape state, so brace
  * characters inside strings are data, not structure.
  */
object IncrementalJson {

  /** The stream preamble the parser resumes after (`main.js:19`). */
  val PioneerPrefix = """[{"type":"pioneer"}"""

  /** The error-body prefix the console checks before parsing
    * (`main.js:18`, checked at `main.js:522`). */
  val ErrorPrefix = """{"error":"""

  def isError(responseText: String): Boolean = responseText.startsWith(ErrorPrefix)

  /** One parser per streamed response; feed chunks as they arrive, get
    * back every object completed by that chunk. Not thread-safe (neither
    * is an XHR). */
  final class Parser(skipPrefix: String = PioneerPrefix) {
    private val buf = new java.lang.StringBuilder
    private var from = skipPrefix.length // dataParseFromIndex

    def append(chunk: String): Seq[String] = {
      buf.append(chunk)
      val out = Seq.newBuilder[String]
      var depth = 0
      var inString = false
      var escaped = false
      var i = from
      while (i < buf.length) {
        val c = buf.charAt(i)
        if (inString) {
          if (escaped) escaped = false
          else if (c == '\\') escaped = true
          else if (c == '"') inString = false
        } else c match {
          case '"' => inString = true
          case '{' =>
            if (depth == 0) from = i // skip commas/whitespace before the object
            depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) {
              out += buf.substring(from, i + 1)
              from = i + 1
            }
          case _ => ()
        }
        i += 1
      }
      out.result()
    }
  }
}

/** C7 — shareable URL state (`main.js:428-506`): the full form state is
  * serialized as a JSON object directly into the window location's query
  * string (`updateDataURL`, `main.js:495-506`) and restored on load
  * (`populateFromUri`, `main.js:318-374`), so a console URL IS the query
  * it shows. Field names match the reference exactly — a kbrowse console
  * URL pastes into this console and vice versa.
  */
final case class ConsoleState(
    key: String = "",
    valRegex: String = "",
    bootstrapServers: String = "",
    topic: String = "",
    relativeOffset: String = "",
    follow: Boolean = false,
    defaultPartition: Boolean = false,
    keyDeserializer: String = "",
    valueDeserializer: String = "",
    schemaRegistryURL: String = "",
    partitions: String = "")

object ConsoleState {
  private val mapper = new ObjectMapper()

  /** `updateDataURL` (`main.js:495-506`): `?` + the JSON-serialized state. */
  def toUrlState(s: ConsoleState): String = {
    val o = mapper.createObjectNode()
    o.put("key", s.key); o.put("valRegex", s.valRegex)
    o.put("bootstrapServers", s.bootstrapServers); o.put("topic", s.topic)
    o.put("relativeOffset", s.relativeOffset)
    o.put("follow", s.follow); o.put("defaultPartition", s.defaultPartition)
    o.put("keyDeserializer", s.keyDeserializer)
    o.put("valueDeserializer", s.valueDeserializer)
    o.put("schemaRegistryURL", s.schemaRegistryURL)
    o.put("partitions", s.partitions)
    "?" + mapper.writeValueAsString(o)
  }

  /** `populateFromUri` (`main.js:318-374`): parse the location search
    * back into state; empty/absent search restores nothing. */
  def fromUrlState(search: String): Option[ConsoleState] = {
    if (search == null || search.length <= 1) return None
    val body = java.net.URLDecoder.decode(search.substring(1), "UTF-8")
    val n = mapper.readTree(body)
    def str(f: String) = Option(n.get(f)).map(_.asText("")).getOrElse("")
    def bool(f: String) = Option(n.get(f)).exists(_.asBoolean(false))
    Some(ConsoleState(
      key = str("key"), valRegex = str("valRegex"),
      bootstrapServers = str("bootstrapServers"), topic = str("topic"),
      relativeOffset = str("relativeOffset"),
      follow = bool("follow"), defaultPartition = bool("defaultPartition"),
      keyDeserializer = str("keyDeserializer"),
      valueDeserializer = str("valueDeserializer"),
      schemaRegistryURL = str("schemaRegistryURL"),
      partitions = str("partitions")))
  }

  /** `getPath` (`main.js:446-490`): the console → API arg mapping. Two
    * deliberate console-side semantics to preserve: `print-offset` is
    * always 10000 (`main.js:455`), and the VALUE pattern is wrapped
    * `.*pat.*` (contains-match) while the key pattern stays exact
    * (`main.js:460-465`, noted in SURVEY §2.2 P3). */
  def searchPath(s: ConsoleState, endpoint: String = "search"): String = {
    val args = Seq.newBuilder[(String, String)]
    args += "bootstrap-servers" -> s.bootstrapServers
    args += "topics" -> s.topic
    args += "print-offset" -> "10000"
    if (s.key.nonEmpty) args += "key-regex" -> s.key
    if (s.valRegex.nonEmpty) args += "val-regex" -> (".*" + s.valRegex + ".*")
    if (s.keyDeserializer.nonEmpty) args += "key-deserializer" -> s.keyDeserializer
    if (s.valueDeserializer.nonEmpty) args += "value-deserializer" -> s.valueDeserializer
    if (s.schemaRegistryURL.nonEmpty) args += "schema-registry-url" -> s.schemaRegistryURL
    if (s.relativeOffset.nonEmpty) args += "relative-offset" -> s.relativeOffset
    if (s.follow) args += "follow" -> "true"
    if (s.defaultPartition) args += "default-partition" -> "true"
    if (s.partitions.nonEmpty) args += "partitions" -> s.partitions
    val qs = args.result().map { case (k, v) => s"$k=$v" }.mkString("&")
    encodeURI(s"/$endpoint?$qs")
  }

  /** JS `encodeURI` semantics (`main.js:489`): percent-encode UTF-8 bytes
    * of everything except the unreserved/reserved set encodeURI keeps. */
  def encodeURI(s: String): String = {
    val keep = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789" +
      ";,/?:@&=+$-_.!~*'()#"
    val sb = new java.lang.StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (keep.indexOf(c) >= 0) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
}
