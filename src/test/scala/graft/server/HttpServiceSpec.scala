package graft.server

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Murmur2

/** C3–C5 route contract over the JDK server binding. */
class HttpServiceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // The fixture dir is a CONFIGURED cluster ("sandbox"): /pipeline resolves
  // `dir` through this map — names resolve, configured raw locations pass,
  // anything else is 400 (VERDICT r11 item 4).
  private lazy val svc = new HttpService(spark, port = 0,
    graft.core.Config.Defaults.copy(
      kafkaBootstrapServers = Map("sandbox" -> TestSpark.Sf))).start()
  private val mapper = new ObjectMapper()

  private def get(path: String): (Int, String) = {
    val url = new URI(s"http://localhost:${svc.boundPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (stream == null) "" else Source.fromInputStream(stream).mkString
    (status, body)
  }

  private val searchQs =
    s"bootstrap-servers=${TestSpark.Sf}&topics=events&key-regex=13"

  test("/health") {
    assert(get("/health") == (200, "OK"))
  }

  test("/search streams a pioneer-led JSON array of matching records") {
    val (status, body) = get(s"/search?$searchQs")
    assert(status == 200)
    val arr = mapper.readTree(body)
    assert(arr.isArray && arr.size() > 1)
    assert(arr.get(0).get("type").asText() == "pioneer")
    assert(arr.get(1).get("key").asLong() == 13L) // "13" try-parsed to number
  }

  test("/search with --follow streams the tail; the L3 kill switch closes the array") {
    // A short wall-clock deadline stands in for the reference's
    // stop-consumers-after-n-seconds guard (`search.clj:118-122`): the
    // snapshot streams out as chunks, then the deadline expires and the
    // JSON array is closed cleanly.
    val fsvc = new HttpService(spark, port = 0,
      graft.core.Config.Defaults.copy(stopConsumersAfterNSeconds = 5)).start()
    try {
      val t0 = System.nanoTime()
      val url = new URI(s"http://localhost:${fsvc.boundPort}/search?$searchQs&follow").toURL
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(120000)
      assert(conn.getResponseCode == 200)
      val body = Source.fromInputStream(conn.getInputStream).mkString
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      assert(elapsedSec >= 4.5) // held open until the kill switch, not a bounded scan
      val arr = mapper.readTree(body) // parses ⇒ the deadline closed the array
      assert(arr.isArray && arr.size() > 1)
      assert(arr.get(0).get("type").asText() == "pioneer")
      (1 until arr.size()).foreach { i =>
        assert(arr.get(i).get("key").asLong() == 13L)
        assert(arr.get(i).get("type").asText() == "result")
      }
    } finally fsvc.stop()
  }

  test("follow: client disconnect kills the streaming query on next write (L4)") {
    // Own fixture dir → own watched stream dir, so appending a file here
    // cannot disturb other suites' streaming counts.
    val fixture = java.nio.file.Files.createTempDirectory("graft-follow-l4")
    java.nio.file.Files.createSymbolicLink(fixture.resolve("events.parquet"),
      java.nio.file.Paths.get(TestSpark.Sf, "events.parquet"))
    val fsvc = new HttpService(spark, port = 0,
      graft.core.Config.Defaults.copy(stopConsumersAfterNSeconds = 600)).start()
    try {
      val url = new URI(
        s"http://localhost:${fsvc.boundPort}/search?bootstrap-servers=$fixture&topics=events&follow").toURL
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(120000)
      assert(conn.getResponseCode == 200)
      val is = conn.getInputStream
      is.read(new Array[Byte](64)) // ensure the stream is flowing…
      is.close(); conn.disconnect() // …then walk away
      // Append a batch to the watched dir so a write is guaranteed after
      // the disconnect: the broken pipe must fail the query (not let it
      // run to the 600 s deadline).
      val streamDir = graft.streaming.StreamingLog.streamDir(fixture.toString)
      val tmpOut = java.nio.file.Files.createTempDirectory("graft-follow-append").toString
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(
          "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"${TestSpark.Sf}/events.parquet").limit(100)
        .coalesce(1).write.mode("overwrite").parquet(tmpOut)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut)).iterator()
      val dst = java.nio.file.Paths.get(streamDir, "appended.parquet")
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".parquet")) java.nio.file.Files.copy(p, dst)
      }
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        spark.streams.active.exists(q => Option(q.name).exists(_.startsWith("graft-follow"))))
        Thread.sleep(250)
      assert(!spark.streams.active.exists(q =>
        Option(q.name).exists(_.startsWith("graft-follow"))))
    } finally fsvc.stop()
  }

  test("/search with bad args → 400 error contract (C4)") {
    val (status, body) = get("/search?topics=events")
    assert(status == 400)
    assert(mapper.readTree(body).get("error").asText().contains("bootstrap-servers"))
  }

  test("unknown topic → 400 (plan analyzes before the response commits)") {
    val (status, body) = get(
      s"/search?bootstrap-servers=${TestSpark.Sf}&topics=nonexistent")
    assert(status == 400)
    assert(mapper.readTree(body).get("error").asText().contains("unknown topic"))
  }

  test("malformed numeric arg → 400 before the stream commits") {
    val (status, body) = get(
      s"/search?bootstrap-servers=${TestSpark.Sf}&topics=events&relative-offset=abc")
    assert(status == 400)
    assert(mapper.readTree(body).get("error").asText().contains("relative-offset"))
  }

  test("quote-bearing bad option still emits valid JSON (C4 escaping)") {
    // The echoed bad value contains a double quote; the error body must be
    // Jackson-escaped everywhere, not string-interpolated (VERDICT r3 #7).
    val (status, body) = get(
      s"/search?bootstrap-servers=${TestSpark.Sf}&topics=events&relative-offset=ab%22c")
    assert(status == 400)
    assert(mapper.readTree(body).get("error").asText().contains("ab\"c"))
  }

  test("invalid regex fails MID-STREAM: 200 committed, stream truncated (C4)") {
    // Same trade-off as the reference: the regex compiles inside the
    // already-committed streaming response, so the error can only truncate
    // the stream, not change the status (`core.clj:106-110` applies only
    // to argument errors).
    val (status, body) = get(
      s"/search?bootstrap-servers=${TestSpark.Sf}&topics=events&key-regex=%5B")
    assert(status == 200)
    assert(body.startsWith("[" + """{"type":"pioneer"}"""))
    intercept[Exception](mapper.readTree(body)) // truncated JSON
  }

  test("/cached replays the completed search result byte-for-byte (S7)") {
    val (_, direct) = get(s"/search?$searchQs")
    val (status, cached) = get(s"/cached?$searchQs")
    assert(status == 200)
    assert(cached == direct)
  }

  test("/cached misses return an empty body") {
    val (status, body) = get("/cached?bootstrap-servers=zzz&topics=nope")
    assert(status == 200)
    assert(body.isEmpty)
  }

  test("/default-partition computes the murmur2 placement") {
    val (status, body) = get("/default-partition?topic=events&key=13")
    assert(status == 200)
    assert(body == Murmur2.partition("13", 10).toString)
  }

  test("concurrent searches run in parallel request threads") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = Seq("13", "7", "1[0-2]").map { re =>
      Future(get(s"/search?bootstrap-servers=${TestSpark.Sf}&topics=events&key-regex=$re"))
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (status, body) =>
      assert(status == 200)
      assert(mapper.readTree(body).get(0).get("type").asText() == "pioneer")
    }
  }

  test("/server-configs lists clusters, topics and deserializers (C5)") {
    val (status, body) = get("/server-configs")
    assert(status == 200)
    val cfg = mapper.readTree(body)
    assert(cfg.get("bootstrap-servers").isArray)
    assert(cfg.get("key-deserializers").size() == 2)
    assert(cfg.get("schema-registry-urls").isNull) // avro hidden offline
  }

  test("/pipeline runs an analytics query and releases its caches on completion") {
    // q51_tfidf registers a query-lifetime cached aggregate — the exact
    // long-lived-service leak the Materialize release path exists for.
    // The route must stream the result AND leave no NEW registered
    // frame behind (identity, not a zero-count: the shared test session
    // legitimately holds other suites' frames, and the release is
    // request-scoped by design — it must not touch them).
    val before = graft.ops.Materialize.liveSnapshot(spark)
    val (status, body) = get(s"/pipeline?name=q51_tfidf&dir=${TestSpark.Sf}")
    assert(status == 200)
    val arr = mapper.readTree(body)
    assert(arr.isArray && arr.size() > 1, body.take(200))
    assert(arr.get(0).get("type").asText() == "pioneer")
    assert(arr.get(1).has("doc_id"), arr.get(1).toString)
    val leaked = graft.ops.Materialize.liveSnapshot(spark) -- before
    assert(leaked.isEmpty,
      s"pipeline request left ${leaked.size} registered caches behind")
  }

  test("/pipeline without a name lists the query catalog") {
    val (status, body) = get("/pipeline")
    assert(status == 200)
    val names = mapper.readTree(body).get("queries")
    assert(names != null && names.isArray)
    val set = (0 until names.size()).map(names.get(_).asText()).toSet
    assert(set.contains("q01_scan") &&
      set.contains("q62_containment_stratified"), set.take(5).toString)
  }

  test("/pipeline argument errors reach the 400 channel pre-commit (C4)") {
    val (s1, b1) = get("/pipeline?name=no_such_query&dir=/tmp")
    assert(s1 == 400 && b1.contains("unknown query: no_such_query"), b1)
    val (s2, b2) = get("/pipeline?name=q01_scan")
    assert(s2 == 400 && b2.contains("dir required"), b2)
    // An unconfigured dir is rejected by the allowlist before any build
    // work runs — no caches to sweep, and no arbitrary-path reads.
    val before = graft.ops.Materialize.liveSnapshot(spark)
    val (s3, b3) = get("/pipeline?name=q51_tfidf&dir=/no/such/dir")
    assert(s3 == 400 && b3.contains("unknown dir"), b3)
    assert((graft.ops.Materialize.liveSnapshot(spark) -- before).isEmpty)
  }

  test("/pipeline resolves a configured cluster NAME to its location") {
    val (status, body) = get("/pipeline?name=q24_text_stats&dir=sandbox")
    assert(status == 200)
    val arr = mapper.readTree(body)
    assert(arr.isArray && arr.size() > 1, body.take(200))
    assert(arr.get(0).get("type").asText() == "pioneer")
  }

  test("/pipeline rejects paths outside the configured map (allowlist)") {
    // An absolute path that exists and is Spark-readable but is not a
    // configured value must still be 400 — the ADVICE r11 surface.
    val (status, body) = get("/pipeline?name=q01_scan&dir=/root/testdata/sf0.01")
    assert(status == 400 && body.contains("unknown dir"), body)
  }

  test("/cached replays a completed pipeline result byte-for-byte (S7 parity)") {
    val qs = s"name=q24_text_stats&dir=${TestSpark.Sf}"
    val (_, direct) = get(s"/pipeline?$qs")
    val (status, cached) = get(s"/cached?$qs")
    assert(status == 200)
    assert(cached.nonEmpty && cached == direct)
  }
}
