package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.operators.SyncPlanner
import graft.sinks.HttpSink

/** Sync pipeline: planner semantics (T1-T3 incl. the NULL-`type` caveat) and
  * the unified HTTP POST sink (K1a-d) against an in-process HTTP server —
  * bounded parallelism, retry-on-non-200, per-row status report. */
class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(
    ("p1", 1L, "n1", "src_a", "source"),
    ("p1", 2L, "n2", "downstream", "next"), // filtered: type == "next"
    ("p1", 3L, "n3", "src_b", null.asInstanceOf[String]), // kept: NULL != "next" in Python
    ("p1", 4L, "n4", "src_c", "source")
  ).toDF("project_id", "seq", "id", "name", "type")

  test("planner keeps non-'next' nodes incl. NULL type, builds urls in seq order") {
    val urls = SyncPlanner.sourceSyncUrls(nodes, "http://x/api/v1/node/").collect()
    assert(urls.map(_.getAs[String]("node_id")).toSeq == Seq("n1", "n3", "n4"))
    assert(urls.head.getAs[String]("url") == "http://x/api/v1/node/n1/sync")
  }

  test("http sink posts every row, retries non-200 up to 3, reports per-row status") {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val n = hits.computeIfAbsent(path, _ => new AtomicInteger).incrementAndGet()
        // the "flaky" node fails twice then succeeds; "dead" always 500
        val code =
          if (path.contains("flaky") && n <= 2) 500
          else if (path.contains("dead")) 500
          else 200
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val base = s"http://127.0.0.1:$port/node/"
      val urls = Seq(
        ("p1", 1L, "ok1", s"${base}ok1/sync"),
        ("p1", 2L, "flaky", s"${base}flaky/sync"),
        ("p1", 3L, "dead", s"${base}dead/sync")
      ).toDF("project_id", "seq", "node_id", "url")
      val res = HttpSink.post(urls, parallelism = 2, maxAttempts = 3)
        .collect().map(r => r.node_id -> r).toMap
      assert(res("ok1").status_code == 200 && res("ok1").attempts == 1)
      assert(res("flaky").status_code == 200 && res("flaky").attempts == 3)
      assert(res("dead").status_code == 500 && res("dead").attempts == 3)
      assert(hits.get("/node/dead/sync").get() == 3)
    } finally server.stop(0)
  }
}
