package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}


/** The DSv2 write side of graft-http: one POST per row via
  * `df.write.format("graft-http")`, per-task retry, and commit-level
  * failure aggregation (strict mode fails the job if any row exhausted
  * retries). */
class HttpWriteSpec extends SparkSpec {
  import spark.implicits._

  // counts requests per path; paths in `flaky` fail on their first attempt
  private def withServer(flaky: Set[String], dead: Set[String] = Set.empty)(
      f: (String, ConcurrentHashMap[String, Integer]) => Unit): Unit = {
    val hits = new ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val n = hits.merge(path, 1, (a, b) => a + b)
        val code =
          if (dead.contains(path)) 500
          else if (flaky.contains(path) && n == 1) 503
          else 200
        ex.sendResponseHeaders(code, 0L)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("every row POSTs once; flaky endpoints are retried to success") {
    withServer(flaky = Set("/n2")) { (base, hits) =>
      Seq(("n1", s"$base/n1"), ("n2", s"$base/n2"), ("n3", s"$base/n3"))
        .toDF("node_id", "url")
        .write.format("graft-http").mode("append").save()
      assert(hits.get("/n1") == 1)
      assert(hits.get("/n2") == 2, "flaky endpoint should be retried once")
      assert(hits.get("/n3") == 1)
    }
  }

  test("strict commit fails the job when a row exhausts retries") {
    withServer(flaky = Set.empty, dead = Set("/dead")) { (base, hits) =>
      val df = Seq(("ok", s"$base/ok"), ("dead", s"$base/dead"))
        .toDF("node_id", "url")
      val e = intercept[Exception] {
        df.write.format("graft-http").mode("append")
          .option("max_attempts", "2").save()
      }
      // the IllegalStateException from commit may surface bare or wrapped
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(4).exists(_.getMessage.contains("graft-http sink")), e.toString)
      assert(hits.get("/dead") == 2, "should retry up to max_attempts")
      // non-strict mode tolerates and succeeds
      df.write.format("graft-http").mode("append")
        .option("max_attempts", "2").option("strict", "false").save()
    }
  }

  test("a null url counts as a failed row, not an NPE") {
    withServer(flaky = Set.empty) { (base, hits) =>
      val df = Seq(("ok", Some(s"$base/ok")), ("none", None: Option[String]))
        .toDF("node_id", "url")
      intercept[Exception] { // strict: the null row fails the commit
        df.write.format("graft-http").mode("append").save()
      }
      assert(hits.get("/ok") == 1)
      df.write.format("graft-http").mode("append")
        .option("strict", "false").save() // tolerated when non-strict
    }
  }
}
