package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.streaming.AuditStream

/** Entry point C as an incremental `Trigger.AvailableNow` job (VERDICT r2
  * task 1): the project list is ingested through the graft-http
  * `MicroBatchStream`; the first run reproduces the batch report exactly, a
  * rerun against the unchanged endpoint appends nothing (checkpointed
  * offset), and after the endpoint grows the next run audits only the new
  * projects — the daily-cron shape of `Job Cek Script/app.py:135-157`. */
class AuditStreamSpec extends SparkSpec {

  private val asOf = to_timestamp(lit("2024-10-08 09:00:00"))

  // the AuditMainSpec fixture documents as element lists, plus entries for
  // the project appended mid-test (static docs may cover projects that
  // haven't streamed in yet — the audit only looks up what its batch holds)
  private val projectsInit = Seq(
    """{"id":"p_success","name":"P Success"}""",
    """{"id":"p_failed","name":"P Failed"}""",
    """{"id":"p_notsynced","name":"P NotSynced"}""",
    """{"id":"p_nosched","name":"P NoSched"}""",
    """{"id":"p_null","name":"P NullStatus"}""",
    """{"id":"p_failed","name":"P Dup"}""",
    """{"id":"p_evening","name":"P Evening"}""")
  private val projectNew = """{"id":"p_new","name":"P New"}"""
  @volatile private var projects: Seq[String] = projectsInit

  private val schedules = Seq(
    """{"project_id":"p_success","response":{"data":[{"repeat_period":{"hour":2}}]}}""",
    """{"project_id":"p_failed","response":{"data":[{"repeat_period":{"hour":2}}]}}""",
    """{"project_id":"p_notsynced","response":{"data":[{"repeat_period":"beginning_of_the_month"},{"repeat_period":{"hour":2}}]}}""",
    """{"project_id":"p_nosched","response":{"data":[]}}""",
    """{"project_id":"p_null","response":{"data":[{"repeat_period":{"hour":2}}]}}""",
    """{"project_id":"p_evening","response":{"data":[{"repeat_period":{"hour":12}}]}}""",
    """{"project_id":"p_new","response":{"data":[{"repeat_period":{"hour":2}}]}}""")

  private val monitoring = Seq(
    """{"project_id":"p_success","started_at":"Tue, 08 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_failed","started_at":"Tue, 08 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_notsynced","started_at":"Mon, 07 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_nosched","started_at":"Tue, 08 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_null","started_at":"Tue, 08 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_evening","started_at":"Mon, 07 Oct 2024, 02:30:00 GMT+0000"}""",
    """{"project_id":"p_new","started_at":"Tue, 08 Oct 2024, 03:30:00 GMT+0000"}""")

  private val nodes = Seq(
    """{"project_id":"p_success","response":{"data":{"nodes":[{"id":"n1","name":"node1","type":"source","status":"SUCCESS","export_status":"SUCCESS"}]}}}""",
    """{"project_id":"p_failed","response":{"data":{"nodes":[{"id":"n1","name":"node1","type":"source","status":"FAILED","export_status":"SUCCESS"},{"id":"n2","name":"node2","type":"next","status":"SUCCESS","export_status":"SUCCESS"}]}}}""",
    """{"project_id":"p_null","response":{"data":{"nodes":[{"id":"n1","name":"node1","type":"source","status":null,"export_status":"SUCCESS"}]}}}""",
    """{"project_id":"p_evening","response":{"data":{"nodes":[{"id":"n1","name":"node1","type":"source","status":"SUCCESS","export_status":"SUCCESS"}]}}}""",
    """{"project_id":"p_new","response":{"data":{"nodes":[{"id":"n1","name":"node1","type":"source","status":"SUCCESS","export_status":"SUCCESS"}]}}}""")

  private def serveList(server: HttpServer, path: String, items: () => Seq[String]): Unit =
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val page = params.getOrElse("page", "0").toInt
        val size = params.getOrElse("page_size", "8").toInt
        val slice = items().slice(page * size, page * size + size)
        val body = s"""{"data":[${slice.mkString(",")}]}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })

  test("AvailableNow run matches batch, reruns are incremental, restart keeps the offset") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    serveList(server, "/projects", () => projects)
    serveList(server, "/schedules", () => schedules)
    serveList(server, "/monitoring", () => monitoring)
    serveList(server, "/nodes", () => nodes)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val ckpt = Files.createTempDirectory("graft_audit_stream_ckpt").toString
      val out = Files.createTempDirectory("graft_audit_stream_out").toString

      def runOnce(): Unit = {
        val q = AuditStream.availableNow(spark, base, ckpt, out, asOf, None)
        assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      }
      def rows() = spark.read.parquet(out).orderBy("seq").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(5)))

      // run 1: drains the whole endpoint, golden parity with batch mode
      val batch7 = AuditMain.runWithAuth(spark, base, asOf, None).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(5)))
      runOnce()
      assert(rows().toSeq == batch7.toSeq)
      assert(rows().length == 7)

      // run 2 (a restart from the same checkpoint): nothing new, no dupes
      runOnce()
      assert(rows().length == 7)

      // the endpoint grows; run 3 audits ONLY the new project
      projects = projectsInit :+ projectNew
      runOnce()
      val all = rows()
      assert(all.length == 8)
      assert(all.last == ((8L, "P New", "Success")))
      // accumulated incremental output == a fresh batch run over 8 projects
      val batch8 = AuditMain.runWithAuth(spark, base, asOf, None).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(5)))
      assert(all.toSeq == batch8.toSeq)
    } finally server.stop(0)
  }

  test("per-project side fetch: an incremental run reads side docs only for new ids") {
    import scala.jdk.CollectionConverters._
    val sideRequests = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    // /projects = the streamed list; /projects/<id>/<name> = that project's
    // side elements (same shapes as the collections, filtered) — the
    // reference's own URL scheme (app.py:125-126,161-165)
    val sideDocs = Map("schedules" -> schedules, "monitoring" -> monitoring,
      "nodes" -> nodes)
    projects = projectsInit
    server.createContext("/projects", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath.stripPrefix("/projects")
        val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val page = params.getOrElse("page", "0").toInt
        val size = params.getOrElse("page_size", "8").toInt
        val items = path.split("/").filter(_.nonEmpty) match {
          case Array() => projects
          case Array(id, name) =>
            sideRequests.add(s"$name:$id")
            sideDocs(name).filter(_.contains(s""""project_id":"$id""""))
          case other => fail(s"unexpected path $path (${other.toSeq})")
        }
        val slice = items.slice(page * size, page * size + size)
        val body = s"""{"data":[${slice.mkString(",")}]}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val ckpt = Files.createTempDirectory("graft_audit_keyed_ckpt").toString
      val out = Files.createTempDirectory("graft_audit_keyed_out").toString
      def runOnce(): Unit = {
        val q = AuditStream.availableNow(spark, base, ckpt, out, asOf, None,
          perProjectSides = true)
        assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      }
      def rows() = spark.read.parquet(out).orderBy("seq").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(5)))

      // run 1 drains all 7 projects; keyed side fetches cover all their ids
      runOnce()
      assert(rows().length == 7)
      assert(rows().map(_._2).toSeq == Seq("P Success", "P Failed", "P NotSynced",
        "P NoSched", "P NullStatus", "P Dup", "P Evening"))
      assert(sideRequests.asScala.count(_.startsWith("schedules:")) == 6) // 6 distinct ids

      // endpoint grows by one project: the next run fetches side docs for
      // ONLY that id — O(new), not a collection re-read
      sideRequests.clear()
      projects = projectsInit :+ projectNew
      runOnce()
      val all = rows()
      assert(all.length == 8)
      assert(all.last == ((8L, "P New", "Success")))
      val fetchedIds = sideRequests.asScala.map(_.split(":", 2)(1)).toSet
      assert(fetchedIds == Set("p_new"), s"side fetches not incremental: $fetchedIds")

      // rerun against the unchanged endpoint: the checkpointed offset
      // covers every project — nothing appended, zero side fetches
      sideRequests.clear()
      runOnce()
      assert(rows().length == 8)
      assert(sideRequests.asScala.isEmpty,
        s"no-op rerun fetched side docs: ${sideRequests.asScala}")
    } finally server.stop(0)
  }
}
