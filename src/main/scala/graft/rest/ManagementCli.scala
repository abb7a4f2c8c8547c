package graft.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/**
 * Command-line client for [[ManagementServer]] — the engine's
 * DatastreamRestClientCli (reference: datastream-client/.../
 * DatastreamRestClientCli; operations mirror DatastreamResources).
 *
 * Usage:
 *   ManagementCli <baseUrl> list [start count]
 *   ManagementCli <baseUrl> get|delete|pause <name>
 *   ManagementCli <baseUrl> start|resume <name> [--await]
 *   ManagementCli <baseUrl> create|update-json '<spec json>' [name]
 *   ManagementCli <baseUrl> diag [name]
 *
 * Owner for authorized calls comes from GRAFT_OWNER (header X-Owner).
 */
object ManagementCli {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ManagementCli <baseUrl> <command> [args...]")
    val base = args(0).stripSuffix("/")
    val owner = sys.env.getOrElse("GRAFT_OWNER", "anonymous")
    val client = HttpClient.newHttpClient()

    def send(method: String, path: String, body: Option[String] = None): String = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
        .header("X-Owner", owner)
      val req = (body match {
        case Some(json) => b.header("Content-Type", "application/json")
          .method(method, HttpRequest.BodyPublishers.ofString(json))
        case None => b.method(method, HttpRequest.BodyPublishers.noBody())
      }).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        sys.error(s"HTTP ${resp.statusCode()}: ${resp.body()}")
      resp.body()
    }

    val awaitQ = if (args.contains("--await")) "?await=true" else ""
    val out = args(1) match {
      case "list" =>
        val page = if (args.length >= 4) s"?start=${args(2)}&count=${args(3)}" else ""
        send("GET", s"/pipelines$page")
      case "get" => send("GET", s"/pipelines/${args(2)}")
      case "create" => send("POST", "/pipelines", Some(args(2)))
      case "update-json" => send("PUT", s"/pipelines/${args(3)}", Some(args(2)))
      case "start" => send("POST", s"/pipelines/${args(2)}/start$awaitQ")
      case "pause" => send("POST", s"/pipelines/${args(2)}/pause")
      case "resume" => send("POST", s"/pipelines/${args(2)}/resume$awaitQ")
      case "delete" => send("DELETE", s"/pipelines/${args(2)}")
      case "diag" =>
        if (args.length >= 3) send("GET", s"/diag/${args(2)}")
        else send("GET", "/diag")
      case other => sys.error(s"unknown command $other")
    }
    println(out)
  }
}
