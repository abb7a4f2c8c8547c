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
 *   ManagementCli <baseUrl> get|delete <name>
 *   ManagementCli <baseUrl> pause|stop <name> [--force]
 *   ManagementCli <baseUrl> start|resume <name> [--await] [--force]
 *   ManagementCli <baseUrl> create|update-json '<spec json>' [name]
 *   ManagementCli <baseUrl> group <name>
 *   ManagementCli <baseUrl> assignment <name> [task]
 *   ManagementCli <baseUrl> move-partitions <name> <parts> <host> [--stage]
 *   ManagementCli <baseUrl> pause-partitions <name> <partitionCol> <parts>
 *   ManagementCli <baseUrl> resume-partitions <name> <parts|*>
 *   ManagementCli <baseUrl> diag [name]
 *   ManagementCli <baseUrl> health
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

    // positional args with the --flags stripped
    val pos = args.filterNot(_.startsWith("--"))
    def flags(names: String*): String = {
      val qs = names.collect {
        case "await" if args.contains("--await") => "await=true"
        case "force" if args.contains("--force") => "force=true"
      }
      if (qs.isEmpty) "" else qs.mkString("?", "&", "")
    }
    val out = args(1) match {
      case "list" =>
        val page = if (pos.length >= 4) s"?start=${pos(2)}&count=${pos(3)}" else ""
        send("GET", s"/pipelines$page")
      case "get" => send("GET", s"/pipelines/${pos(2)}")
      case "create" => send("POST", "/pipelines", Some(pos(2)))
      case "update-json" => send("PUT", s"/pipelines/${pos(3)}", Some(pos(2)))
      case "start" => send("POST", s"/pipelines/${pos(2)}/start${flags("await")}")
      case "pause" => send("POST", s"/pipelines/${pos(2)}/pause${flags("force")}")
      case "stop" => send("POST", s"/pipelines/${pos(2)}/stop${flags("force")}")
      case "resume" =>
        send("POST", s"/pipelines/${pos(2)}/resume${flags("await", "force")}")
      case "delete" => send("DELETE", s"/pipelines/${pos(2)}")
      case "group" => send("GET", s"/pipelines/${pos(2)}/group")
      case "assignment" =>
        val task = if (pos.length >= 4) s"?task=${pos(3)}" else ""
        send("GET", s"/pipelines/${pos(2)}/assignment$task")
      case "move-partitions" =>
        val notify = !args.contains("--stage")
        send("POST", s"/pipelines/${pos(2)}/movePartitions", Some(
          s"""{"partitions":"${pos(3)}","targetHost":"${pos(4)}","notify":$notify}"""))
      case "pause-partitions" =>
        send("POST", s"/pipelines/${pos(2)}/pauseSourcePartitions${flags("await")}",
          Some(s"""{"partitionCol":"${pos(3)}","partitions":"${pos(4)}"}"""))
      case "resume-partitions" =>
        send("POST", s"/pipelines/${pos(2)}/resumeSourcePartitions${flags("await")}",
          Some(s"""{"partitions":"${pos(3)}"}"""))
      case "diag" =>
        if (pos.length >= 3) send("GET", s"/diag/${pos(2)}")
        else send("GET", "/diag")
      case "health" => send("GET", "/health")
      case other => sys.error(s"unknown command $other")
    }
    println(out)
  }
}
