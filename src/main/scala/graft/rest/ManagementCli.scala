package graft.rest

import org.json4s.jackson.JsonMethods

import graft.model.PipelineSpecJson

/**
 * Command-line adapter over [[ManagementClient]] — the engine's
 * DatastreamRestClientCli (reference: datastream-client/.../
 * DatastreamRestClientCli; operations mirror DatastreamResources).
 *
 * Usage:
 *   ManagementCli <baseUrl> list [start count]
 *   ManagementCli <baseUrl> get|delete <name>
 *   ManagementCli <baseUrl> pause|stop <name> [--force]
 *   ManagementCli <baseUrl> start|resume <name> [--await] [--force]
 *   ManagementCli <baseUrl> create|update-json '<spec json>'
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
    val owner = sys.env.getOrElse("GRAFT_OWNER", "anonymous")
    val c = new ManagementClient(args(0), owner)
    val pos = args.filterNot(_.startsWith("--"))
    val await = args.contains("--await")
    val force = args.contains("--force")

    def specJson(s: graft.model.PipelineSpec): String = PipelineSpecJson.write(s)
    def specsJson(ss: Seq[graft.model.PipelineSpec]): String =
      ss.map(specJson).mkString("[", ",", "]")

    val out = args(1) match {
      case "list" =>
        if (pos.length >= 4) specsJson(c.list(pos(2).toInt, pos(3).toInt))
        else specsJson(c.list())
      case "get" => c.get(pos(2)) match {
        case Some(s) => specJson(s)
        case None => sys.error(s"unknown pipeline ${pos(2)}")
      }
      case "create" => specJson(c.create(PipelineSpecJson.read(pos(2))))
      case "update-json" => specJson(c.update(PipelineSpecJson.read(pos(2))))
      case "start" =>
        c.start(pos(2), await, force); s"""{"name":"${pos(2)}","started":true}"""
      case "pause" => specJson(c.pause(pos(2), force))
      case "stop" => specJson(c.stop(pos(2), force))
      case "resume" => specJson(c.resume(pos(2), await, force))
      case "delete" => c.delete(pos(2)); s"""{"name":"${pos(2)}","deleted":true}"""
      case "group" => specsJson(c.group(pos(2)))
      case "assignment" =>
        if (pos.length >= 4) c.taskInstance(pos(2), pos(3)) match {
          case Some(i) => s"""{"task":"${pos(3)}","instance":"$i"}"""
          case None => sys.error(s"connector task not found: ${pos(3)}")
        }
        else c.assignment(pos(2)).toSeq.sortBy(kv => (kv._1.length, kv._1))
          .map { case (t, i) => s"""{"task":"$t","instance":"$i"}""" }
          .mkString("[", ",", "]")
      case "move-partitions" =>
        c.movePartitions(pos(2), pos(3).split(",").toSeq, pos(4),
          notify = !args.contains("--stage"))
        s"""{"name":"${pos(2)}","moved":true}"""
      case "pause-partitions" =>
        c.pauseSourcePartitions(pos(2), pos(3), pos(4).split(",").toSeq, await)
        s"""{"name":"${pos(2)}","pausedPartitions":"${pos(4)}"}"""
      case "resume-partitions" =>
        c.resumeSourcePartitions(pos(2), pos(3).split(",").toSeq, await)
        s"""{"name":"${pos(2)}","resumedPartitions":"${pos(3)}"}"""
      case "diag" =>
        if (pos.length >= 3) JsonMethods.compact(JsonMethods.render(c.diagOf(pos(2))))
        else JsonMethods.compact(JsonMethods.render(c.diag()))
      case "health" => JsonMethods.compact(JsonMethods.render(c.health()))
      case other => sys.error(s"unknown command $other")
    }
    println(out)
  }
}
