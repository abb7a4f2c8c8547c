package graft.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{PipelineSpec, PipelineSpecJson}

/** Thrown for any non-2xx management-plane response, carrying the
  * HTTP status so callers can branch on 404/405/400 the way the
  * reference's RestliResponseException exposes its status. */
final case class ManagementClientException(status: Int, body: String)
  extends RuntimeException(s"HTTP $status: $body")

/**
 * Programmatic management-plane client — the engine's
 * DatastreamRestClient (reference: datastream-client/.../
 * DatastreamRestClient.java: typed create/get/list/pause/stop/resume/
 * delete/move/getTaskAssignment calls over the DMS REST surface).
 * Every verb maps 1:1 onto [[ManagementServer]] routes; specs travel
 * as the shared [[PipelineSpecJson]] wire shape. The CLI is a thin
 * argv adapter over this class.
 */
final class ManagementClient(baseUrl: String, owner: String = "anonymous",
    timeout: Duration = Duration.ofSeconds(30)) {

  private val base = baseUrl.stripSuffix("/")
  private val client = HttpClient.newHttpClient()

  private def send(method: String, path: String,
      body: Option[String] = None): JValue = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout).header("X-Owner", owner)
    val req = (body match {
      case Some(json) => b.header("Content-Type", "application/json")
        .method(method, HttpRequest.BodyPublishers.ofString(json))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400)
      throw ManagementClientException(resp.statusCode(), resp.body())
    JsonMethods.parse(resp.body())
  }

  private def specs(j: JValue): Seq[PipelineSpec] = j match {
    case JArray(xs) => xs.map(PipelineSpecJson.fromJson)
    case other => Seq(PipelineSpecJson.fromJson(other))
  }

  private def flags(pairs: (String, Boolean)*): String = {
    val on = pairs.collect { case (k, true) => s"$k=true" }
    if (on.isEmpty) "" else on.mkString("?", "&", "")
  }

  // URLEncoder emits form-style '+' for space; query strings use URI
  // conventions where '+' is a literal — emit %20 so the server (and
  // any standards-following proxy) reads spaces back as spaces.
  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  // Path segments get the same treatment as query values: a pipeline
  // name containing '/', ' ', or '?' must reach the server as ONE
  // segment, not restructure the request path. (URLEncoder's %2F for
  // '/' is exactly the segment-preserving form.)
  private def seg(v: String): String = enc(v)

  private def obj(fields: (String, JValue)*): String =
    JsonMethods.compact(JsonMethods.render(JObject(fields.toList)))

  def create(spec: PipelineSpec): PipelineSpec =
    PipelineSpecJson.fromJson(
      send("POST", "/pipelines", Some(PipelineSpecJson.write(spec))))

  def update(spec: PipelineSpec): PipelineSpec =
    PipelineSpecJson.fromJson(send("PUT", s"/pipelines/${seg(spec.name)}",
      Some(PipelineSpecJson.write(spec))))

  /** None on 404, as the reference's getDatastream(name) contract. */
  def get(name: String): Option[PipelineSpec] =
    try Some(PipelineSpecJson.fromJson(send("GET", s"/pipelines/${seg(name)}")))
    catch { case ManagementClientException(404, _) => None }

  def list(start: Int = 0, count: Int = Int.MaxValue): Seq[PipelineSpec] =
    specs(send("GET", s"/pipelines?start=$start&count=$count"))

  def group(name: String): Seq[PipelineSpec] =
    specs(send("GET", s"/pipelines/${seg(name)}/group"))

  /** `force = true` starts `name`'s WHOLE task group as one shared
    * query (destination-reuse fan-out), mirroring the reference's
    * force ActionParam scope on lifecycle verbs. */
  def start(name: String, await: Boolean = false,
      force: Boolean = false): Unit =
    send("POST", s"/pipelines/${seg(name)}/start" +
      flags("await" -> await, "force" -> force)): Unit

  def pause(name: String, force: Boolean = false): PipelineSpec =
    PipelineSpecJson.fromJson(
      send("POST", s"/pipelines/${seg(name)}/pause${flags("force" -> force)}"))

  def stop(name: String, force: Boolean = false): PipelineSpec =
    PipelineSpecJson.fromJson(
      send("POST", s"/pipelines/${seg(name)}/stop${flags("force" -> force)}"))

  def resume(name: String, await: Boolean = false,
      force: Boolean = false): PipelineSpec =
    PipelineSpecJson.fromJson(send("POST",
      s"/pipelines/${seg(name)}/resume${flags("await" -> await, "force" -> force)}"))

  def delete(name: String): Unit =
    send("DELETE", s"/pipelines/${seg(name)}"): Unit

  /** The full task→instance view. */
  def assignment(name: String): Map[String, String] =
    send("GET", s"/pipelines/${seg(name)}/assignment") match {
      case JArray(xs) => xs.map { j =>
        val t = j \ "task" match { case JString(v) => v; case _ => "" }
        val i = j \ "instance" match { case JString(v) => v; case _ => "" }
        t -> i
      }.toMap
      case other => sys.error(s"unexpected assignment payload: $other")
    }

  /** The instance hosting one task; None on 404 (task not found). */
  def taskInstance(name: String, task: String): Option[String] =
    try send("GET", s"/pipelines/${seg(name)}/assignment?task=${enc(task)}") \ "instance" match {
      case JString(v) => Some(v)
      case _ => None
    } catch { case ManagementClientException(404, _) => None }

  def movePartitions(name: String, partitions: Seq[String],
      targetHost: String, notify: Boolean = true): Unit =
    send("POST", s"/pipelines/${seg(name)}/movePartitions", Some(obj(
      "partitions" -> JString(partitions.mkString(",")),
      "targetHost" -> JString(targetHost),
      "notify" -> JBool(notify)))): Unit

  def pauseSourcePartitions(name: String, partitionCol: String,
      partitions: Seq[String], await: Boolean = false): Unit =
    send("POST",
      s"/pipelines/${seg(name)}/pauseSourcePartitions${flags("await" -> await)}",
      Some(obj(
        "partitionCol" -> JString(partitionCol),
        "partitions" -> JString(partitions.mkString(","))))): Unit

  /** partitions = Seq("*") resumes everything paused. */
  def resumeSourcePartitions(name: String, partitions: Seq[String],
      await: Boolean = false): Unit =
    send("POST",
      s"/pipelines/${seg(name)}/resumeSourcePartitions${flags("await" -> await)}",
      Some(obj("partitions" -> JString(partitions.mkString(","))))): Unit

  def health(): JValue = send("GET", "/health")

  def diag(peers: Seq[String] = Nil): JValue =
    if (peers.isEmpty) send("GET", "/diag")
    else send("GET", s"/diag?peers=${enc(peers.mkString(","))}")

  def diagOf(name: String): JValue = send("GET", s"/diag/${seg(name)}")
}
