package graft.rest

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.model.{PipelineSpec, PipelineSpecJson, PipelineStatus}
import graft.operators.Control
import graft.streaming.PipelineManager

/**
 * Management-plane REST surface over [[PipelineManager]] — the
 * engine's DatastreamResources (reference: datastream-server-restli/
 * .../DatastreamResources.java:83+ — create/update/pause/resume/
 * getAll/get/delete/diag over HTTP).
 *
 * Routes (JSON in/out, JDK HttpServer, zero extra dependencies):
 *   GET    /pipelines?start=&count=   list (paged, O4)
 *   GET    /pipelines/{name}          get
 *   POST   /pipelines                 create (spec JSON; X-Owner header)
 *   PUT    /pipelines/{name}          update (a delivery-relevant
 *     change restarts the running query exactly-once onto the new
 *     spec — or hands it to the owning manager via a durable
 *     reassign-request when the query runs elsewhere. ONE carve-out:
 *     a RUNNING memory→memory pipeline keeps the old contract —
 *     spec persists, query keeps running, the caller owns the next
 *     stop/start cycle — because a memory sink cannot recover a
 *     checkpoint, so there is nothing restartable)
 *   POST   /pipelines/{name}/start    start (transform by name; ?await=true)
 *   POST   /pipelines/{name}/pause    pause (assignment retained)
 *   POST   /pipelines/{name}/stop     stop (?force=true → whole group)
 *   POST   /pipelines/{name}/resume   resume (?await=true)
 *   DELETE /pipelines/{name}          delete
 *
 * pause/stop/resume/delete on a pipeline whose query runs under a
 * DIFFERENT live manager are ACCEPTED, not enacted: the verb writes
 * a durable lifecycle-request the owning manager's heartbeat tick
 * consumes (q77–q79 — the reference's coordinator-routed state
 * transitions, DatastreamResources.java:355-546 →
 * Coordinator.java:824), and NOTHING mutates until then — the spec
 * status stays truthful to what the owner's query is actually doing,
 * and delete destroys no checkpoint under a live query. The 200
 * therefore means "accepted"; poll GET /pipelines/{name} for the
 * enacted transition (every manager's view converges via its tick's
 * spec reconciliation). A routed resume restarts from the OWNER's
 * remembered run; ?await=true awaits only locally-enacted resumes.
 *   GET    /health                   instance health (per-connector tasks)
 *   GET    /diag                      per-query status scatter-gather (A10)
 *   GET    /diag/{name}               metrics + paused partitions
 *   GET    /pipelines/{name}/assignment[?task=] task→instance view
 *   POST   /pipelines/{name}/movePartitions    pin partitions to a host
 *   POST   /pipelines/{name}/pauseSourcePartitions   partition-level pause
 *   POST   /pipelines/{name}/resumeSourcePartitions  ("*" = all paused)
 *
 * Transforms cannot travel over HTTP; like the reference — where a
 * datastream names its connector and the server resolves behavior —
 * a spec names its transform in `metadata("transform")`, resolved
 * against the registry passed here (default name: "identity").
 */
final class ManagementServer(pm: PipelineManager,
    transforms: Map[String, DataFrame => DataFrame] = Map.empty,
    port: Int = 0,
    instances: Seq[String] = Seq("local"),
    clusterName: String = "graft") {
  require(instances.nonEmpty, "instance ring must name at least one host")

  private val registry: Map[String, DataFrame => DataFrame] =
    Map[String, DataFrame => DataFrame]("identity" -> identity) ++ transforms

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // The JDK server's default executor runs handlers on the dispatch
  // thread — serial. A diag scatter-gather blocks its handler on peer
  // responses, so two instances diag-ing each other concurrently
  // would wedge until the peer timeout. A small pool keeps the
  // control plane non-blocking (the reference's Jetty server is
  // pooled for the same reason).
  private val handlerPool = java.util.concurrent.Executors.newFixedThreadPool(8,
    r => { val t = new Thread(r, "graft-mgmt-http"); t.setDaemon(true); t })
  server.setExecutor(handlerPool)

  /** The bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  // ---- JSON: the shared full-fidelity spec serde (same shape the
  // durable spec store writes — one wire format everywhere, as the
  // reference serializes one Datastream record to ZK and REST). A
  // spec arriving over the wire always enters as a fresh
  // Initializing registration regardless of any status field the
  // client sent. ----

  private def specToJson(s: PipelineSpec): JValue = PipelineSpecJson.toJson(s)

  private def rebuildToJson(name: String,
      p: graft.streaming.RebuildProgress): JValue =
    JObject(List[(String, JValue)](
      "name" -> JString(name),
      "state" -> JString(p.state),
      "planEpochs" -> JLong(p.planEpochs),
      "epochsDone" -> JLong(p.epochsDone),
      "oldCeiling" -> JLong(p.oldCeiling),
      "newCeiling" -> JLong(p.newCeiling)) ++
      (if (p.error.nonEmpty) List("error" -> (JString(p.error): JValue))
       else Nil))

  private def specFromJson(j: JValue): PipelineSpec =
    PipelineSpecJson.fromJson(j).copy(status = PipelineStatus.Initializing)

  // ---- Task-assignment table (the DMS movePartitions /
  // getTaskAssignment verbs, DatastreamResources.java:410-456 and
  // :826-849). The reference stores a HostTargetAssignment in ZK and
  // lets the coordinator leader re-deal; here the table is the
  // server's control-plane view (O(#partitions) per pipeline), the
  // initial deal comes from the gated stickyAssign operator over the
  // configured instance ring, and a move pins partitions to a target
  // host — sticky entries keep their owner exactly as the reference's
  // strategy guarantees. `notify=false` stages the move (the
  // reference's batch-later path); the next notify=true call applies
  // everything staged. ----

  private val assignments =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()
  private val stagedMoves =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  /** Applied moves are pinned into the spec's metadata under this key
    * — the durable analog of the reference writing HostTargetAssignment
    * onto the datastream's ZK node: the pins ride the manager's spec
    * store and survive server AND manager restarts. */
  private val TargetAssignmentKey = "graft.targetAssignment"

  private def parsePins(spec: PipelineSpec): Map[String, String] =
    spec.metadata.get(TargetAssignmentKey).map(_.split(",").toSeq
      .flatMap(_.split(":", 2) match {
        case Array(t, h) if t.nonEmpty && h.nonEmpty => Some(t -> h)
        case _ => None
      }).toMap).getOrElse(Map.empty)

  private def assignmentOf(spec: PipelineSpec): Map[String, String] =
    assignments.computeIfAbsent(spec.name, _ => {
      val s = pm.session
      import s.implicits._
      val tasks = (0 until spec.sourcePartitions).map(_.toString).toDF("task")
      val prev = Seq.empty[(String, String)].toDF("task", "instance")
      val base = Control.stickyAssign(tasks, prev, "task", "instance",
          instances.size)
        .collect().map { r =>
          // with an empty previous assignment every row comes from the
          // round-robin branch: a ring index to resolve to a host name
          r.getAs[String]("task") ->
            instances(r.get(r.fieldIndex("instance")).toString.toDouble.toInt)
        }.toMap
      // overlay pins recorded by earlier (possibly pre-restart) moves;
      // pins for partitions the spec no longer has are dropped
      base ++ parsePins(spec).filter(kv => base.contains(kv._1))
    })

  private def movePartitions(spec: PipelineSpec, partitions: Seq[String],
      targetHost: String, notify: Boolean, owner: String): Map[String, String] = {
    val table = assignmentOf(spec)
    val unknown = partitions.filterNot(table.contains)
    require(unknown.isEmpty,
      s"unknown partitions for ${spec.name}: ${unknown.mkString(",")} " +
        s"(valid: 0..${spec.sourcePartitions - 1})")
    val move = partitions.map(_ -> targetHost).toMap
    if (!notify) {
      stagedMoves.merge(spec.name, move, (a, b) => a ++ b)
      table
    } else {
      val staged = Option(stagedMoves.remove(spec.name)).getOrElse(Map.empty)
      val updated = table ++ staged ++ move
      assignments.put(spec.name, updated)
      // persist the applied table through the spec store
      val serialized = updated.toSeq.sortBy(kv => (kv._1.length, kv._1))
        .map { case (t, h) => s"$t:$h" }.mkString(",")
      pm.get(spec.name).foreach { cur =>
        pm.update(cur.name, cur.copy(metadata =
          cur.metadata + (TargetAssignmentKey -> serialized)), owner)
      }
      updated
    }
  }

  private def assignmentJson(table: Map[String, String]): JValue =
    JArray(table.toList.sortBy(kv => (kv._1.length, kv._1)).map { case (t, i) =>
      JObject("task" -> JString(t), "instance" -> JString(i)): JValue
    })

  private def transformOf(spec: PipelineSpec): DataFrame => DataFrame = {
    val name = spec.metadata.getOrElse(
      graft.streaming.PipelineManager.TransformKey, "identity")
    // server registry first, then the manager's shared catalog
    // (PipelineHooks.transforms — the one routed resumes also use),
    // so the two surfaces can never resolve one name differently
    // when only one of them defines it
    registry.get(name).orElse(pm.resolveTransform(spec)).getOrElse(
      sys.error(s"unknown transform $name (registered: ${registry.keys.mkString(",")})"))
  }

  // ---- HTTP plumbing ----

  private def respond(ex: HttpExchange, code: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body))
      .getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def error(ex: HttpExchange, code: Int, msg: String): Unit =
    respond(ex, code, JObject("error" -> JString(msg)))

  private def readBody(ex: HttpExchange): JValue =
    JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  // Split the RAW query, then percent-decode each component — so
  // values containing '&', '=', or spaces survive when the client
  // URL-encodes them (URI.getQuery would decode BEFORE the split).
  // A literal unencoded '+' stays a '+' (URI convention; the old
  // URI.getQuery behavior): URLDecoder alone would turn it into a
  // space per the form convention, so shield it first.
  private def queryParams(ex: HttpExchange): Map[String, String] = {
    def dec(v: String): String =
      java.net.URLDecoder.decode(v.replace("+", "%2B"), StandardCharsets.UTF_8)
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq
      .flatMap { kv => kv.split("=", 2) match {
        case Array(k, v) => Some(dec(k) -> dec(v))
        case _ => None
      }}.toMap).getOrElse(Map.empty)
  }

  private def owner(ex: HttpExchange): String =
    Option(ex.getRequestHeaders.getFirst("X-Owner")).getOrElse("anonymous")

  server.createContext("/", (ex: HttpExchange) => {
    try route(ex)
    catch {
      case e: graft.streaming.PipelineLockedException => error(ex, 409, e.getMessage)
      case e: IllegalArgumentException => error(ex, 400, e.getMessage)
      case e: RuntimeException if e.getMessage != null &&
          e.getMessage.startsWith("unknown") => error(ex, 404, e.getMessage)
      case e: Exception => error(ex, 500, String.valueOf(e.getMessage))
      // An ERROR (OOME, StackOverflow, linkage) escaping the handler
      // would kill the pool thread with the exchange OPEN and NO
      // response — the JDK server leaves the connection alive, so a
      // client without a request timeout parks FOREVER (observed in a
      // full-battery run: one handler died on an Error and the
      // suite's untimed send() hung the whole battery). Answer 500
      // first — the one thing a management plane must never do is go
      // silent — then rethrow so the JVM-level condition stays loud.
      case e: Throwable =>
        try error(ex, 500, s"${e.getClass.getName}: ${e.getMessage}")
        catch { case e2: Throwable => e.addSuppressed(e2) }
        throw e
    }
  })

  private def route(ex: HttpExchange): Unit = {
    // Split the RAW path, then percent-decode each segment — the
    // mirror of queryParams' raw-query handling, so a pipeline name
    // the client sent as one %2F/%20-encoded segment routes as ONE
    // segment (URI.getPath would decode %2F to '/' BEFORE the split
    // and restructure the route). '+' stays literal per URI path
    // conventions.
    def dec(v: String): String =
      java.net.URLDecoder.decode(v.replace("+", "%2B"), StandardCharsets.UTF_8)
    val path = ex.getRequestURI.getRawPath.stripSuffix("/")
    val method = ex.getRequestMethod
    (method, path.split("/").toList.drop(1).map(dec)) match {
      case ("GET", List("pipelines")) =>
        val q = queryParams(ex)
        val start = q.getOrElse("start", "0").toInt
        val count = q.getOrElse("count", Int.MaxValue.toString).toInt
        respond(ex, 200, JArray(pm.list(start, count).map(specToJson).toList))
      case ("GET", List("pipelines", name)) =>
        pm.get(name) match {
          case Some(s) => respond(ex, 200, specToJson(s))
          case None => error(ex, 404, s"unknown pipeline $name")
        }
      // findGroup finder (DatastreamResources.java:879-901): every
      // pipeline sharing `name`'s task prefix, with the same
      // start/count paging as the collection listing.
      case ("GET", List("pipelines", name, "group")) =>
        pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        val q = queryParams(ex)
        val start = q.getOrElse("start", "0").toInt
        val count = q.getOrElse("count", Int.MaxValue.toString).toInt
        val group = pm.findGroup(name).slice(start, start + count)
        respond(ex, 200, JArray(group.map(specToJson).toList))
      case ("POST", List("pipelines")) =>
        val created = pm.create(specFromJson(readBody(ex)), owner(ex))
        respond(ex, 201, specToJson(created))
      case ("PUT", List("pipelines", name)) =>
        val updated = pm.update(name, specFromJson(readBody(ex)), owner(ex))
        // an update may change sourcePartitions — drop the cached
        // assignment table (and staged moves) so it is rebuilt against
        // the new partition set
        assignments.remove(name)
        stagedMoves.remove(name)
        respond(ex, 200, specToJson(updated))
      case ("POST", List("pipelines", name, "start")) =>
        val spec = pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        // ?force=true extends the start to the whole task group — ONE
        // shared query fanning each micro-batch to the group's
        // distinct destinations (the manager's startGroup; the force
        // ActionParam scope of DatastreamResources.java:360,464,556
        // applied to the start verb)
        val q =
          if (queryParams(ex).get("force").contains("true"))
            pm.startGroup(name, transformOf(spec))
          else pm.start(name, transformOf(spec))
        if (queryParams(ex).get("await").contains("true")) q.awaitTermination()
        respond(ex, 200, JObject("name" -> JString(name), "started" -> JBool(true)))
      case ("POST", List("pipelines", name, "pause")) =>
        pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        // ?force=true pauses the whole task group, as the reference's
        // force flag (DatastreamResources.java:358-408); the default
        // pauses ONE member — inside a running destination-reuse group
        // the manager keeps the shared query serving the siblings and
        // holds this member's rows back (q68 semantics).
        pm.pause(name, force = queryParams(ex).get("force").contains("true"),
          owner = owner(ex))
        respond(ex, 200, specToJson(pm.get(name).get))
      // pauseSourcePartitions / resumeSourcePartitions
      // (DatastreamResources.java:604-680 / :682-750): partition-level
      // pause with the reference's semantics — additive pause set,
      // "*" resumes everything paused, only meaningful on a READY
      // stream (405 otherwise). Both restart the query (holdback-and-
      // replay is applied on every (re)start); ?await=true blocks
      // until the restarted AvailableNow run drains.
      case ("POST", List("pipelines", name, verb @ ("pauseSourcePartitions" | "resumeSourcePartitions"))) =>
        val spec = pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        if (spec.status != PipelineStatus.Ready) {
          error(ex, 405,
            s"can only $verb in a READY pipeline state: $name " +
              s"(current: ${spec.status})")
        } else {
          val body = readBody(ex)
          val parts = body \ "partitions" match {
            case JString("*") if verb == "resumeSourcePartitions" =>
              pm.paused(name)
            case JString(v) =>
              v.split(",").toSeq.map(_.trim).filter(_.nonEmpty).toSet
            case _ => Set.empty[String]
          }
          require(parts.nonEmpty, s"$verb requires partitions")
          val q =
            if (verb == "pauseSourcePartitions") {
              val pcol = body \ "partitionCol" match {
                case JString(v) if v.nonEmpty => v
                case _ => throw new IllegalArgumentException(
                  "pauseSourcePartitions requires partitionCol")
              }
              pm.pausePartitions(name, pcol, parts, transformOf(spec), owner(ex))
            } else pm.resumePartitions(name, parts, transformOf(spec), owner(ex))
          if (queryParams(ex).get("await").contains("true")) q.awaitTermination()
          respond(ex, 200, JObject(
            "name" -> JString(name),
            "pausedPartitions" -> JArray(
              pm.paused(name).toList.sorted.map(JString(_): JValue))))
        }
      // Managed index rebuild (the s32 retrain-and-rebuild protocol
      // as a REST verb — the reference routes destination
      // re-provisioning through the management plane too,
      // KafkaTransportProviderAdmin.createTopic:285): POST starts the
      // background backfill beside the live store (?await=true runs
      // it inline), GET polls progress — state, epochs done vs plan,
      // both stores' committed ceilings. Serving stays on the old
      // index until the cutover gate passes; a rebuild with no
      // registered rebuilder is a 404 ("unknown" message shape), a
      // concurrent one a 409 (PipelineLockedException — the running
      // rebuild owns the index like a live instance owns a lock).
      case ("POST", List("pipelines", name, "rebuildIndex")) =>
        pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        val p = pm.startIndexRebuild(name, owner = owner(ex),
          await = queryParams(ex).get("await").contains("true"))
        respond(ex, 202, rebuildToJson(name,
          pm.rebuildProgress(name).getOrElse(p)))
      case ("GET", List("pipelines", name, "rebuildIndex")) =>
        pm.rebuildProgress(name) match {
          case Some(p) => respond(ex, 200, rebuildToJson(name, p))
          case None => error(ex, 404, s"no rebuild recorded for $name")
        }
      // stop (DatastreamResources.java:462-546): STOPPING → STOPPED,
      // releases execution resources; ?force=true stops the whole
      // task group. Already-STOPPED is a no-op (200), as reference.
      case ("POST", List("pipelines", name, "stop")) =>
        pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        pm.stop(name, force = queryParams(ex).get("force").contains("true"),
          owner = owner(ex))
        respond(ex, 200, specToJson(pm.get(name).get))
      case ("POST", List("pipelines", name, "resume")) =>
        val spec = pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        // reference precondition (DatastreamResources.java:568-572):
        // only a PAUSED or STOPPED stream can resume
        if (spec.status != PipelineStatus.Paused &&
            spec.status != PipelineStatus.Stopped) {
          error(ex, 405,
            s"pipeline is not paused or stopped, cannot resume: $name " +
              s"(current: ${spec.status})")
        } else {
          // ?force=true resumes every PAUSED/STOPPED group member
          // (the reference resumes the group, skipping members not in
          // a resumable state, :575-593)
          val targets =
            if (queryParams(ex).get("force").contains("true"))
              pm.findGroup(name).filter(m =>
                m.status == PipelineStatus.Paused ||
                  m.status == PipelineStatus.Stopped)
            else Seq(spec)
          // a PAUSED pipeline's lock stays with the live manager that
          // paused it: resume there must ROUTE (the owner restarts
          // from its remembered run — q77's return leg). The
          // ownership judgment and the act are ONE manager call, so
          // an owner dying (or appearing) in between degrades into
          // the other form instead of failing. Only the paused case
          // routes: stop releases the lock, so resume-after-stop
          // always enacts locally.
          val enacted = targets.filter(m =>
            pm.resumeOrRoute(m.name, transformOf(m), owner = owner(ex)))
          if (queryParams(ex).get("await").contains("true"))
            enacted.foreach(m =>
              pm.queryOf(m.name).foreach(_.awaitTermination()))
          respond(ex, 200, specToJson(pm.get(name).get))
        }
      case ("DELETE", List("pipelines", name)) =>
        pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        // pm.delete can throw AFTER the deletion completed (a failed
        // narrowed-group restart); the inheritance cleanup must key on
        // whether the spec is actually gone, not on a clean return —
        // a recreate after a 500'd-but-completed delete must still
        // start with no assignment table or staged moves
        // a ROUTED delete (live peer owns the query) leaves the spec
        // present until the owner enacts — judged BEFORE the call so
        // this server's caches still drop now: between accept and
        // enactment a reader recomputes them fresh, and a later
        // recreate must not inherit the dead pipeline's table either
        // way (the stated invariant below)
        val routed = pm.liveForeignExecutor(name).isDefined
        try pm.delete(name, owner(ex))
        finally if (routed || pm.get(name).isEmpty) {
          assignments.remove(name)
          stagedMoves.remove(name): Unit
        }
        // delete-then-recreate of the same name must not inherit the
        // deleted pipeline's assignment table or staged moves
        respond(ex, 200, JObject("name" -> JString(name), "deleted" -> JBool(true)))
      // getTaskAssignment (DatastreamResources.java:826-849): the
      // instance hosting one task, or the whole table without ?task=.
      case ("GET", List("pipelines", name, "assignment")) =>
        val spec = pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        val table = assignmentOf(spec)
        queryParams(ex).get("task") match {
          case Some(t) => table.get(t) match {
            case Some(inst) => respond(ex, 200, JObject(
              "task" -> JString(t), "instance" -> JString(inst)))
            case None => error(ex, 404, s"connector task not found: $t")
          }
          case None => respond(ex, 200, assignmentJson(table))
        }
      // movePartitions (DatastreamResources.java:410-456): pin the
      // named partitions to targetHost. Only meaningful while the
      // pipeline is READY (405 otherwise, as the reference), only for
      // partitions the pipeline actually has (400), and notify=false
      // stages the move for the next notifying call.
      case ("POST", List("pipelines", name, "movePartitions")) =>
        val spec = pm.get(name).getOrElse(sys.error(s"unknown pipeline $name"))
        if (spec.status != PipelineStatus.Ready) {
          error(ex, 405,
            s"can only move partitions in a READY pipeline state: $name " +
              s"(current: ${spec.status})")
        } else {
          val body = readBody(ex)
          val parts = body \ "partitions" match {
            case JString(v) => v.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
            case _ => Seq.empty
          }
          val target = body \ "targetHost" match {
            case JString(v) if v.nonEmpty => v
            case _ => throw new IllegalArgumentException(
              "movePartitions requires a non-empty targetHost")
          }
          require(parts.nonEmpty, "movePartitions requires partitions")
          val notify = body \ "notify" match {
            case JBool(v) => v
            case _ => true
          }
          val table = movePartitions(spec, parts, target, notify, owner(ex))
          respond(ex, 200, JObject(
            "name" -> JString(name),
            "staged" -> JBool(!notify),
            "assignment" -> assignmentJson(table)))
        }
      // Instance health (health/ServerHealthResources.java: instance
      // + cluster identity, per-connector task health rollup). Task
      // facts come from the live query status plus the spec table —
      // the same sources the reference's Coordinator serves them from.
      case ("GET", List("health")) =>
        val statusRows = pm.status()
          .map { case (n, st, rows) => n -> (st, rows) }.toMap
        val byConnector = pm.list(0, Int.MaxValue).groupBy(_.connector)
        respond(ex, 200, JObject(
          "instanceName" -> JString(instances.head),
          "clusterName" -> JString(clusterName),
          // every transform name a spec on this instance can resolve:
          // the server's own registry plus the manager catalog (the
          // names routed restarts materialize — q81)
          "transforms" -> JArray(
            (registry.keySet ++ pm.catalogTransformNames).toList.sorted
              .map(JString(_): JValue)),
          "connectors" -> JArray(byConnector.toList.sortBy(_._1).map {
            case (c, specs) =>
              JObject("connectorName" -> JString(c),
                "tasks" -> JArray(specs.sortBy(_.name).map { sp =>
                  val (st, rows) =
                    statusRows.getOrElse(sp.name, ("UNSTARTED", 0L))
                  JObject(
                    "name" -> JString(sp.name),
                    "datastreamStatus" -> JString(sp.status.toString),
                    "queryState" -> JString(st),
                    "rows" -> JLong(rows),
                    "source" -> JString(sp.sourceConnection),
                    "destination" -> JString(sp.destinationConnection),
                    "pausedPartitions" -> JArray(pm.paused(sp.name)
                      .toList.sorted.map(JString(_): JValue))): JValue
                }.toList)): JValue
          })))
      case ("GET", List("diag")) =>
        queryParams(ex).get("peers").filter(_.nonEmpty) match {
          case Some(peers) =>
            respond(ex, 200, peerDiag(peers.split(",").toSeq.filter(_.nonEmpty)))
          case None => respond(ex, 200, localDiag())
        }
      case ("GET", List("diag", name)) =>
        // delivered-corpus cardinality from the pipeline's durable HLL
        // register table (opt-in via graft.sketchColumn) — the diag
        // answer to "how big is this stream's key space", read from
        // 256 rows however large the stream has grown
        val sketch = pm.cardinality(name).map { case (nregs, est) =>
          List("sketchRegisters" -> (JLong(nregs): JValue),
            "cardinalityEstimate" -> (JDouble(est): JValue))
        }.getOrElse(Nil)
        // durable-index health for index-maintaining pipelines: the
        // store's committed epoch / frontier / live file+run counts /
        // deepest tier / rewrite counters (+ lexical corpus stats) —
        // the numbers the scale probes assert, live for operators
        val index = pm.indexHealth(name).map { h =>
          List("index" -> (JObject(h.toList.sortBy(_._1).map {
            case (k, v) => k -> (JDouble(v): JValue) }): JValue))
        }.getOrElse(Nil)
        // live rebuild progress (backfill epochs + BOTH stores'
        // committed ceilings) rides the same diag read an operator
        // already polls for adcRankAgreement — the trigger and the
        // remedy's progress on one surface
        val rebuild = pm.rebuildProgress(name).map { p =>
          List("rebuild" -> rebuildToJson(name, p))
        }.getOrElse(Nil)
        respond(ex, 200, JObject(List[(String, JValue)](
          "name" -> JString(name),
          "metrics" -> JObject(pm.metrics(name).toList.map {
            case (k, v) => k -> (JLong(v): JValue) }),
          "pausedPartitions" -> JArray(
            pm.paused(name).toList.sorted.map(JString(_): JValue)))
          ++ sketch ++ index ++ rebuild))
      case _ => error(ex, 404, s"no route $method $path")
    }
  }

  // ---- A10 diag: local rows + multi-instance scatter-gather ----

  private def localDiag(): JValue =
    JArray(pm.status().map { case (n, st, rows) =>
      JObject("name" -> JString(n), "state" -> JString(st),
        "rows" -> JLong(rows)): JValue
    }.toList)

  private lazy val httpClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()

  /**
   * Multi-instance diagnostics (A10 full shape): fan the diag query out
   * to peer managers over HTTP and reduce every instance's per-query
   * rows into one payload — the engine's
   * ServerComponentHealthAggregator (reference: datastream-server-restli/
   * .../diagnostics/ServerComponentHealthAggregator.java: the
   * coordinator posts the query to each live instance's admin endpoint
   * and merges the responses, tolerating per-peer failures).
   *
   * The summary rollup goes through [[Control.diagReduce]] — the same
   * two-level partial/merge aggregation the gated q13 query runs over
   * data-plane volumes; here the input is the control-plane status rows
   * of every instance (bounded by query count, not data size).
   */
  private def peerDiag(peers: Seq[String]): JValue = {
    val local: Seq[(String, Either[String, Seq[(String, String, Long)]])] =
      Seq("local" -> Right(pm.status()))
    val fetched = local ++ peers.map { p =>
      p -> (try {
        val resp = httpClient.send(
          HttpRequest.newBuilder(URI.create(s"http://$p/diag"))
            .timeout(Duration.ofSeconds(10)).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"peer $p returned ${resp.statusCode()}")
        val items = JsonMethods.parse(resp.body()) match {
          case JArray(xs) => xs
          case other => sys.error(s"peer $p returned non-array diag: $other")
        }
        Right(items.map { j =>
          val name = j \ "name" match { case JString(v) => v; case _ => "" }
          val state = j \ "state" match { case JString(v) => v; case _ => "" }
          val rows = j \ "rows" match {
            case JLong(v) => v
            case JInt(v) => v.toLong
            case _ => 0L
          }
          (name, state, rows)
        })
      } catch { case e: Exception => Left(String.valueOf(e.getMessage)) })
    }

    val instancesJson = JArray(fetched.map {
      case (inst, Right(qs)) =>
        JObject("instance" -> JString(inst),
          "queries" -> JArray(qs.map { case (n, st, rows) =>
            JObject("name" -> JString(n), "state" -> JString(st),
              "rows" -> JLong(rows)): JValue
          }.toList)): JValue
      case (inst, Left(err)) =>
        JObject("instance" -> JString(inst), "error" -> JString(err)): JValue
    }.toList)

    val statusRows = fetched.collect { case (inst, Right(qs)) =>
      qs.map { case (n, st, rows) => (inst, st, rows) }
    }.flatten
    val session = pm.session
    import session.implicits._
    val summary =
      if (statusRows.isEmpty) Nil
      else Control.diagReduce(statusRows.toDF("instance", "state", "rows"),
          col("instance"), col("state"), col("rows"))
        .collect().toSeq.map { r =>
          JObject(
            "status" -> JString(r.getAs[String]("status")),
            "hosts" -> JLong(r.getAs[Long]("hosts")),
            "records" -> JLong(r.getAs[Long]("records")),
            "rows_total" -> JLong(r.getAs[Long]("metric_total"))): JValue
        }

    JObject(
      "instances" -> instancesJson,
      "summary" -> JArray(summary.toList))
  }

  def start(): ManagementServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); handlerPool.shutdown() }
}
