package graft.core

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** Control-plane DAG runner (SURVEY.md §2.10).
  *
  * Mirrors the observable semantics of the reference's task engine
  * (/root/reference/app/etl/dag.py:46-164): duplicate-name rejection,
  * Kahn toposort with unknown-dependency and cycle errors, per-stage
  * status PENDING→RUNNING→SUCCESS/FAILED, SKIPPED on upstream failure,
  * context merge of dependency results before each stage, error capture
  * (not raise), per-stage duration, and an all-success run status.
  *
  * This is deliberately *control* plane only: stages thread a
  * `Context` of lazily-composed DataFrames (plus scalars), so the DATA
  * plane stays one Catalyst lineage — Spark schedules the actual
  * distributed DAG. Nothing here touches executors; it is driver-side
  * orchestration exactly like the reference's single-threaded loop,
  * minus the per-record Python interpretation.
  */
object Pipeline {
  type Context = Map[String, Any]

  sealed abstract class TaskStatus(val value: String)
  object TaskStatus {
    case object Pending extends TaskStatus("pending")
    case object Running extends TaskStatus("running")
    case object Success extends TaskStatus("success")
    case object Failed  extends TaskStatus("failed")
    case object Skipped extends TaskStatus("skipped")
  }

  /** Post-run view of one stage (reference TaskNode, dag.py:29-43). */
  final case class StageResult(
      status: TaskStatus,
      result: Context = Map.empty,
      error: Option[String] = None,
      durationMs: Double = 0.0)

  /** run() summary (reference dag.py:110,145-153). */
  final case class RunSummary(
      pipeline: String,
      status: String,
      tasks: ListMap[String, StageResult]) {
    def apply(stage: String): StageResult = tasks(stage)
  }

  private final case class StageDef(
      name: String,
      dependsOn: Seq[String],
      fn: Context => Context)

  def apply(name: String): Pipeline = new Pipeline(name)
}

final class Pipeline(val name: String) {
  import Pipeline._

  // insertion-ordered, like the reference's dict[str, TaskNode]
  private val stages = mutable.LinkedHashMap.empty[String, Pipeline.StageDef]

  /** Fluent builder; rejects duplicate names (dag.py:69-70). */
  def addStage(stageName: String, fn: Context => Context,
      dependsOn: Seq[String] = Nil): Pipeline = {
    require(!stages.contains(stageName), s"Duplicate task name: $stageName")
    stages(stageName) = StageDef(stageName, dependsOn, fn)
    this
  }

  /** Kahn's algorithm in stable insertion order; throws on unknown
    * dependency and on cycles (dag.py:76-101). */
  def topologicalOrder: Seq[String] = {
    val inDegree = mutable.LinkedHashMap(stages.keys.map(_ -> 0).toSeq: _*)
    for (s <- stages.values; dep <- s.dependsOn) {
      require(stages.contains(dep),
        s"Task '${s.name}' depends on unknown task '$dep'")
      inDegree(s.name) += 1
    }
    val queue = mutable.Queue(inDegree.collect { case (n, 0) => n }.toSeq: _*)
    val order = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val current = queue.dequeue()
      order += current
      for (s <- stages.values if s.dependsOn.contains(current)) {
        inDegree(s.name) -= 1
        if (inDegree(s.name) == 0) queue.enqueue(s.name)
      }
    }
    require(order.size == stages.size, s"Cycle detected in DAG '$name'")
    order.toSeq
  }

  /** Execute stages in dependency order; failures are captured, their
    * dependents SKIPPED, the run reported "failed" (dag.py:103-154). */
  def run(initialContext: Context = Map.empty): RunSummary = {
    val order = topologicalOrder
    var context = initialContext
    val results = mutable.LinkedHashMap.empty[String, StageResult]
    // stage → live status, for skip decisions mid-run
    val status = mutable.Map(stages.keys.map(_ -> (TaskStatus.Pending: TaskStatus)).toSeq: _*)

    for (stageName <- order) {
      val stage = stages(stageName)
      if (stage.dependsOn.exists(d => status(d) == TaskStatus.Failed ||
          status(d) == TaskStatus.Skipped)) {
        // Note: the reference only checks FAILED (dag.py:117-121), but a
        // dependent of a SKIPPED task would then run on a stale context;
        // we propagate SKIPPED transitively (same observable outcome for
        // every reference test — a linear chain skips everything after
        // the failure either way).
        status(stageName) = TaskStatus.Skipped
        results(stageName) = StageResult(TaskStatus.Skipped)
      } else {
        // merge dependency results into the rolling context (dag.py:127-129)
        for (dep <- stage.dependsOn) context = context ++ results(dep).result
        status(stageName) = TaskStatus.Running
        val start = System.nanoTime()
        val res =
          try {
            val out = stage.fn(context)
            StageResult(TaskStatus.Success, if (out == null) Map.empty else out,
              None, (System.nanoTime() - start) / 1e6)
          } catch {
            case e: Throwable =>
              StageResult(TaskStatus.Failed, Map.empty,
                Some(Option(e.getMessage).getOrElse(e.toString)),
                (System.nanoTime() - start) / 1e6)
          }
        status(stageName) = res.status
        results(stageName) = res
      }
    }

    val allSuccess = stages.keys.forall(status(_) == TaskStatus.Success)
    RunSummary(name, if (allSuccess) "completed" else "failed",
      ListMap(results.toSeq: _*))
  }

  /** Level-synchronous PARALLEL execution — the scheduling upgrade the
    * reference's single-threaded loop (dag.py:114-149) cannot do: Kahn
    * layers run one after another, but the independent stages WITHIN a
    * layer run concurrently on `ec`. Driver-side threads submitting
    * Spark jobs concurrently is the supported pattern — independent
    * branches become concurrent Spark jobs the cluster scheduler
    * interleaves across executors.
    *
    * Same observable semantics as run(): captured failures (never
    * thrown), transitive SKIPPED propagation, per-stage durations,
    * all-success run status. Context semantics are the well-defined
    * parallel analog of run()'s rolling merge: each stage sees
    * `initialContext` plus its TRANSITIVE dependencies' results merged
    * in global topological order (run()'s rolling context is
    * order-dependent under concurrency; for chains — every reference
    * pipeline — the two are identical, asserted in PipelineSpec). */
  def runParallel(initialContext: Context = Map.empty)
                 (implicit ec: scala.concurrent.ExecutionContext): RunSummary = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val order = topologicalOrder
    val orderIndex = order.zipWithIndex.toMap

    // ancestors in global topo order (deterministic merge order)
    val ancestorsOf: Map[String, Seq[String]] = {
      val memo = mutable.Map.empty[String, Set[String]]
      def anc(n: String): Set[String] = memo.getOrElseUpdate(n,
        stages(n).dependsOn.toSet.flatMap((d: String) => anc(d) + d))
      order.map(n => n -> anc(n).toSeq.sortBy(orderIndex)).toMap
    }

    // layer = stages whose dependencies all sit in earlier layers
    val layerOf = mutable.Map.empty[String, Int]
    for (n <- order)
      layerOf(n) = (stages(n).dependsOn.map(layerOf(_) + 1) :+ 0).max
    val layers = order.groupBy(layerOf).toSeq.sortBy(_._1).map(_._2)

    val results = mutable.Map.empty[String, StageResult]
    for (layer <- layers) {
      val layerResults = Await.result(
        Future.traverse(layer) { stageName =>
          Future {
            val stage = stages(stageName)
            val upstreamBad = ancestorsOf(stageName).exists(a =>
              results(a).status == TaskStatus.Failed ||
                results(a).status == TaskStatus.Skipped)
            if (upstreamBad) stageName -> StageResult(TaskStatus.Skipped)
            else {
              val context = ancestorsOf(stageName)
                .foldLeft(initialContext)((c, a) => c ++ results(a).result)
              val start = System.nanoTime()
              val res =
                try {
                  val out = stage.fn(context)
                  StageResult(TaskStatus.Success,
                    if (out == null) Map.empty else out, None,
                    (System.nanoTime() - start) / 1e6)
                } catch {
                  case e: Throwable =>
                    StageResult(TaskStatus.Failed, Map.empty,
                      Some(Option(e.getMessage).getOrElse(e.toString)),
                      (System.nanoTime() - start) / 1e6)
                }
              stageName -> res
            }
          }
        }, Duration.Inf)
      results ++= layerResults
    }

    val allSuccess = stages.keys.forall(n => results(n).status == TaskStatus.Success)
    RunSummary(name, if (allSuccess) "completed" else "failed",
      ListMap(order.map(n => n -> results(n)): _*))
  }

  /** Serialize the DAG shape — `{name, tasks: {t: {depends_on}}}`
    * (dag.py:156-164), stored in pipeline_runs.dag_definition. */
  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val tasks = stages.values.map { s =>
      s"${q(s.name)}: {\"depends_on\": [${s.dependsOn.map(q).mkString(", ")}]}"
    }.mkString("{", ", ", "}")
    s"""{"name": ${q(name)}, "tasks": $tasks}"""
  }
}
