package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Pipeline.TaskStatus

/** Control-plane parity with the reference DAG engine
  * (/root/reference/tests/test_dag.py — assertions, not code). */
class PipelineSpec extends AnyFunSuite {

  test("linear pipeline executes in order and context flows downstream") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = Pipeline("test_linear")
      .addStage("a", _ => { log += "a"; Map("from_a" -> 1) })
      .addStage("b", ctx => {
        log += "b"; assert(ctx("from_a") == 1); Map("from_b" -> 2)
      }, dependsOn = Seq("a"))
      .addStage("c", ctx => {
        log += "c"; assert(ctx("from_b") == 2); Map.empty
      }, dependsOn = Seq("b"))
    val result = p.run()
    assert(result.status == "completed")
    assert(log.toSeq == Seq("a", "b", "c"))
  }

  test("failed stage skips downstream, run reports failed") {
    val p2 = Pipeline("test_failure")
      .addStage("fail", _ => throw new RuntimeException("Intentional failure"))
      .addStage("after", _ => fail("Should not have run"), dependsOn = Seq("fail"))
    val result = p2.run()
    assert(result.status == "failed")
    assert(result("fail").status == TaskStatus.Failed)
    assert(result("fail").error.contains("Intentional failure"))
    assert(result("after").status == TaskStatus.Skipped)
  }

  test("skip propagates transitively through dependents") {
    val p = Pipeline("test_transitive")
      .addStage("fail", _ => throw new RuntimeException("boom"))
      .addStage("mid", _ => fail("must not run"), dependsOn = Seq("fail"))
      .addStage("leaf", _ => fail("must not run"), dependsOn = Seq("mid"))
    val result = p.run()
    assert(result("mid").status == TaskStatus.Skipped)
    assert(result("leaf").status == TaskStatus.Skipped)
  }

  test("cycle detection rejects circular dependencies") {
    val p = Pipeline("test_cycle")
      .addStage("a", identity, dependsOn = Seq("b"))
      .addStage("b", identity, dependsOn = Seq("a"))
    val e = intercept[IllegalArgumentException](p.run())
    assert(e.getMessage.contains("Cycle detected"))
  }

  test("unknown dependency is rejected") {
    val p = Pipeline("test_unknown").addStage("a", identity, dependsOn = Seq("ghost"))
    val e = intercept[IllegalArgumentException](p.run())
    assert(e.getMessage.contains("unknown task 'ghost'"))
  }

  test("duplicate stage name is rejected") {
    val e = intercept[IllegalArgumentException] {
      Pipeline("dup").addStage("a", identity).addStage("a", identity)
    }
    assert(e.getMessage.contains("Duplicate task name"))
  }

  test("diamond DAG merges both branches") {
    val p = Pipeline("diamond")
      .addStage("a", _ => Map("val" -> 1))
      .addStage("b", ctx => Map("b_val" -> (ctx("val").asInstanceOf[Int] + 10)),
        dependsOn = Seq("a"))
      .addStage("c", ctx => Map("c_val" -> (ctx("val").asInstanceOf[Int] + 20)),
        dependsOn = Seq("a"))
      .addStage("d", ctx => Map("total" -> (ctx("b_val").asInstanceOf[Int] +
        ctx("c_val").asInstanceOf[Int])), dependsOn = Seq("b", "c"))
    val result = p.run()
    assert(result.status == "completed")
    assert(result("d").result("total") == 32) // 11 + 21
  }

  test("toJson serializes the DAG shape") {
    val p = Pipeline("serialize_test")
      .addStage("x", identity)
      .addStage("y", identity, dependsOn = Seq("x"))
    val json = p.toJson
    assert(json.contains("\"name\": \"serialize_test\""))
    assert(json.contains("\"y\": {\"depends_on\": [\"x\"]}"))
  }

  test("stage durations are recorded") {
    val result = Pipeline("timed")
      .addStage("sleepy", _ => { Thread.sleep(5); Map.empty }).run()
    assert(result("sleepy").durationMs >= 5.0)
  }

  // --- runParallel: level-synchronous concurrent execution ---

  private implicit val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4))

  test("runParallel: independent branches really run concurrently") {
    // each branch awaits the OTHER's arrival — sequential execution
    // would deadlock past the timeout and fail the stage
    val latch = new java.util.concurrent.CountDownLatch(2)
    def branch(tag: String): Pipeline.Context => Pipeline.Context = _ => {
      latch.countDown()
      assert(latch.await(5, java.util.concurrent.TimeUnit.SECONDS),
        s"$tag never saw its sibling start")
      Map(s"${tag}_done" -> true)
    }
    val result = Pipeline("concurrent")
      .addStage("a", _ => Map("seed" -> 1))
      .addStage("b", branch("b"), dependsOn = Seq("a"))
      .addStage("c", branch("c"), dependsOn = Seq("a"))
      .addStage("d", ctx => {
        assert(ctx("b_done") == true && ctx("c_done") == true); Map.empty
      }, dependsOn = Seq("b", "c"))
      .runParallel()
    assert(result.status == "completed")
  }

  test("runParallel: one failed branch skips only its dependents") {
    val result = Pipeline("partial_fail")
      .addStage("a", _ => Map("seed" -> 1))
      .addStage("bad", _ => throw new RuntimeException("branch down"),
        dependsOn = Seq("a"))
      .addStage("good", _ => Map("ok" -> true), dependsOn = Seq("a"))
      .addStage("join", _ => Map.empty, dependsOn = Seq("bad", "good"))
      .runParallel()
    assert(result.status == "failed")
    assert(result("bad").status == TaskStatus.Failed)
    assert(result("good").status == TaskStatus.Success)
    assert(result("join").status == TaskStatus.Skipped)
  }

  test("runParallel equals run on a linear chain (reference shape)") {
    def build = Pipeline("chain")
      .addStage("a", _ => Map("from_a" -> 1))
      .addStage("b", ctx => Map("from_b" -> (ctx("from_a").asInstanceOf[Int] + 1)),
        dependsOn = Seq("a"))
      .addStage("c", ctx => Map("from_c" -> (ctx("from_b").asInstanceOf[Int] +
        ctx("from_a").asInstanceOf[Int])), dependsOn = Seq("b"))
    val seq = build.run()
    val par = build.runParallel()
    assert(par.status == seq.status)
    assert(par.tasks.keys.toSeq == seq.tasks.keys.toSeq)
    assert(par("c").result == seq("c").result) // grand-parent context flows
  }

  test("runParallel: transitive skip and diamond context merge") {
    val result = Pipeline("par_diamond")
      .addStage("a", _ => Map("val" -> 1))
      .addStage("b", ctx => Map("b_val" -> (ctx("val").asInstanceOf[Int] + 10)),
        dependsOn = Seq("a"))
      .addStage("c", ctx => Map("c_val" -> (ctx("val").asInstanceOf[Int] + 20)),
        dependsOn = Seq("a"))
      .addStage("d", ctx => Map("total" -> (ctx("b_val").asInstanceOf[Int] +
        ctx("c_val").asInstanceOf[Int])), dependsOn = Seq("b", "c"))
      .runParallel()
    assert(result.status == "completed")
    assert(result("d").result("total") == 32)
  }
}
