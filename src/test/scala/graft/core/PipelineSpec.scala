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
}
