package graft

import org.scalatest.funsuite.AnyFunSuite

/** Boot-time configuration guards of the deployable app — the
  * reference refuses to start with zero enabled mappers
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/processor/LabToFhirProcessor.java:26-29,
  * mapper/AimLabMapper.java:35); PipelineMain mirrors that with
  * `--pipelines` selection + refusal on empty/invalid selections
  * (main exits 2 on these IllegalArgumentExceptions).
  */
class PipelineMainSpec extends AnyFunSuite {

  test("default selection: core pipelines; join auto-enables with --updates") {
    assert(PipelineMain.selectPipelines(Map.empty) ==
      Seq("mapped", "dedup", "rollup"))
    assert(PipelineMain.selectPipelines(Map("updates" -> "/x")) ==
      Seq("mapped", "dedup", "rollup", "join"))
  }

  test("--pipelines narrows the set and preserves order, deduplicated") {
    assert(PipelineMain.selectPipelines(Map("pipelines" -> "dedup")) == Seq("dedup"))
    assert(PipelineMain.selectPipelines(
      Map("pipelines" -> "rollup, mapped, rollup")) == Seq("rollup", "mapped"))
  }

  test("zero pipelines enabled → refusal (boot failure)") {
    val e = intercept[IllegalArgumentException] {
      PipelineMain.selectPipelines(Map("pipelines" -> ""))
    }
    assert(e.getMessage.contains("no pipelines enabled"))
    intercept[IllegalArgumentException] {
      PipelineMain.selectPipelines(Map("pipelines" -> " , "))
    }
  }

  test("unknown pipeline name and join-without-updates → refusal") {
    val e = intercept[IllegalArgumentException] {
      PipelineMain.selectPipelines(Map("pipelines" -> "mapped,bogus"))
    }
    assert(e.getMessage.contains("bogus"))
    val e2 = intercept[IllegalArgumentException] {
      PipelineMain.selectPipelines(Map("pipelines" -> "join"))
    }
    assert(e2.getMessage.contains("--updates"))
  }

  test("parseArgs: value flags, boolean flags, malformed input") {
    val o = PipelineMain.parseArgs(Array(
      "--input", "/a", "--rocksdb", "--strict-max-failures", "3"))
    assert(o == Map("input" -> "/a", "rocksdb" -> "true",
      "strict-max-failures" -> "3"))
    intercept[IllegalArgumentException] {
      PipelineMain.parseArgs(Array("--input")) // missing value
    }
    intercept[IllegalArgumentException] {
      PipelineMain.parseArgs(Array("stray"))
    }
  }
}
