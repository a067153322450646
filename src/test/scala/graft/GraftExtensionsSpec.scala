package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExtTestBridge
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions` registration path. A config-driven
  * end-to-end check needs a fresh SparkContext (one per test JVM, and
  * the shared TestSpark session owns it), so the spec drives the same
  * hooks SparkSession construction would: buildPlannerStrategies and
  * registerFunctions against the live session. PipelineMain applies
  * the class for real via `builder().withExtensions(...)`.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ext = {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    e
  }

  test("injects the as-of join planner strategy") {
    assert(ExtTestBridge.plannerStrategies(ext, spark)
      .contains(graft.plans.AsofJoinStrategy))
  }

  test("injected SQL functions work end-to-end and match the columnar twins") {
    ExtTestBridge.registerFunctions(ext, spark.sessionState.functionRegistry)
    val df = Seq((1L, Seq("alpha", "bravo", "charlie"))).toDF("id", "toks")
    df.createOrReplaceTempView("ext_toks")
    val viaSql = spark.sql(
      "SELECT simhash32(toks) AS sh, minhash32(toks, 4) AS mh FROM ext_toks").head()
    val viaCols = df.select(
      graft.functions.TextFunctions.simhash32Col(col("toks")).as("sh"),
      graft.functions.TextFunctions.minhashSignature(col("toks"), 4).as("mh")).head()
    assert(viaSql.getLong(0) == viaCols.getLong(0))
    assert(viaSql.getSeq[String](1) == viaCols.getSeq[String](1))
  }

  test("minhash32 k accepts foldable integrals (BIGINT cast, arithmetic), rejects non-foldable") {
    ExtTestBridge.registerFunctions(ext, spark.sessionState.functionRegistry)
    Seq((2L, Seq("a", "b"))).toDF("id", "toks").createOrReplaceTempView("ext_toks2")
    val r = spark.sql(
      "SELECT minhash32(toks, CAST(4 AS BIGINT)) AS mh, minhash32(toks, 2 + 2) AS mh2 FROM ext_toks2").head()
    assert(r.getSeq[String](0).length == 4)
    assert(r.getSeq[String](1).length == 4)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash32(toks, CAST(id AS INT)) AS mh FROM ext_toks2").collect()
    }
    assert(e.getMessage.contains("foldable") ||
      Option(e.getCause).exists(_.getMessage.contains("foldable")))
  }
}
