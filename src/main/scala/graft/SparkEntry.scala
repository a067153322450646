package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query; each SQL-expressible one carries an equivalent DuckDB oracle
  * (same column names/aliases on both sides — the driver's compare
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query: the full decode-map pipeline (reference topology
    * M1/M4 re-expressed) on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    functions.SimHash32.register(spark)
    functions.MinHash32.register(spark)
    functions.VecMath.register(spark)
    Registry.all.find(_.name == "p01_decode_full").get
      .fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { q =>
      q.name -> { (s: SparkSession, d: String) =>
        functions.SimHash32.register(s)
        functions.MinHash32.register(s)
        functions.VecMath.register(s)
        // see BENCH.md §3: InferFiltersFromGenerate re-evaluates
        // expensive generator inputs in an interpreted filter (13x on
        // the shingle join) — excluded for every engine query
        s.conf.set("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        // ANN top-k (q36/q37/q47): thousands of query_id groups must
        // stay on the ObjectHashAggregate hash-partial path — set here
        // too so an externally-built session gets the engine's conf
        s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "65536")
        q.fn(s, d)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (audio decode internals, distributed float means) → driver records
    * a weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
