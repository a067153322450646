package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver runs
  * over the same parquet tables. Column names/order must match between
  * the two (the driver sorts columns by name before hashing values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[QueryDef] =
    BatchQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      AnnQueries.defs ++ ClipQueries.defs ++ StreamQueries.defs ++
      MoreQueries.defs ++ CurationQueries.defs ++ ExtraQueries.defs ++
      AudioCurationQueries.defs ++ MixQueries.defs
}
