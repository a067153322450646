package graft.model

import org.apache.spark.sql.types._

/** Single source of truth for externally-shaped schemas (the driver's
  * events table and the engine's clip input table) — duplicated
  * StructTypes drift silently when a column changes.
  */
object Schemas {

  /** The driver events table (testdata sfN/events.parquet). */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The driver documents table (testdata sfN/documents.parquet). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The driver embeddings table (testdata sfN/embeddings.parquet). */
  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The engine input table per BASELINE.json `input_hint`. */
  val clips: StructType = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("bytes", BinaryType),
    StructField("sr_hz", IntegerType),
    StructField("dur_ms", IntegerType),
    StructField("codec", StringType),
    StructField("transcript", StringType),
    StructField("event_time", TimestampNTZType)))
}
