package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Similarity-search surface over the `embeddings` table
  * (`vec_id, embedding: array<float>, label`).
  */
object AnnQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** DuckDB: deterministic left-to-right double dot product. */
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)))"
  private def normSql(a: String) =
    s"sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($a[CAST(i AS INT)] AS DOUBLE))))"

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------- q35 vector norms
    QueryDef(
      "q35_embed_norms",
      (s, d) =>
        Ann.norms(emb(s, d), "vec_id", "embedding").orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, round(${normSql("embedding")}, 6) AS l2_norm
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // --------------------------------------- q36 brute-force cosine top-k
    QueryDef(
      "q36_cosine_topk",
      (s, d) => {
        val e = emb(s, d)
        Ann.cosineTopK(e, e.filter(col("vec_id") % 50 === 0), "vec_id",
          "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
              |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
              |sc AS (
              |  SELECT query_id, neighbor_id,
              |    ${dotSql("qv", "cv")} / (${normSql("qv")} * ${normSql("cv")}) AS cosine
              |  FROM q, c WHERE query_id <> neighbor_id),
              |r AS (SELECT query_id, neighbor_id, cosine,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              |  FROM sc)
              |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 6) AS cosine
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --------------------------------------------- q37 IVF-probed top-k
    // (centroid means are distributed float sums — not bit-reproducible
    // in an external engine, so this is a rows-only check; recall vs the
    // brute-force baseline is asserted in AnnSpec instead.)
    QueryDef(
      "q37_ann_ivf",
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfTopK(e, e.filter(col("vec_id") % 50 === 0), "vec_id",
          "embedding", "label", k = 5, nProbe = 2)
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ------------------------------------- q38 LSH hyperplane bucketing
    QueryDef(
      "q38_lsh_buckets",
      (s, d) =>
        Ann.lshBuckets(emb(s, d), "vec_id", "embedding", nBits = 16)
          .orderBy(col("vec_id")),
      Some {
        val planeDot = (b: Int) =>
          s"""list_sum(list_transform(range(0, 64), dd ->
             |      CAST(embedding[CAST(dd + 1 AS INT)] AS DOUBLE) *
             |      (CAST(list_sum(list_transform(range(0, 4), c ->
             |         (strpos('0123456789abcdef', substr(md5('$b:' || dd), CAST(c + 1 AS INT), 1)) - 1)
             |         * CAST(power(16, 3 - c) AS BIGINT))) AS DOUBLE) / 65536.0 - 0.5)))""".stripMargin
        val bits = (0 until 16).map { b =>
          s"CASE WHEN ${planeDot(b)} > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
        }.mkString(" + ")
        s"""SELECT vec_id, CAST($bits AS BIGINT) AS bucket
           |FROM embeddings ORDER BY vec_id""".stripMargin
      }))
}
