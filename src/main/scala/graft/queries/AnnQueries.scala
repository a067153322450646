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
    // Fully value-oracled: centroids are per-(cluster, dim) sums of
    // v·2^46 as BIGINT (exactly integral for float32 inputs — see
    // Ann.CentroidScale), so the "mean vector" is order-independent and
    // bit-identical in DuckDB; routing distances, cosines and ranks
    // then reproduce exactly. Recall vs brute force additionally
    // asserted in OperatorsSpec.
    QueryDef(
      "q37_ann_ivf",
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfTopK(e, e.filter(col("vec_id") % 50 === 0), "vec_id",
          "embedding", "label", k = 5, nProbe = 2)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        val scale = "70368744177664.0"
        val cdist =
          s"""list_sum(list_transform(range(1, 65), i ->
             |    (CAST(qv[CAST(i AS INT)] AS DOUBLE) - centroid[CAST(i AS INT)]) *
             |    (CAST(qv[CAST(i AS INT)] AS DOUBLE) - centroid[CAST(i AS INT)])))""".stripMargin
        s"""WITH ex AS (
           |  SELECT label AS cluster, CAST(u.dim AS INT) AS dim,
           |    CAST(round(CAST(embedding[CAST(u.dim + 1 AS INT)] AS DOUBLE) * $scale) AS BIGINT) AS sv
           |  FROM embeddings, LATERAL (SELECT unnest(range(0, 64)) AS dim) u),
           |cs AS (
           |  SELECT cluster, dim, CAST(SUM(sv) AS BIGINT) AS s, COUNT(*) AS n
           |  FROM ex GROUP BY cluster, dim),
           |cent AS (
           |  SELECT cluster, list(CAST(s AS DOUBLE) / $scale / n ORDER BY dim) AS centroid
           |  FROM cs GROUP BY cluster),
           |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
           |rt AS (
           |  SELECT query_id, qv, cluster,
           |    row_number() OVER (PARTITION BY query_id ORDER BY $cdist ASC, cluster ASC) AS crank
           |  FROM q, cent),
           |routed AS (SELECT query_id, qv, cluster FROM rt WHERE crank <= 2),
           |mem AS (SELECT label AS cluster, vec_id AS neighbor_id, embedding AS cv FROM embeddings),
           |sc AS (
           |  SELECT r.query_id, m.neighbor_id, m.cluster,
           |    ${dotSql("qv", "cv")} / (${normSql("qv")} * ${normSql("cv")}) AS cosine
           |  FROM routed r JOIN mem m ON r.cluster = m.cluster AND r.query_id <> m.neighbor_id),
           |rk AS (
           |  SELECT query_id, neighbor_id, cluster, cosine,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
           |  FROM sc)
           |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 6) AS cosine, cluster
           |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

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
