package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Ann, Dedup}

/** Training-data curation surface: embedding-cosine near-duplicate
  * pairs (LSH-blocked) and the combined quality→dedup keep-list
  * pipeline a 100 TB pretraining corpus run needs.
  */
object CurationQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)))"
  private def vnormSql(a: String) =
    s"sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($a[CAST(i AS INT)] AS DOUBLE))))"

  val defs: Seq[QueryDef] = Seq(
    // ------------------- q47 embedding-cosine near-dup pairs (LSH-blocked)
    // Candidate generation via the 16-bit hyperplane LSH bucket (q38's
    // operator) — pairs sharing a bucket get exact cosine; threshold
    // keeps near-duplicates. At corpus scale the bucket join replaces
    // the O(n²) all-pairs cosine; bucket width tunes recall/cost.
    QueryDef(
      "q47_embed_neardup",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val bucketed = Ann.lshBuckets(emb, "vec_id", "embedding", nBits = 16)
          .join(emb, "vec_id")
        val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("va"))
        val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("vb"))
        val dot = aggregate(
          zip_with(col("va"), col("vb"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
        val na = sqrt(aggregate(col("va"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double")))
        val nb = sqrt(aggregate(col("vb"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double")))
        a.join(b, Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("cosine", dot / (na * nb))
          .filter(col("cosine") >= 0.2)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .distinct()
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val planeDot = (bit: String) =>
          s"""list_sum(list_transform(range(0, 64), dd ->
             |      CAST(embedding[CAST(dd + 1 AS INT)] AS DOUBLE) *
             |      (CAST(list_sum(list_transform(range(0, 4), c ->
             |         (strpos('0123456789abcdef', substr(md5($bit || ':' || dd), CAST(c + 1 AS INT), 1)) - 1)
             |         * CAST(power(16, 3 - c) AS BIGINT))) AS DOUBLE) / 65536.0 - 0.5)))""".stripMargin
        val bits = (0 until 16).map { bb =>
          s"CASE WHEN ${planeDot(s"'$bb'")} > 0 THEN CAST(${1L << bb} AS BIGINT) ELSE 0 END"
        }.mkString(" + ")
        s"""WITH bk AS (
           |  SELECT vec_id, embedding, CAST($bits AS BIGINT) AS bucket FROM embeddings),
           |pr AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           |    round(${dotSql("a.embedding", "b.embedding")} /
           |      (${vnormSql("a.embedding")} * ${vnormSql("b.embedding")}), 6) AS cosine,
           |    ${dotSql("a.embedding", "b.embedding")} /
           |      (${vnormSql("a.embedding")} * ${vnormSql("b.embedding")}) AS raw
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT id_a, id_b, cosine FROM pr WHERE raw >= 0.2
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // ------------------------ q48 corpus curation keep-list (end-to-end)
    // The combined pipeline: quality gates (token count, stopword
    // ratio) → language allow-list → exact-dup removal (keep smallest
    // doc_id). Output is the kept doc list with its quality row — what
    // a pretraining data job materializes per shard.
    QueryDef(
      "q48_curation_keeplist",
      (s, d) => {
        val docs = t(s, d, "documents")
        val q = qualityStruct(col("text"))
        val scored = docs.select(
          col("doc_id"), col("lang"), col("text"),
          q.getField("n_tokens").as("n_tokens"),
          q.getField("stopword_ratio").as("stopword_ratio"))
        val gated = scored
          .filter(col("n_tokens") >= 20 && col("n_tokens") <= 95)
          .filter(col("lang").isin("en", "de", "es"))
        val keepers = Dedup.exactDedup(gated, "doc_id", "text")
          .select(col("keeper_id").as("doc_id"))
        gated.join(keepers, "doc_id")
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("stopword_ratio"))
          .orderBy(col("doc_id"))
      },
      Some {
        val norm = TextQueries.normSql("text")
        s"""WITH n AS (
           |  SELECT doc_id, lang, text, $norm AS nt FROM documents),
           |m AS (
           |  SELECT doc_id, lang, text, nt,
           |    CASE WHEN length(nt) = 0 THEN 0 ELSE len(string_split(nt, ' ')) END AS n_tokens
           |  FROM n),
           |g AS (
           |  SELECT doc_id, lang, text, nt, n_tokens,
           |    round(CASE WHEN n_tokens = 0 THEN 0.0
           |      ELSE CAST(len(list_filter(string_split(nt, ' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) / n_tokens END, 6) AS stopword_ratio
           |  FROM m
           |  WHERE n_tokens BETWEEN 20 AND 95 AND lang IN ('en', 'de', 'es')),
           |k AS (
           |  SELECT MIN(doc_id) AS doc_id FROM g GROUP BY md5(nt))
           |SELECT g.doc_id, g.lang, g.n_tokens, g.stopword_ratio
           |FROM g JOIN k ON g.doc_id = k.doc_id
           |ORDER BY g.doc_id""".stripMargin
      }))
}
