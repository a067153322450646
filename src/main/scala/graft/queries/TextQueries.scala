package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Scalar-function + text-analysis surface (SURVEY.md §2.7 C1–C15
  * analogues and the training-pipeline text family: quality scoring,
  * language id, token counting, fingerprinting).
  */
object TextQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** DuckDB expression: normalized text of column `c` (twin of
    * [[graft.functions.TextFunctions.normalizeTranscript]]).
    */
  def normSql(c: String): String =
    s"regexp_replace(lower(regexp_replace(trim($c), '[ \\t\\n\\r\\f]+', ' ', 'g')), '\\.$$', '')"

  /** Context-window chunking stage shared by q60/q62/q63: W-token
    * windows with the given stride over normalized text, one row per
    * chunk with its text and md5. Narrow 1:N (split → posexplode →
    * slice), zero shuffle at any scale.
    */
  private[queries] def chunkStage(docs: DataFrame, w: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), normalizeTranscript(col("text")).as("__norm"))
      // empty/NULL docs produce NO chunks (null-safe on both engines:
      // Spark size(split(NULL)) = -1 vs DuckDB len(NULL) = NULL)
      .filter(length(col("__norm")) > 0)
      .select(col("doc_id"), split(col("__norm"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        expr(s"CAST(floor((greatest(n - $w, 0) + ${stride - 1}) / $stride) AS INT)")
          .as("extra"))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("extra"))).as(Seq("chunk_idx", "__x")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("int").as("chunk_start"),
        least(lit(w), col("n") - col("chunk_idx") * stride).cast("int")
          .as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_idx") * stride + 1, lit(w)), " ")
          .as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))

  /** Packed BIGINT chunk reference doc_id·10^6 + chunk_idx used by
    * q62/q63 keeper election. The packing is only injective while
    * chunk_idx < 10^6 (a ~48M-token document) and doc_id ≤
    * (Long.MaxValue − 999999)/10^6 — beyond either bound the ref would
    * silently collide or wrap and elect a WRONG keeper. The guard makes
    * a pathological corpus fail loudly (raise_error) instead; it lives
    * inside the ref computation itself so Catalyst cannot prune it.
    */
  private val MaxPackableDocId = (Long.MaxValue - 999999L) / 1000000L
  private[queries] def packedChunkRef(doc: org.apache.spark.sql.Column,
      idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(idx >= 0 && idx < 1000000L && doc >= 0 && doc <= MaxPackableDocId,
      doc.cast("long") * 1000000L + idx)
      .otherwise(raise_error(concat(
        lit("packed chunk ref out of range: doc_id="), doc.cast("string"),
        lit(" chunk_idx="), idx.cast("string"))).cast("long"))

  /** DuckDB CTE chain (no leading WITH) twinning [[chunkStage]] over
    * `src`; final relation `<p>ch` has (doc_id, chunk_idx,
    * chunk_start, n_chunk_tokens, chunk_text, chunk_md5).
    */
  private[queries] def chunksCtes(p: String, src: String, w: Int, stride: Int): String =
    s"""${p}tk AS (
       |  SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks FROM $src
       |  WHERE length(${normSql("text")}) > 0),
       |${p}m AS (SELECT doc_id, toks, len(toks) AS n,
       |    (greatest(n - $w, 0) + ${stride - 1}) // $stride AS extra FROM ${p}tk),
       |${p}e AS (SELECT doc_id, toks, n, CAST(unnest(generate_series(0, extra)) AS INT) AS chunk_idx FROM ${p}m),
       |${p}ch AS (
       |  SELECT doc_id, chunk_idx,
       |    CAST(chunk_idx * $stride AS INT) AS chunk_start,
       |    CAST(least($w, n - chunk_idx * $stride) AS INT) AS n_chunk_tokens,
       |    array_to_string(list_slice(toks, chunk_idx * $stride + 1, chunk_idx * $stride + $w), ' ') AS chunk_text,
       |    md5(array_to_string(list_slice(toks, chunk_idx * $stride + 1, chunk_idx * $stride + $w), ' ')) AS chunk_md5
       |  FROM ${p}e)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------ q21 explode + word count
    QueryDef(
      "q21_wordcount",
      (s, d) =>
        t(s, d, "documents")
          .select(explode(split(normalizeTranscript(col("text")), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(50),
      Some(s"""SELECT word, COUNT(*) AS n
              |FROM (SELECT unnest(string_split(${normSql("text")}, ' ')) AS word FROM documents)
              |GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin)),

    // ------------------------------------------------ q22 id scalar suite
    QueryDef(
      "q22_scalar_ids",
      (s, d) => {
        val raw = concat(lit("SRC_EV "), col("event_id"), lit("!"), col("event_type"))
        // sort on the scan column FIRST, project the id-scalar suite
        // AFTER (the q24 pattern): the range sampling pass re-reads only
        // the narrow scan and the regex/sha work is evaluated once
        t(s, d, "events")
          .orderBy(col("event_id"))
          .select(
            col("event_id"),
            sanitizeId(stripPrefix(raw, "SRC_")).as("sanitized_id"),
            hashId(lit("urn:graft:event"), col("event_id")).as("hashed_id"),
            tsPrefixedId(col("ts"),
              sha2(col("event_id").cast("string"), 256)).as("ts_prefixed_id"),
            conditionalReference(lit("Clip"), lit("urn:graft:event"),
              col("event_id")).as("conditional_ref"))
      },
      Some("""SELECT event_id,
             |  substr(regexp_replace('EV ' || event_id || '!' || event_type, '[^A-Za-z0-9\-\.]', '-', 'g'), 1, 64) AS sanitized_id,
             |  sha256('urn:graft:event' || '|' || event_id) AS hashed_id,
             |  substr(lower(to_hex(epoch_ms(ts))) || '-' || sha256(CAST(event_id AS VARCHAR)), 1, 64) AS ts_prefixed_id,
             |  printf('%s?identifier=%s|%s', 'Clip', 'urn:graft:event', CAST(event_id AS VARCHAR)) AS conditional_ref
             |FROM events ORDER BY event_id""".stripMargin)),

    // --------------------------------------------- q23 quantity parsing
    QueryDef(
      "q23_parse_quantity",
      (s, d) => {
        val qs = when(col("l_linenumber") % 5 === 0,
          concat(lit("<"), col("l_quantity").cast("int")))
          .when(col("l_linenumber") % 5 === 1,
            concat(lit(">= "), col("l_quantity").cast("int")))
          .when(col("l_linenumber") % 5 === 2, col("l_quantity").cast("int").cast("string"))
          .when(col("l_linenumber") % 5 === 3, lit("  7.5 "))
          .otherwise(lit("n/a"))
        val parsed = parseQuantity(qs)
        // sort-before-project (the q24 pattern): regex parse evaluated
        // once, after the exchange, instead of sample + sort
        t(s, d, "lineitem")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), qs.as("raw"),
            parsed.getField("comparator").as("comparator"),
            parsed.getField("value").as("value"),
            parsed.getField("text").as("text"))
      },
      Some("""WITH src AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CASE l_linenumber % 5
             |      WHEN 0 THEN '<' || CAST(trunc(l_quantity) AS INT)
             |      WHEN 1 THEN '>= ' || CAST(trunc(l_quantity) AS INT)
             |      WHEN 2 THEN CAST(CAST(trunc(l_quantity) AS INT) AS VARCHAR)
             |      WHEN 3 THEN '  7.5 '
             |      ELSE 'n/a' END AS raw
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, raw,
             |  CASE WHEN regexp_extract(trim(raw), '^(?:<=|>=|<|>)?\s*(-?[0-9]+(?:\.[0-9]+)?)$', 1) = '' THEN NULL
             |       WHEN regexp_extract(trim(raw), '^(<=|>=|<|>)', 1) = '' THEN NULL
             |       ELSE regexp_extract(trim(raw), '^(<=|>=|<|>)', 1) END AS comparator,
             |  CASE WHEN regexp_extract(trim(raw), '^(?:<=|>=|<|>)?\s*(-?[0-9]+(?:\.[0-9]+)?)$', 1) = '' THEN NULL
             |       ELSE CAST(regexp_extract(trim(raw), '^(?:<=|>=|<|>)?\s*(-?[0-9]+(?:\.[0-9]+)?)$', 1) AS DOUBLE) END AS value,
             |  CASE WHEN regexp_extract(trim(raw), '^(?:<=|>=|<|>)?\s*(-?[0-9]+(?:\.[0-9]+)?)$', 1) = '' THEN trim(raw)
             |       ELSE NULL END AS text
             |FROM src ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --------------------------------------- q24 reference-range parsing
    QueryDef(
      "q24_parse_range",
      (s, d) => {
        val qint = col("l_quantity").cast("int")
        val rs = when(col("l_linenumber") % 8 === 0,
          concat(qint, lit("-"), qint + 10))
          .when(col("l_linenumber") % 8 === 1, concat(lit("- <"), qint))
          .when(col("l_linenumber") % 8 === 2, concat(lit(">"), qint, lit("-")))
          .when(col("l_linenumber") % 8 === 3, concat(qint, lit(" - "), qint + 5))
          .when(col("l_linenumber") % 8 === 4, concat(lit("text"), qint, lit("-9")))
          .when(col("l_linenumber") % 8 === 5, lit("1 - test"))
          .when(col("l_linenumber") % 8 === 6, qint.cast("string"))
          .otherwise(lit(""))
        val parsed = parseReferenceRange(rs)
        // sort FIRST on the scan columns, project the parse AFTER: the
        // range-partitioner's sampling pass then re-reads only the
        // narrow scan (shuffle reuse), instead of evaluating the whole
        // regex-parse chain twice (sample + sort); the exchange also
        // carries only scan columns. A 1:1 project preserves the sorted
        // order, so the output is row-identical.
        t(s, d, "lineitem")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), rs.as("raw"),
            parsed.getField("low").as("low"),
            parsed.getField("high").as("high"),
            parsed.getField("text").as("text"))
      },
      Some("""WITH src AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CASE l_linenumber % 8
             |      WHEN 0 THEN CAST(trunc(l_quantity) AS INT) || '-' || (CAST(trunc(l_quantity) AS INT) + 10)
             |      WHEN 1 THEN '- <' || CAST(trunc(l_quantity) AS INT)
             |      WHEN 2 THEN '>' || CAST(trunc(l_quantity) AS INT) || '-'
             |      WHEN 3 THEN CAST(trunc(l_quantity) AS INT) || ' - ' || (CAST(trunc(l_quantity) AS INT) + 5)
             |      WHEN 4 THEN 'text' || CAST(trunc(l_quantity) AS INT) || '-9'
             |      WHEN 5 THEN '1 - test'
             |      WHEN 6 THEN CAST(CAST(trunc(l_quantity) AS INT) AS VARCHAR)
             |      ELSE '' END AS raw
             |  FROM lineitem),
             |p AS (
             |  SELECT *, trim(raw) AS t,
             |    trim(regexp_extract(trim(raw), '^([^-]*)-', 1)) AS low_raw,
             |    trim(regexp_extract(trim(raw), '^[^-]*-(.*)$', 1)) AS high_raw
             |  FROM src),
             |v AS (
             |  SELECT *,
             |    (contains(t, '-')
             |      AND (low_raw = '' OR regexp_matches(low_raw, '^[<>]?\s*-?[0-9]+(?:\.[0-9]+)?$'))
             |      AND (high_raw = '' OR regexp_matches(high_raw, '^[<>]?\s*-?[0-9]+(?:\.[0-9]+)?$'))
             |      AND NOT (low_raw = '' AND high_raw = '')) AS valid
             |  FROM p)
             |SELECT l_orderkey, l_linenumber, raw,
             |  CASE WHEN valid AND low_raw <> '' THEN CAST(regexp_extract(low_raw, '(-?[0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS low,
             |  CASE WHEN valid AND high_raw <> '' THEN CAST(regexp_extract(high_raw, '(-?[0-9]+(?:\.[0-9]+)?)', 1) AS DOUBLE) END AS high,
             |  CASE WHEN NOT valid THEN t END AS text
             |FROM v ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ----------------------------------------- q25 transcript normalize
    QueryDef(
      "q25_normalize",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        graft.synth.ClipGen.clipsMeta(s, d)
          .orderBy(col("event_id"))
          .select(col("event_id"), col("clip_id"), col("transcript"),
            normalizeTranscript(col("transcript")).as("transcript_norm"),
            tokenCount(normalizeTranscript(col("transcript"))).as("n_tokens")),
      Some(s"""WITH clips AS (${graft.synth.ClipGen.metaSql})
              |SELECT event_id, clip_id, transcript,
              |  ${normSql("transcript")} AS transcript_norm,
              |  CASE WHEN length(${normSql("transcript")}) = 0 THEN 0
              |       ELSE len(string_split(${normSql("transcript")}, ' ')) END AS n_tokens
              |FROM clips ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------ q26 quality scores
    QueryDef(
      "q26_quality",
      (s, d) => {
        val q = qualityStruct(col("text"))
        // sort-before-project (the q24 pattern)
        t(s, d, "documents")
          .orderBy(col("doc_id"))
          .select(col("doc_id"),
            q.getField("n_tokens").as("n_tokens"),
            q.getField("mean_token_len").as("mean_token_len"),
            q.getField("stopword_ratio").as("stopword_ratio"),
            q.getField("punct_ratio").as("punct_ratio"))
      },
      Some(s"""WITH n AS (
              |  SELECT doc_id, text, ${normSql("text")} AS norm FROM documents),
              |m AS (
              |  SELECT doc_id, text, norm,
              |    CASE WHEN length(norm) = 0 THEN 0 ELSE len(string_split(norm, ' ')) END AS n_tokens
              |  FROM n)
              |SELECT doc_id, n_tokens,
              |  round(CASE WHEN n_tokens = 0 THEN 0.0
              |    ELSE CAST(length(norm) - (n_tokens - 1) AS DOUBLE) / n_tokens END, 6) AS mean_token_len,
              |  round(CASE WHEN n_tokens = 0 THEN 0.0
              |    ELSE CAST(len(list_filter(string_split(norm, ' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) / n_tokens END, 6) AS stopword_ratio,
              |  round(CASE WHEN length(text) = 0 THEN 0.0
              |    ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------- q27 language id
    QueryDef(
      "q27_langid",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        t(s, d, "documents")
          .orderBy(col("doc_id"))
          .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang")),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, lang, string_split(${normSql("text")}, ' ') AS toks FROM documents),
              |sc AS (
              |  SELECT doc_id, lang,
              |    len(list_filter(toks, x -> list_contains(['the','a','fast','order'], x))) AS s_en,
              |    len(list_filter(toks, x -> list_contains(['window','hash','batch'], x))) AS s_de,
              |    len(list_filter(toks, x -> list_contains(['table','scan','merge'], x))) AS s_es,
              |    len(list_filter(toks, x -> list_contains(['join','filter','column'], x))) AS s_fr,
              |    len(list_filter(toks, x -> list_contains(['spark','data','row'], x))) AS s_zh
              |  FROM tk)
              |SELECT doc_id, lang,
              |  CASE WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
              |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
              |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
              |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
              |       ELSE 'zh' END AS pred_lang
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ q28 fingerprinting
    QueryDef(
      "q28_fingerprint",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        t(s, d, "documents")
          .orderBy(col("doc_id"))
          .select(col("doc_id"), normalizeTranscript(col("text")).as("__norm"))
          .select(col("doc_id"), col("__norm"), split(col("__norm"), " ").as("__toks"))
          .select(col("doc_id"),
            fingerprintFromToks(col("__norm"), col("__toks")).as("fp")),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, ${normSql("text")} AS norm,
              |    string_split(${normSql("text")}, ' ') AS toks FROM documents)
              |SELECT doc_id,
              |  CASE WHEN len(toks) < 5 THEN md5(norm)
              |       ELSE list_aggregate(list_transform(range(1, len(toks) - 3),
              |         i -> md5(toks[CAST(i AS INT)] || ' ' || toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)] || ' ' || toks[CAST(i+3 AS INT)] || ' ' || toks[CAST(i+4 AS INT)])), 'min')
              |  END AS fp
              |FROM tk ORDER BY doc_id""".stripMargin)),

    // ---------------- q60 document chunking (context-window prep, 1:N)
    // (chunk derivation shared with q62/q63 via chunkStage/chunksSql)
    // The training-pipeline op the text family was missing: split each
    // document into fixed-size token windows (W=64) with stride 48
    // (16-token overlap), the standard context-window preparation
    // before tokenizer packing. nChunks = 1 + ceil(max(0, n−W)/stride)
    // — every token is covered, the final window may be short, a doc
    // shorter than W yields exactly one window. Pure Catalyst (split →
    // posexplode(sequence) → slice/array_join), so at 100 TB this is a
    // narrow 1:N map with no shuffle; chunk content is compared by md5
    // to keep the oracle rows small while still pinning exact text.
    // The token array is materialized at its own select boundary (the
    // engine-wide lambda-CSE rule, BENCH.md §3.3).
    QueryDef(
      "q60_chunk_documents",
      (s, d) =>
        chunkStage(t(s, d, "documents"), 64, 48)
          .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
            col("n_chunk_tokens"), col("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("WITH " + chunksCtes("c_", "documents", 64, 48) + "\n" +
        """SELECT doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_md5
          |FROM c_ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---------------------- q62 chunk-level EXACT dedup (q60 → q29 shape)
    // The granularity real training pipelines dedup at: identical
    // 64-token windows collapse ACROSS documents, keeping the
    // lexicographically first (doc_id, chunk_idx). The keeper is the
    // min of a single packed BIGINT doc_id·10^6 + chunk_idx so both
    // engines elect it with one order-independent MIN — no two-level
    // min-within-min. Hash-partitioned agg on the md5, same scale
    // shape as q29.
    QueryDef(
      "q62_chunk_dedup",
      (s, d) =>
        chunkStage(t(s, d, "documents"), 64, 48)
          .select(col("chunk_md5"),
            packedChunkRef(col("doc_id"), col("chunk_idx")).as("ref"))
          .groupBy(col("chunk_md5"))
          .agg(min(col("ref")).as("kref"), count(lit(1)).as("n_copies"))
          .select(col("chunk_md5"),
            expr("CAST(kref div 1000000 AS BIGINT)").as("keeper_doc"),
            expr("CAST(kref % 1000000 AS INT)").as("keeper_idx"),
            col("n_copies"))
          .orderBy(col("chunk_md5")),
      Some("WITH " + chunksCtes("c_", "documents", 64, 48) + "\n" +
        """SELECT chunk_md5,
          |  CAST(min(doc_id * 1000000 + chunk_idx) // 1000000 AS BIGINT) AS keeper_doc,
          |  CAST(min(doc_id * 1000000 + chunk_idx) % 1000000 AS INT) AS keeper_idx,
          |  COUNT(*) AS n_copies
          |FROM c_ch GROUP BY chunk_md5 ORDER BY chunk_md5""".stripMargin)),

    // ------------- q63 chunk-level minhash NEAR-dup (q60 → q31 shape)
    // Near-duplicate chunk pairs via the same minhash-LSH operator the
    // document level uses, with the packed chunk ref as the id — a
    // shifted/rewritten window that exact chunk dedup misses. Both
    // sides re-normalize the chunk text through the shared pair
    // derivation, so parity holds by construction.
    QueryDef(
      "q63_chunk_neardup",
      (s, d) => {
        val chunks = chunkStage(t(s, d, "documents"), 64, 48)
          .select(packedChunkRef(col("doc_id"), col("chunk_idx")).as("doc_id"),
            col("chunk_text").as("text"))
        graft.operators.Dedup.minhashLshPairs(chunks, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4, threshold = 0.5, maxBucketSize = 64)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("WITH " + chunksCtes("c_", "documents", 64, 48) + ",\n" +
        "src AS (SELECT doc_id * 1000000 + chunk_idx AS doc_id, chunk_text AS text FROM c_ch),\n" +
        DedupQueries.minhashPairsCtes("mh_", "src", 0.5) + "\n" +
        "SELECT id_a, id_b, est_jaccard FROM mh_pairs ORDER BY id_a, id_b")))
}
