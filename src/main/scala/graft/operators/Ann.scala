package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale shape: the query set is small relative to the corpus, so the
  * baseline is a **broadcast** of queries against a single scan of the
  * corpus (no shuffle of the 100 TB side at all; one narrow top-k
  * aggregation per query). The IVF variant prunes the scanned fraction
  * by routing each query to its nearest coarse centroid — at cluster
  * scale the corpus is pre-partitioned by `cluster_id`, so a probe
  * touches only matching partitions (partition pruning on the storage
  * layout), which is the standard IVF trade of recall for scan volume.
  */
object Ann {

  /** Dot product of two float-array columns, computed in double with a
    * deterministic left-to-right sum (bit-reproducible across engines).
    * The native [[graft.functions.VecMath]] expression — the HOF
    * formula below ([[dotHofD]]) is its spec twin (fuzz-asserted
    * bit-equal in PropertySpec) but runs interpreted, which made the
    * plane projections and pair cosines the hot frames of the
    * embedding family's bench.
    */
  private def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VecMath.dotD(a, b)

  private def normD(a: org.apache.spark.sql.Column) =
    graft.functions.VecMath.normD(a)

  /** Interpreted HOF twins of [[dotD]]/[[normD]] — kept as the
    * readable specification the native expression is tested against.
    */
  private[graft] def dotHofD(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private[graft] def normHofD(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** L2 norm + normalization check per vector. */
  def norms(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), round(normD(col(vecCol)), 6).as("l2_norm"))

  /** Rank the `scored` (query_id, neighbor_id, cosine[, cluster])
    * rows down to the top `k` per query via the two-phase
    * [[TopKHits]] aggregator: map-side partials keep ≤ 2k candidates
    * per query, the exchange carries ≤ 2k·nPartitions rows per query,
    * and the final merge ranks those survivors — never a per-query
    * single-reducer sort of the full score list. The entry mains raise
    * the ObjectHashAgg group-count fallback threshold session-wide so
    * a realistic query batch (thousands of query_ids per partition)
    * stays on the hash-map partial path (setting it here would mutate
    * the shared session as a hidden side effect of building this
    * DataFrame); the sort-based fallback would still be distributed
    * and correct, just slower.
    */
  private def rankTopK(scored: DataFrame, k: Int, withCluster: Boolean): DataFrame = {
    val clusterCol =
      if (withCluster) col("cluster") else lit(-1)
    val hits = TopKHits.udafColumn(k)(
      col("neighbor_id"), col("cosine"), clusterCol)
    val base = scored
      .groupBy(col("query_id"))
      .agg(hits.as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("h.neighbor_id").as("neighbor_id"),
        round(col("h.cosine"), 6).as("cosine"),
        col("h.cluster").as("cluster"))
    if (withCluster) base else base.drop("cluster")
  }

  /** Brute-force cosine top-k: every (query, corpus) pair scored, then
    * a distributed two-phase top-k per query ([[rankTopK]]). Queries
    * are broadcast; ranking tiebreak on corpus id keeps the result
    * deterministic.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are per-vector columns computed BEFORE the join — inlined
    // in the cosine expression they would re-evaluate an O(dims)
    // aggregate once per (query, corpus) pair
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", normD(col("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", normD(col("c_vec")))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotD(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    rankTopK(scored, k, withCluster = false)
  }

  /** Fixed-point scale for exact centroid sums: float32 has a 24-bit
    * mantissa, so for the magnitudes an embedding column carries
    * (|v| ≳ 1e-6) `v * 2^46` is EXACTLY integral in double — the
    * per-dimension sums become BIGINTs, which are order-independent
    * and bit-identical across engines (a plain double `avg` is a
    * distributed float sum whose value depends on partition order).
    * Bounded: |v| < 2^17 per element and < 2^52 total per (cluster,
    * dim) before a BIGINT sum could lose exactness; at larger cluster
    * sizes switch the sum to DECIMAL.
    */
  private val CentroidScale = 70368744177664.0 // 2^46

  /** IVF-style ANN: coarse centroids = per-`clusterCol` mean vectors
    * (posexplode → per-dimension EXACT scaled-integer sum — a single
    * shuffled aggregation, deterministic across engines/partitionings);
    * each query routes to its `nProbe` nearest centroids and scores
    * only members of those clusters.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, clusterCol: String, k: Int, nProbe: Int = 1): DataFrame = {
    val dims = corpus
      .select(col(clusterCol).as("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      // round BEFORE the long cast: Spark's double→long cast truncates
      // while DuckDB's CAST rounds — identical only while v·2^46 is
      // exactly integral (|v| ≥ 2^-23). An explicit round (both engines
      // round half away from zero) keeps the sums equal even for a
      // future table with sub-2^-23 components.
      .agg(sum(round((col("v").cast("double") * CentroidScale)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s").cast("double") / CentroidScale / col("n"))
    val centroids = dims
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("cluster"), transform(col("pairs"), p => p.getField("m")).as("centroid"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val routed = q
      .join(broadcast(centroids))
      .withColumn("dist2",
        aggregate(zip_with(col("q_vec"), col("centroid"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2").asc, col("cluster").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("cluster"))

    val members = corpus.select(
      col(clusterCol).as("cluster"), col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", normD(col("c_vec")))
    val scored = members
      .join(broadcast(routed.withColumn("q_norm", normD(col("q_vec")))), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotD(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    rankTopK(scored, k, withCluster = true)
  }

  /** plane(b)[d] = (md5("b:d") first 4 hex as int) / 2^16 - 0.5.
    * The planes are CONSTANTS — computing them with Catalyst md5
    * re-derived all nBits×dim hashes per row (measured 4 s for 2k
    * rows); precompute once in the driver and embed literal arrays,
    * byte-identical to the Catalyst/DuckDB md5 formula.
    */
  private def planeVal(b: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$b:$d".getBytes("UTF-8"))
      .map(x => f"${x & 0xff}%02x").mkString.take(4)
    java.lang.Long.parseLong(hex, 16).toDouble / 65536.0 - 0.5
  }

  /** Signed projections of `vecCol` onto the first `nBits` planes. */
  private def planeDots(vecCol: String, nBits: Int, dim: Int)
      : Seq[org.apache.spark.sql.Column] =
    (0 until nBits).map { b =>
      dotD(col(vecCol), typedLit((0 until dim).map(d => planeVal(b, d))))
    }

  /** Random-hyperplane LSH bucketing: `nBits` signed projections onto
    * deterministic pseudo-random hyperplanes (md5-seeded, so the
    * "random" planes are reproducible without any RNG state). Vectors
    * sharing a bucket are candidate neighbors.
    */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String, nBits: Int,
      dim: Int = 64): DataFrame = {
    val planes = planeDots(vecCol, nBits, dim)
    val sig = (0 until nBits)
      .map(b => when(planes(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    emb.select(col(idCol), sig.as("bucket"))
  }

  /** Banded hyperplane-LSH keys: `nBits` planes split into `bands`
    * bands of nBits/bands bits; vectors agreeing on ALL bits of ANY
    * single band are candidate neighbors. Requiring one narrow band
    * instead of the full signature is what gives usable recall — the
    * full-width bucket needs all nBits signs equal, which for 16 bits
    * has near-zero recall even for genuinely similar pairs (≈0.95^16
    * only for near-identical vectors).
    */
  def lshBandKeys(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, bands: Int, dim: Int = 64): DataFrame = {
    require(nBits % bands == 0, s"nBits=$nBits must divide into bands=$bands")
    val bitsPerBand = nBits / bands
    val planes = planeDots(vecCol, nBits, dim)
    val bandKeys = (0 until bands).map { j =>
      val v = (j * bitsPerBand until (j + 1) * bitsPerBand)
        .map(b => when(planes(b) > 0, lit(1L << (b % bitsPerBand))).otherwise(lit(0L)))
        .reduce(_ + _)
      struct(lit(j).as("band"), v.as("band_val"))
    }
    emb.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_val").as("band_val"))
  }

  /** Banded hyperplane-LSH rows carrying the (double-cast) vector —
    * the streaming embedding near-dup input (s31): the same band keys
    * as [[lshBandKeys]] flattened to one string key, plus what the
    * online prober needs (the widened vector; each float widens to
    * double exactly, so a JVM left-to-right dot product is
    * bit-identical to [[dotD]] and to the oracle's list arithmetic).
    * Zero-norm vectors are dropped on BOTH sides — 0/0 cosine is NaN
    * and NaN orders above every threshold (the q47 guard).
    */
  def bandedVectors(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, bands: Int, dim: Int = 64): DataFrame = {
    require(nBits % bands == 0, s"nBits=$nBits must divide into bands=$bands")
    val bitsPerBand = nBits / bands
    val planes = planeDots(vecCol, nBits, dim)
    val bandKeys = (0 until bands).map { j =>
      val v = (j * bitsPerBand until (j + 1) * bitsPerBand)
        .map(b => when(planes(b) > 0, lit(1L << (b % bitsPerBand))).otherwise(lit(0L)))
        .reduce(_ + _)
      concat_ws(":", lit(j), v)
    }
    emb
      // the norm guard references only the raw column, so its pushdown
      // past this project re-expands an O(dim) sum, not the O(nBits ×
      // dim) plane dots (cf. the s29 sig-filter lesson)
      .filter(normD(col(vecCol)) > 0)
      .select(col(idCol),
        transform(col(vecCol), v => v.cast("double")).as("vec"),
        explode(array(bandKeys: _*)).as("band_key"))
  }

  /** Embedding-cosine near-duplicate pairs, banded-LSH blocked: pairs
    * sharing ≥1 band key get an exact cosine; `threshold` keeps the
    * near-duplicates. Scale shape: the band join carries only (band,
    * 8-byte key, id) — vectors are fetched AFTER the candidate-pair
    * `distinct()`, so a pair sharing several bands is scored once and
    * no vector is ever duplicated per band. No all-pairs product
    * anywhere; candidate volume is tuned by bands × bitsPerBand.
    */
  def embedNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 16, bands: Int = 4, threshold: Double = 0.2,
      dim: Int = 64): DataFrame = {
    // the band keys feed both self-join sides — materialize the (id,
    // band, band_val) proxy rows once instead of re-computing the
    // nBits×dim hyperplane dot products per side (the minhashLshPairs
    // barrier rationale; at cluster scale this intermediate is the
    // "fingerprints only" table of guide §8.4)
    val keys = lshBandKeys(emb, idCol, vecCol, nBits, bands, dim)
      .localCheckpoint(true)
    val a = keys.select(col("band"), col("band_val"), col(idCol).as("id_a"))
    val b = keys.select(col("band"), col("band_val"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", normD(col("va")))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", normD(col("vb")))
    cand.join(va, "id_a").join(vb, "id_b")
      // zero-norm guard: 0/0 is NaN, and Spark orders NaN ABOVE every
      // double, so `cosine >= threshold` would emit an all-zero vector
      // as a "near-duplicate" of anything sharing its all-zero bands
      // (DuckDB's IEEE 0/0 is NaN too, and NaN compares greater — the
      // q47 oracle mirrors this guard explicitly so both engines drop
      // zero-norm vectors the same way)
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("cosine", dotD(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
