package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Large-scale document deduplication operators.
  *
  * Design notes for 100 TB scale (the small-SF correctness is checked
  * by the DuckDB oracle; the shapes below are what survive 1000
  * executors):
  *  - Exact dedup is a single hash-partitioned aggregation on a 32-byte
  *    digest — map-side partial agg keeps the shuffle at one digest +
  *    keeper id per distinct document.
  *  - MinHash-LSH and SimHash banding turn the O(n²) pair search into
  *    an equi-join on band keys, which Catalyst executes as a shuffled
  *    hash join keyed by band — no cross product ever materializes.
  *  - Candidate buckets are capped (`maxBucketSize`): a degenerate
  *    shingle (e.g. boilerplate) would otherwise create a quadratic hot
  *    bucket; dropping oversized buckets is the standard LSH skew
  *    guard and is applied identically in the oracle SQL.
  */
object Dedup {

  /** Exact dedup by content hash: one surviving (minimum) id per
    * distinct normalized text, with the duplicate count.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(normalizeTranscript(col(textCol))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures (k hashes over word-`n`-gram shingles).
    * `useNative` selects the [[graft.functions.MinHash32]] expression
    * (identical output, one digest per seed×shingle — the hot path);
    * the columnar formula is kept as its oracle-matchable twin.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, useNative: Boolean = true): DataFrame = {
    // toks and shingles land in their own select stages so Catalyst
    // evaluates each once per row (CollapseProject keeps the boundary:
    // inlining would duplicate a non-cheap expression)
    val withSh = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), wordShinglesFromToks(col("__toks"), shingleN).as("__sh"))
    val sig =
      if (useNative) graft.functions.MinHash32.minhash32(col("__sh"), k)
      else minhashSignature(col("__sh"), k)
    withSh.select(col(idCol), sig.as("sig"))
  }

  /** MinHash + LSH candidate pairs with estimated Jaccard ≥ threshold.
    *
    * shingle → minhash → band → bucket-join: pairs sharing ≥1 of
    * `bands` band keys are candidates; the estimate is the fraction of
    * equal signature positions. Self-join is keyed on the band hash
    * (equi-join → shuffled hash join; no broadcast needed, scales with
    * data). `maxBucketSize` drops degenerate buckets (skew guard).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8, bands: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 64): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, k)
      .withColumn("band_keys", lshBandKeys(col("sig"), bands, k / bands))
      // the signature rows feed THREE plan branches (the oversized-
      // bucket blacklist aggregate and both self-join sides); without a
      // materialization barrier each branch re-runs the full
      // tokenize→shingle→minhash chain over every document (measured
      // ~2× on q31). The rows are the lightweight proxy (id + k digests
      // + band keys, no document text) — at cluster scale this is the
      // standard "fingerprints only" intermediate of a dedup pass
      // (optimization guide §8.4), written to reliable storage there;
      // localCheckpoint is its single-JVM equivalent.
      .localCheckpoint(true)
    val exploded = sigs
      .select(col(idCol), col("sig"), explode(col("band_keys")).as("band_key"))
    // skew guard: drop degenerate buckets via a broadcast anti-join
    // against the (tiny) oversized-bucket blacklist — one aggregate +
    // map-side filter instead of a full window sort over all bands
    val oversized = exploded.groupBy(col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
      .select(col("band_key"))
    val bounded = exploded.join(broadcast(oversized), Seq("band_key"), "left_anti")
    val a = bounded.select(
      col(idCol).as("id_a"), col("sig").as("sig_a"), col("band_key"))
    val b = bounded.select(
      col(idCol).as("id_b"), col("sig").as("sig_b"), col("band_key"))
    val k_ = k
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          bool => bool)).cast("double") / k_).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking column
    * (e.g. language): explode shingles, equi-join on (block, shingle),
    * count common shingles, Jaccard = |∩| / (|A|+|B|−|∩|).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs
      .select(col(idCol), col(blockCol).as("block"),
        tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("block"),
        wordShinglesFromToks(col("__toks"), shingleN).as("shingles"))
    // Explode through a typed-row barrier, NOT Catalyst explode():
    // downstream join-key IsNotNull constraints would otherwise be
    // pushed below the Generate with the full shingle expression
    // inlined into an interpreted Filter (re-evaluating normalization
    // + shingling three times per row; measured 13x on this query).
    // Predicates cannot cross an object boundary.
    val idField = sh.schema(idCol)
    val exSchema = new org.apache.spark.sql.types.StructType()
      .add(idField.name, idField.dataType)
      .add("block", org.apache.spark.sql.types.StringType)
      .add("n_sh", org.apache.spark.sql.types.IntegerType)
      .add("shingle", org.apache.spark.sql.types.StringType)
    val ex = sh.flatMap { r =>
      val shingles = r.getSeq[String](2)
      shingles.map(x =>
        org.apache.spark.sql.Row(r.get(0), r.getString(1), shingles.size, x))
    }(org.apache.spark.sql.Encoders.row(exSchema))
    val a = ex.select(col("block"), col("shingle"),
      col(idCol).as("id_a"), col("n_sh").as("n_a"))
    val b = ex.select(col("block"), col("shingle"),
      col(idCol).as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("block", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash per document (32-bit, md5-derived — see
    * [[graft.functions.SimHash32]] for the native fast path; this
    * columnar formula is its oracle-matchable twin).
    */
  def simhashDocs(docs: DataFrame, idCol: String, textCol: String,
      useNative: Boolean = true): DataFrame = {
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val sh =
      if (useNative) graft.functions.SimHash32.simhash32(col("__toks"))
      else simhash32Col(col("__toks"))
    withToks.select(col(idCol), sh.as("simhash"))
  }

  /** Connected components over an undirected near-dup pair graph —
    * the pair→cluster resolution step a corpus dedup needs (pairs
    * alone leave transitive duplicates A~B~C alive when A≁C; the
    * reference's within-message dedup loop,
    * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/Hl7LabMapper.java:160-179,
    * generalized corpus-wide).
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — each round is
    * two hash-partitioned groupBy-min + equi-join passes, no
    * collect_set of neighbor lists (a hot node's neighborhood never
    * materializes on one task), converging in O(log n) rounds even on
    * path graphs vs O(diameter) for plain label propagation. Star
    * graphs centered at the component minimum are the fixpoint.
    * Each iteration is localCheckpoint'ed (truncates the exponentially
    * deepening lineage — at cluster scale this would be a reliable
    * checkpoint to HDFS) and convergence is detected by an
    * order-independent (count, Σ xxhash64) signature over the
    * canonical edge set, summed as DECIMAL(38,0) so it can never
    * overflow.
    *
    * Returns one row per node that appears in ≥1 pair:
    * (id, cluster_id) with cluster_id = min id of the component.
    */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
      maxIter: Int = 20): DataFrame = {
    var edges = pairs
      .select(least(col(idA), col(idB)).as("a"),
        greatest(col(idA), col(idB)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(
        count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    // Round-shape note (round-6 optimization pass): two restructurings
    // were tried and MEASURED WORSE, so the original shape stands —
    // (a) sharing one explicit repartition(u) between the min aggregate
    // and the join (3.3 s → 5.8 s on the 914k-edge q61 graph: the
    // repartition shuffles the full symmetric edge set and defeats the
    // map-side partial aggregation that makes `mins` cheap), and
    // (b) deferring largeStar's terminal distinct to smallStar
    // (3.3 s → 5.4 s: a k-clique's largeStar emits each (m, v) k
    // times, so the dedup is load-bearing for throughput).

    // large-star: every neighbor v > u of center u is rewired to
    // m = min(Γ(u) ∪ {u}); connectivity-preserving, shrinks tall nodes
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("m").as("a"), col("v").as("b")) // m ≤ u < v ⇒ a < b
        .distinct()
    }

    // small-star: orient toward the smaller endpoint (center = larger);
    // all of the center's smaller neighbors, and the center itself,
    // rewire to m = min of that neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(col("b").as("u"), col("a").as("v")) // b > a
      val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      oriented.join(mins, "u")
        .select(col("m").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .unionAll(mins.select(col("m").as("a"), col("u").as("b")))
        .distinct()
    }

    var sig = signature(edges)
    var it = 0
    // the signature count doubles as the emptiness probe — a separate
    // edges.isEmpty would run one more job per CC invocation
    var converged = sig._1 == 0L
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = signature(next)
      converged = nsig._1 == sig._1 && nsig._2.compareTo(sig._2) == 0
      edges = next
      sig = nsig
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds (edges=${sig._1})")
    // fixpoint: every edge is (componentMin, member)
    edges.select(col("b").as("id"), col("a").as("cluster_id"))
      .unionAll(edges.select(col("a").as("id"), col("a").as("cluster_id")))
      .distinct()
  }

  /** SimHash near-duplicate pairs: band the 32-bit hash into 4 bytes;
    * pairs equal on ≥1 byte-band are candidates (guarantees recall for
    * Hamming distance ≤ 3); verify with exact popcount distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, useNative: Boolean = true): DataFrame = {
    // (id, 32-bit hash) feeds both self-join sides — materialize the
    // tiny proxy rows once instead of re-running tokenize+simhash per
    // side (same rationale as the minhashLshPairs barrier)
    val hashed = simhashDocs(docs, idCol, textCol, useNative)
      .localCheckpoint(true)
    val banded = hashed.select(
      col(idCol), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(0xffL)).as("band_val"))
      }: _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.band").as("band"), col("bk.band_val").as("band_val"))
    val a = banded.select(col("band"), col("band_val"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("band_val"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
