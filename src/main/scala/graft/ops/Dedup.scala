package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB path:
  *
  *  - exact: group on a 128-bit content fingerprint (never on the body —
  *    the shuffle key stays 16 bytes/row regardless of document size);
  *  - MinHash + LSH: per-row signature (map-only), band-bucket shuffle whose
  *    volume is #bands × 16 bytes per doc, candidate pairs only within
  *    buckets, then exact-Jaccard verification so output precision is 1.0;
  *  - exact n-gram Jaccard: the quadratic-free formulation — explode
  *    shingles, self-join on the shingle (co-partitioned hash join), count
  *    intersections per pair — never materializes the full doc×doc matrix;
  *  - SimHash: 64-bit per-row signature, near-dup candidates via 16-bit
  *    chunk banding (Hamming ≤ 3 guarantees ≥ 1 equal chunk of 4).
  *
  * All signature math is expression-only (codegen'd); no UDFs.
  */
object Dedup {

  // ── MinHash ────────────────────────────────────────────────────────────

  /** Deterministic permutation parameters (a, b) for (a*h + b) mod P.
    * a,b < 2^20 keep a*h32 + b < 2^52 — no long overflow under ANSI mode. */
  private def perms(k: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(k)((rnd.nextInt(1 << 20) | 1).toLong)
    val b = Seq.fill(k)(rnd.nextInt(1 << 20).toLong)
    (a, b)
  }

  private val Prime = (1L << 31) - 1 // Mersenne prime 2^31-1

  /** MinHash signature (array<long> of length k) over a shingle array.
    * Base hash once per shingle (xxhash64 → 32-bit), then k cheap affine
    * permutations — O(k·|shingles|) multiply-adds per row, map-only. */
  def minHashSignature(shingleArr: Column, k: Int): Column = {
    val (as, bs) = perms(k)
    val aLit = array(as.map(lit): _*)
    val bLit = array(bs.map(lit): _*)
    val base = transform(shingleArr, s => pmod(xxhash64(s), lit(1L << 32)))
    transform(sequence(lit(0), lit(k - 1)), p =>
      array_min(transform(base, h =>
        pmod(element_at(aLit, p + 1) * h + element_at(bLit, p + 1), lit(Prime)))))
  }

  /** LSH band hashes: signature sliced into `bands` bands of `rows` values,
    * each band reduced to one 64-bit bucket key. */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      xxhash64(concat_ws(",", transform(slice(sig, j * rows + 1, lit(rows)), _.cast("string")))))

  /** Candidate near-dup pairs from MinHash LSH, verified with exact Jaccard
    * over the shingle sets, keeping pairs with jaccard >= threshold.
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * Bucket-size note for the 100 TB path: a degenerate band value (e.g. all
    * empty docs) would make one bucket quadratic; `maxBucket` drops buckets
    * larger than that bound (they are near-certain junk clusters). */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 8, k: Int = 64,
                      bands: Int = 16, rows: Int = 4,
                      threshold: Double = 0.8,
                      maxBucket: Int = 1000): DataFrame = {
    val sh = docs.select(
      col(idCol).as("_id"),
      TextFunctions.shingles(col(textCol), shingleN).as("_sh"))
    val sig = sh.withColumn("_sig", minHashSignature(col("_sh"), k))
      .withColumn("_bands", bandHashes(col("_sig"), bands, rows))
      .select(col("_id"), col("_sh"), posexplode(col("_bands")).as(Seq("_band", "_bh")))
    val bounded = sig.withColumn("_bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_band"), col("_bh"))))
      .where(col("_bsz") <= maxBucket)
      .select(col("_id"), col("_sh"), col("_band"), col("_bh"))
    val a = bounded.select(col("_band"), col("_bh"),
      col("_id").as("doc_a"), col("_sh").as("_sha"))
    val b = bounded.select(col("_band"), col("_bh"),
      col("_id").as("doc_b"), col("_sh").as("_shb"))
    val cand = a.join(b, Seq("_band", "_bh"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("_sha"), col("_shb"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("jaccard", jaccardExpr(col("_sha"), col("_shb")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard over two shingle arrays (arrays already distinct). */
  def jaccardExpr(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - size(array_intersect(sa, sb))).cast("double")
  }

  /** Exact n-gram Jaccard near-dup pairs WITHOUT the doc×doc cross product:
    * explode shingles, equi-join on the shingle, count per pair — the join
    * is a hash join co-partitioned on the shingle, so work scales with the
    * number of truly shared shingles, not with |docs|². */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 8, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
        explode(TextFunctions.shingles(col(textCol), shingleN)).as("_g"))
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val inter = sh.as("x").join(sh.as("y"), col("x._g") === col("y._g"))
      .where(col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("doc_a"), col("y._id").as("doc_b"))
      .agg(count(lit(1)).as("_c"))
    inter
      .join(sizes.select(col("_id").as("doc_a"), col("_n").as("_na")), "doc_a")
      .join(sizes.select(col("_id").as("doc_b"), col("_n").as("_nb")), "doc_b")
      .withColumn("jaccard",
        col("_c").cast("double") / (col("_na") + col("_nb") - col("_c")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ── SimHash ────────────────────────────────────────────────────────────

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes (+1 for a set bit, -1 for clear; bit set in the signature when
    * the vote is strictly positive). OR-accumulation — no arithmetic
    * overflow under ANSI mode even for bit 63. */
  def simHash64(text: Column): Column = {
    val hashes = transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val vote = aggregate(hashes, lit(0L),
          (v, h) => v + (call_function("getbit", h, bit).cast("long") * 2 - 1))
        acc.bitwiseOR(
          when(vote > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L)))
      })
  }

  /** Near-dup pairs by SimHash: split the 64-bit signature into four 16-bit
    * chunks; Hamming distance <= 3 implies at least one identical chunk
    * (pigeonhole), so banding on chunks has recall 1.0 at that radius while
    * the shuffle key stays 2 bytes + chunk index. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigd = docs.select(col(idCol).as("_id"), simHash64(col(textCol)).as("_sig"))
    val chunked = sigd.select(col("_id"), col("_sig"),
      explode(array((0 until 4).map(j => struct(
        lit(j).as("_chunk"),
        shiftrightunsigned(col("_sig"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("_ch"))): _*))
        .as("_cx"))
      .select(col("_id"), col("_sig"), col("_cx._chunk").as("_chunk"), col("_cx._ch").as("_ch"))
    val a = chunked.select(col("_chunk"), col("_ch"), col("_id").as("doc_a"), col("_sig").as("_siga"))
    val b = chunked.select(col("_chunk"), col("_ch"), col("_id").as("doc_b"), col("_sig").as("_sigb"))
    a.join(b, Seq("_chunk", "_ch")).where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("_siga").bitwiseXOR(col("_sigb"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
